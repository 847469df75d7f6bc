"""Gold layer: the aggregate consumption tier the reference declares and
never builds (reference README.md:215-216 — "Gold layer: TODO"). One
demonstration rollup over the flagship silver table goes one step past
the reference's own roadmap.

``gold_od_daily``: daily trip/km rollup of ``silver_od`` per
(zone_level, day, is_holiday) with an exact origin-cardinality count —
the table a dashboard would read instead of re-scanning silver.

Architecture (fixed round 6 after the r5 audit): the gold tier reads
the MATERIALIZED silver table, exactly as the tiering contract says —
a dashboard query must not re-execute the silver scan→union→semi-join
chain per refresh. ``query_gold_od_daily`` materializes ``silver_od``
through the same ``replace_table`` path the pipeline runner uses
(once per session+fixture; CREATE OR REPLACE semantics, so always
fresh within a process) and rolls up from the stored parquet table.
On a cluster the runner owns that write and the gold query is only
the rollup — the guard here just makes the query self-contained for
the bench/driver harnesses, which call queries in isolation.

Scale: one hash aggregate on low-cardinality keys over a stored,
zone_level-partitioned parquet table; the exact
COUNT(DISTINCT origin_id) uses Catalyst's native two-pass distinct
plan. The manual pre-aggregate-on-(group, origin) rewrite was measured
SLOWER here (3.1 s vs 2.2 s at sf0.1): origins are near-unique within a
group, so pre-aggregation shuffles the full table for no combine
benefit — the classic rewrite only pays when the distinct key repeats
heavily per group. Sums run through DECIMAL so the partition-parallel
reduction is exact and engine-portable.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.functions.scalars import round_portable, round_portable_sql
from bigdata_project_spark.plans import silver_od
from bigdata_project_spark.sources.sinks import (
    drop_table_and_orphan_location,
    replace_table,
)

_DEC = "decimal(27,6)"

# session-local memo of fixtures already materialized: keyed by the JVM
# app id + sf_dir so a fresh session (new warehouse state) re-writes.
_MATERIALIZED: set[tuple[str, str]] = set()


def _silver_table(spark: SparkSession, sf_dir: str) -> str:
    # readable tag + a hash of the RAW path: sanitization alone is lossy
    # ('/data/sf0.1' and '/data/sf0_1' would share a table and the memo
    # would then serve one fixture's rollup for the other)
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))
    table = f"silver_od__{tag}_{digest}"
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MATERIALIZED:
        # a previous PROCESS may have left the managed location behind
        # with no catalog entry (fresh session, same warehouse dir) —
        # saveAsTable then refuses with LOCATION_ALREADY_EXISTS
        drop_table_and_orphan_location(spark, table)
        replace_table(
            silver_od.query(spark, sf_dir), table, partition_by=["zone_level"]
        )
        _MATERIALIZED.add(key)
    return table


def query_gold_od_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = spark.table(_silver_table(spark, sf_dir))
    return (
        od.groupBy(
            "zone_level",
            F.substring("datetime", 1, 10).alias("day"),
            "is_holiday",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            round_portable(
                F.sum(F.col("n_trips").cast(_DEC)).cast("double"), 2
            ).alias("sum_trips"),
            round_portable(
                F.sum(F.col("km_trips").cast(_DEC)).cast("double"), 4
            ).alias("sum_km"),
            F.count_distinct("origin_id").alias("n_origins"),
        )
    )


ORACLE_GOLD_OD_DAILY = f"""
WITH silver AS ({silver_od.ORACLE})
SELECT zone_level,
       substring(datetime, 1, 10) AS day,
       is_holiday,
       COUNT(*) AS n_rows,
       {round_portable_sql("CAST(SUM(CAST(n_trips AS DECIMAL(27,6))) AS DOUBLE)", 2)} AS sum_trips,
       {round_portable_sql("CAST(SUM(CAST(km_trips AS DECIMAL(27,6))) AS DOUBLE)", 4)} AS sum_km,
       COUNT(DISTINCT origin_id) AS n_origins
FROM silver
GROUP BY zone_level, substring(datetime, 1, 10), is_holiday
"""
