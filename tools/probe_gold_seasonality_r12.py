"""Decompose gold_overnights_seasonality's steady-state bench cost
(r12: the one new query on the weak-list radar at ~2.1-2.4 s vs a
0.4 s oracle) into scan / broadcast-join / aggregate, and A/B the
two-count_distinct expand plan against a pre-aggregate rewrite.

Methodology mirrors bench.py: one warm-up evaluation (materializes the
silver table into the session memo, exactly as the bench warm-up does),
then BENCH_RUNS=5 timed runs, median quoted. Run in a quiet hour and
read deltas, not absolutes.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from bigdata_project_spark.plans import gold, silver_people_day
from bigdata_project_spark.plans.gold import _DEC, _materialize_silver
from bigdata_project_spark.functions.scalars import round_portable, weekend_flag
from bigdata_project_spark.sources.readers import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 5


def timed(fn):
    out = []
    fn()  # warm-up
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return round(statistics.median(out), 3)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_gold_seasonality")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}

    # full registered query (includes memoized-silver lookup)
    results["full_query"] = timed(
        lambda: gold.query_gold_overnights_seasonality(spark, SF_DIR).collect()
    )

    ov_t = _materialize_silver(
        spark, SF_DIR, "silver_overnights", silver_people_day.query_overnights,
        partition_by=["zone_level"],
    )
    ov = spark.table(ov_t)

    # stage 1: bare scan of the materialized silver table
    results["silver_scan_count"] = timed(lambda: ov.count())

    # stage 2: + holiday dim derivation + broadcast join + flag columns
    def enrich():
        holidays = (
            load_table(spark, SF_DIR, "lineitem")
            .select(F.trunc("l_shipdate", "month").alias("holiday_date"))
            .distinct()
        )
        return (
            ov.withColumn("d", F.to_date("date"))
            .join(F.broadcast(holidays), F.col("d") == F.col("holiday_date"), "left")
            .withColumn("is_holiday", F.col("holiday_date").isNotNull())
            .withColumn("is_weekend", weekend_flag(F.col("d")))
        )

    results["plus_enrich_count"] = timed(lambda: enrich().count())

    # stage 3 variant A: current plan — two count_distincts via expand
    def agg_expand():
        sum_people = F.sum(F.col("people").cast(_DEC)).cast("double")
        return (
            enrich()
            .groupBy(
                "zone_level",
                F.substring("date", 1, 7).alias("month"),
                "is_weekend",
                "is_holiday",
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct("overnight_zone").alias("n_zones"),
                F.count_distinct("overnight_zone", "residence_zone").alias(
                    "n_routes"
                ),
                round_portable(sum_people, 2).alias("sum_people"),
                round_portable(sum_people / F.count(F.lit(1)), 6).alias(
                    "avg_people"
                ),
            )
            .collect()
        )

    results["agg_expand"] = timed(agg_expand)

    # stage 3 variant B: pre-aggregate by (keys, route) first — the
    # distinct work then runs on |routes| rows instead of 3x the fact
    def agg_preagg():
        pre = (
            enrich()
            .groupBy(
                "zone_level",
                F.substring("date", 1, 7).alias("month"),
                "is_weekend",
                "is_holiday",
                "overnight_zone",
                "residence_zone",
            )
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("people").cast(_DEC)).alias("sp"),
            )
        )
        n_rows = F.sum("cnt").alias("n_rows")
        sum_people = F.sum("sp").cast("double")
        # n_routes must skip NULL route keys to match variant A's
        # count_distinct(a, b) semantics (which drops tuples containing
        # any NULL) regardless of the fixture's null coverage — a bare
        # count(1) over pre-agg groups would include NULL-keyed groups
        # (r12 advice item 3)
        route_nonnull = F.col("overnight_zone").isNotNull() & F.col(
            "residence_zone"
        ).isNotNull()
        return (
            pre.groupBy("zone_level", "month", "is_weekend", "is_holiday")
            .agg(
                n_rows,
                F.count_distinct("overnight_zone").alias("n_zones"),
                F.count(F.when(route_nonnull, 1)).alias("n_routes"),
                round_portable(sum_people, 2).alias("sum_people"),
                round_portable(sum_people / F.sum("cnt"), 6).alias("avg_people"),
            )
            .collect()
        )

    results["agg_preagg"] = timed(agg_preagg)

    # equivalence check between the two variants
    a = {tuple(r) for r in agg_expand()}
    b = {tuple(r) for r in agg_preagg()}
    results["variants_equal"] = a == b

    # distinct-cost isolation ladder (r12 advice: these stages produced
    # the committed artifact's isolation_* keys but lived only in a
    # session scratch — now emitted by the script itself so re-running
    # reproduces every committed key): same enriched input + group
    # keys, aggregate set varied one distinct at a time, plus the
    # decimal-vs-double sum lane on the full two-distinct shape.
    def isolation(n_distinct: int, decimal_sum: bool):
        sp = F.sum(
            F.col("people").cast(_DEC) if decimal_sum else F.col("people").cast("double")
        ).cast("double")
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            round_portable(sp, 2).alias("sum_people"),
            round_portable(sp / F.count(F.lit(1)), 6).alias("avg_people"),
        ]
        if n_distinct >= 1:
            aggs.insert(1, F.count_distinct("overnight_zone").alias("n_zones"))
        if n_distinct >= 2:
            aggs.insert(
                2,
                F.count_distinct("overnight_zone", "residence_zone").alias(
                    "n_routes"
                ),
            )
        grouped = enrich().groupBy(
            "zone_level",
            F.substring("date", 1, 7).alias("month"),
            "is_weekend",
            "is_holiday",
        )
        return lambda: grouped.agg(*aggs).collect()

    results["isolation_no_distinct"] = timed(isolation(0, True))
    results["isolation_one_distinct"] = timed(isolation(1, True))
    results["isolation_two_distinct_decimal"] = timed(isolation(2, True))
    results["isolation_two_distinct_double_sum"] = timed(isolation(2, False))
    results["silver_rows"] = ov.count()
    results["note"] = (
        "quiet-hour medians of 5 after warm-up; cost is the exact "
        "multi-distinct (each distinct group adds ~0.5-0.9 s over the "
        "silver rows); pre-agg rewrite measured equal-or-slower; "
        "decimal sum keeps rounding parity for ~0.26 s"
    )

    print(json.dumps(results, indent=2))
    with open(os.path.join(os.path.dirname(__file__), "probe_gold_seasonality_r12.json"), "w") as f:
        json.dump(results, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
