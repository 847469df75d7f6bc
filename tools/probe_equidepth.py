"""A/B the persist lifecycle for distributed_ntile's approxQuantile
branch (feature_binning_equidepth) — companion to probe_corr_zorder.py:
the lead_range branch measured 2.4x faster WITHOUT the persist
machinery; this decides whether the removal covers both branches."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 5


def timed(fn, runs: int = RUNS) -> float:
    fn()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata_project_spark.operators import profiling
    from bigdata_project_spark.session import get_spark
    from bigdata_project_spark.sources.readers import load_table

    spark = get_spark("probe_equidepth")
    out: dict[str, float] = {}

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out["equidepth_current"] = timed(
        lambda: noop(profiling.query_feature_binning_equidepth(spark, sf_dir))
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_extendedprice").alias("price")
    )

    def no_persist() -> None:
        n_parts, n_buckets = 32, 10
        probs = [i / n_parts for i in range(1, n_parts)]
        cuts = sorted(set(li.stat.approxQuantile("price", probs, 0.001)))
        pid = F.lit(0)
        for c in cuts:
            pid = pid + (F.col("price") > F.lit(c)).cast("int")
        keyed = li.withColumn("__pid", pid)
        counts = keyed.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
        w_cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
        w_all = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        stats_df = counts.select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(w_cum), F.lit(0)).alias("__off"),
            F.sum("__cnt").over(w_all).alias("__n"),
        )
        w_local = Window.partitionBy("__pid").orderBy(
            "price", "l_orderkey", "l_linenumber"
        )
        ranked = keyed.join(F.broadcast(stats_df), "__pid").withColumn(
            "__rank", F.row_number().over(w_local) + F.col("__off")
        )
        ranked = ranked.withColumn("__q", F.expr(f"__n div {n_buckets}")).withColumn(
            "__rem", F.col("__n") % n_buckets
        )
        big = F.col("__rem") * (F.col("__q") + 1)
        bucket = F.when(
            F.col("__rank") <= big, F.expr("(__rank - 1) div (__q + 1)") + 1
        ).otherwise(
            F.col("__rem")
            + F.expr("(__rank - 1 - __rem * (__q + 1)) div greatest(__q, 1L)")
            + 1
        )
        res = (
            ranked.withColumn("bucket", bucket.cast("int"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("price").alias("min_price"),
                F.max("price").alias("max_price"),
            )
        )
        noop(res)

    out["equidepth_no_persist"] = timed(no_persist)
    out["sf_dir"] = sf_dir
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
