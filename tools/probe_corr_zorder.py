"""Focused A/B probes for the two non-floor-bound weak queries (r12).

corr: decompose_weak showed feature_corr_matrix is compute-bound, not
floor-bound (bare 4-col scan 0.065 s vs 1.59 s full) — the suspect is
the decimal(19,0)x(19,0)->(38,0) product inside every Σxy aggregate.
A/B: (a) current all-decimal lane, (b) BIGINT per-row products (exact:
scaled values <= ~1.05e7 at scale 100, products <= ~1.1e14 < 2^63)
summed through DECIMAL, (c) double everything (inexact, timing bound).

zorder: r11 verdict item 5 — 1.15 s (r5) crept to ~2.1-2.5 s. A/B the
cache lifecycle: (a) current (evict + persist + eager count),
(b) no eager count, (c) no persist at all.
"""

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
    from pyspark.sql import functions as F

    from bigdata_project_spark.operators import stats, zorder
    from bigdata_project_spark.session import get_spark
    from bigdata_project_spark.sources.readers import load_table

    spark = get_spark("probe_corr_zorder")
    out: dict[str, float] = {}

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    li = load_table(spark, sf_dir, "lineitem")
    CORR = stats.CORR_COLS

    def agg_of(scaled_fn, sum_cast: str | None):
        scaled = li.select(*[scaled_fn(c).alias(f"v_{c}") for c in CORR])
        aggs = [F.count(F.lit(1)).alias("n")]
        for c in CORR:
            aggs.append(F.sum(f"v_{c}").alias(f"s_{c}"))
        for i, a in enumerate(CORR):
            for b in CORR[i:]:
                prod = F.col(f"v_{a}") * F.col(f"v_{b}")
                if sum_cast:
                    prod = prod.cast(sum_cast)
                aggs.append(F.sum(prod).alias(f"s_{a}_{b}"))
        return scaled.agg(*aggs)

    dec19 = lambda c: F.floor(F.col(c) * 1e6 + F.lit(0.5)).cast("decimal(19,0)")
    big100 = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("bigint")
    dbl = lambda c: F.col(c).cast("double")

    out["corr_decimal_lane"] = timed(lambda: noop(agg_of(dec19, None)))
    out["corr_bigint_prod_decimal_sum"] = timed(
        lambda: noop(agg_of(big100, "decimal(38,0)"))
    )
    # (a bigint SUM of the bigint products overflows int64 — verified:
    # ANSI mode raises ARITHMETIC_OVERFLOW at sf0.1 — hence the
    # decimal(38,0) sum lane above)
    out["corr_double_lane"] = timed(lambda: noop(agg_of(dbl, None)))
    out["corr_registered"] = timed(
        lambda: noop(stats.query_feature_corr_matrix(spark, sf_dir))
    )

    # ---- zorder lifecycle A/B -------------------------------------------
    out["zorder_current"] = timed(
        lambda: noop(zorder.query_zorder_extents(spark, sf_dir))
    )

    def ntile_variant(warm: bool, persist: bool):
        lo_x, hi_x, lo_y, hi_y = li.agg(
            F.min("l_partkey"), F.max("l_partkey"),
            F.min("l_suppkey"), F.max("l_suppkey"),
        ).first()
        x = zorder.scaled(F.col("l_partkey"), lo_x, hi_x)
        y = zorder.scaled(F.col("l_suppkey"), lo_y, hi_y)
        zed = (
            li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
            .withColumn("z", zorder.zvalue(x, y))
        )
        from pyspark import StorageLevel
        from pyspark.sql import Window

        df = zed
        if persist:
            with zorder._CACHE_LOCK:
                while zorder._PREV_CACHES:
                    zorder._PREV_CACHES.pop().unpersist(blocking=False)
                df = df.persist(StorageLevel.MEMORY_AND_DISK)
                zorder._PREV_CACHES.append(df)
            if warm:
                df.count()
        lo, hi = 0, 4**zorder.Z_BITS - 1
        span = max(hi - lo + 1, 1)
        pid = F.expr(f"CAST(((z - {lo}) * 32) div {span} AS INT)")
        keyed = df.withColumn("__pid", pid)
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
        w_local = Window.partitionBy("__pid").orderBy("z", "l_orderkey", "l_linenumber")
        ranked = keyed.join(F.broadcast(stats_df), "__pid").withColumn(
            "__rank", F.row_number().over(w_local) + F.col("__off")
        )
        ranked = ranked.withColumn("__q", F.expr("__n div 32")).withColumn(
            "__rem", F.col("__n") % 32
        )
        big = F.col("__rem") * (F.col("__q") + 1)
        bucket = F.when(
            F.col("__rank") <= big, F.expr("(__rank - 1) div (__q + 1)") + 1
        ).otherwise(
            F.col("__rem")
            + F.expr("(__rank - 1 - __rem * (__q + 1)) div greatest(__q, 1L)")
            + 1
        )
        res = ranked.withColumn("bucket", bucket.cast("int")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
            F.min("l_suppkey").alias("min_suppkey"),
            F.max("l_suppkey").alias("max_suppkey"),
        )
        noop(res)

    out["zorder_no_warm"] = timed(lambda: ntile_variant(warm=False, persist=True))
    out["zorder_no_persist"] = timed(lambda: ntile_variant(warm=False, persist=False))
    out["zorder_warm_persist_inline"] = timed(
        lambda: ntile_variant(warm=True, persist=True)
    )

    out["sf_dir"] = sf_dir
    print(json.dumps(out, indent=1, sort_keys=True))
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_corr_zorder_r12.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")


if __name__ == "__main__":
    main()
