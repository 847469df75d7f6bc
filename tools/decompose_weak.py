"""Decompose the r11 weak-list queries into inherent actions × job floor.

r11 verdict items 3-5: for each correct-but->2x query, either find a
real lever or attribute the cost the way feature_binning_equidepth was
closed in r6 (inherent Spark actions × per-job floor vs real work).
Times, at sf0.1 on the same session:

  floor            per-job scheduling floor (median of 20 trivial jobs)
  incr_build       one-time signature-store build (two replace_table writes)
  incr_screen      the memoized registered query = screen only
  bronze_stage     the 3 staged parquet landing writes (3 write jobs)
  bronze_fold      read staged + 3 merge folds + noop write (1 job)
  bronze_full      the registered query (stage + fold)
  corr_scan        bare 4-column lineitem count (scan + floor)
  corr_full        the registered query (ONE scan + ONE reduce)
  zorder_minmax    the min/max .first() action
  zorder_warm      the distributed_ntile cache warm-up count
  zorder_full      the registered query (minmax + warm + ranked agg)

Writes tools/weak_decomposition_r12.json (5-run medians except the
one-time build). Run on a quiet machine; record the vm_state fingerprint
alongside.
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
    fn()  # warm-up
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from bigdata_project_spark.operators import stats, text_dedup, zorder
    from bigdata_project_spark.plans import incremental
    from bigdata_project_spark.session import get_spark
    from bigdata_project_spark.sources.readers import load_table

    spark = get_spark("decompose_weak")
    out: dict[str, float] = {}

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # per-job floor, same instrument as tools/vm_state_probe.py
    spark.range(1).count()
    t0 = time.perf_counter()
    for _ in range(20):
        spark.range(1).count()
    out["floor"] = round((time.perf_counter() - t0) / 20, 3)

    # --- dedup_incremental_lsh: build vs screen ------------------------
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t0 = time.perf_counter()
    text_dedup.build_sig_store(spark, docs, "probe_hash_store", "probe_band_store")
    out["incr_build_once"] = round(time.perf_counter() - t0, 3)
    # registered query: memoizes its own store on first call, then
    # every later call times the SCREEN alone (what bench medians see)
    out["incr_screen"] = timed(
        lambda: noop(text_dedup.query_dedup_incremental_lsh(spark, sf_dir))
    )

    # --- bronze_incremental_batches: stage vs fold ----------------------
    import tempfile

    def stage_only() -> None:
        base = tempfile.mkdtemp(prefix="decomp_incr_")
        incremental._stage_batches(spark, sf_dir, base)

    out["bronze_stage"] = timed(stage_only)
    base = tempfile.mkdtemp(prefix="decomp_incr_fold_")
    paths = incremental._stage_batches(spark, sf_dir, base)

    def fold_only() -> None:
        from bigdata_project_spark.operators.merge import merge_keyed

        b1, b2, b3 = (spark.read.parquet(p) for p in paths)
        state = b1.select(*incremental._COLS)
        for batch in (b2, b3, b3):
            state = merge_keyed(state, batch.select(*incremental._COLS), keys=["o_orderkey"])
        noop(state.select(*incremental._COLS))

    out["bronze_fold"] = timed(fold_only)
    out["bronze_full"] = timed(
        lambda: noop(incremental.query_bronze_incremental_batches(spark, sf_dir))
    )

    # --- feature_corr_matrix: scan floor vs full ------------------------
    li = load_table(spark, sf_dir, "lineitem")
    out["corr_scan"] = timed(lambda: li.select(*stats.CORR_COLS).count())
    out["corr_full"] = timed(
        lambda: noop(stats.query_feature_corr_matrix(spark, sf_dir))
    )

    # --- layout_zorder_extents: minmax + warm-up + full ------------------
    out["zorder_minmax"] = timed(
        lambda: li.agg(
            F.min("l_partkey"), F.max("l_partkey"),
            F.min("l_suppkey"), F.max("l_suppkey"),
        ).first()
    )

    def zorder_warm() -> None:
        # the projection distributed_ntile persists and eagerly counts
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
        zed.count()

    out["zorder_project_count"] = timed(zorder_warm)
    out["zorder_full"] = timed(
        lambda: noop(zorder.query_zorder_extents(spark, sf_dir))
    )

    out["sf_dir"] = sf_dir
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "weak_decomposition_r12.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
