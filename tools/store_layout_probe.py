"""Store-layout probe (round 11): flat vs hash-prefix-partitioned
signature store for the incremental batch screen.

The partitioned layout exists for corpus scale: stage 1 of
``screen_batch_against_store`` prunes the hash-store scan to only the
2-hex-char md5 prefixes present in the batch (≤ min(batch, 256)
partitions out of 256), so per-batch scan bytes track the BATCH, not
the corpus. At fixture scale the effect is file-open-count noise — this
probe measures both layouts on a replicated 10× corpus (50k docs) and
records:

- wall time per screen (3-run median) per layout,
- the fraction of store partitions a screen actually touches,
- output equality (the layouts must be semantically identical).

Read the SHAPE: the partitioned win grows with corpus/batch ratio; at
50k docs the store is ~1 MB and both layouts sit on the job floor. The
honest record of that is the point (the r10 verdict's rule: probes are
committed whether they flatter the design or not).

Usage:
    SPARK_GRAFT_CPUS=32 python tools/store_layout_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from bigdata_project_spark.operators import text_dedup as td
    from bigdata_project_spark.oracle_check import canonicalize
    from bigdata_project_spark.session import get_spark
    from bigdata_project_spark.sources.readers import load_table
    from bigdata_project_spark.sources.sinks import drop_table_and_orphan_location

    spark = get_spark("store_layout_probe")
    spark.sparkContext.setLogLevel("ERROR")

    src = "/root/testdata/sf0.1"
    big_dir = "/tmp/store_layout_probe_docs"
    shutil.rmtree(big_dir, ignore_errors=True)
    os.makedirs(big_dir, exist_ok=True)
    docs = load_table(spark, src, "documents").select("doc_id", "text")
    n_small = docs.count()
    replicas = 10
    union = docs
    for k in range(1, replicas):
        union = union.unionByName(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{k}")).alias("text"),
            )
        )
    union.write.mode("overwrite").parquet(f"{big_dir}/documents.parquet")
    corpus = spark.read.parquet(f"{big_dir}/documents.parquet")
    n_big = corpus.count()

    batch = td._incremental_batch(spark, big_dir)
    n_batch = batch.count()

    flat_h, flat_b = "probe_flat_hash", "probe_flat_band"
    part_h, part_b = "probe_part_hash", "probe_part_band"
    result: dict = {
        "probe": "store_layout_flat_vs_hash_prefix",
        "corpus_docs": n_big,
        "small_corpus_docs": n_small,
        "batch_docs": n_batch,
    }
    try:
        t0 = time.time()
        td.build_sig_store(spark, corpus, flat_h, flat_b)
        result["build_flat_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        td.build_sig_store(
            spark, corpus, part_h, part_b, partition_by_hash_prefix=True
        )
        result["build_partitioned_sec"] = round(time.time() - t0, 2)

        def screen(h, b):
            return td.screen_batch_against_store(spark, corpus, batch, h, b)

        # warm-up + 3 timed runs per layout, interleaved to share hour state
        screen(flat_h, flat_b).count()
        screen(part_h, part_b).count()
        flat_times, part_times = [], []
        for _ in range(3):
            t0 = time.time()
            screen(flat_h, flat_b).write.format("noop").mode("overwrite").save()
            flat_times.append(round(time.time() - t0, 3))
            t0 = time.time()
            screen(part_h, part_b).write.format("noop").mode("overwrite").save()
            part_times.append(round(time.time() - t0, 3))
        result["screen_flat_sec"] = sorted(flat_times)[1]
        result["screen_partitioned_sec"] = sorted(part_times)[1]
        result["screen_flat_runs"] = flat_times
        result["screen_partitioned_runs"] = part_times

        # partitions touched: distinct batch prefixes / 256
        n_pref = (
            td._with_hash_prefix(
                batch.select(td.content_hash(F.col("text")).alias("content_hash"))
            )
            .select("hp")
            .distinct()
            .count()
        )
        result["batch_prefixes"] = n_pref
        result["store_partitions"] = 256
        result["partitions_scanned_frac"] = round(n_pref / 256, 3)

        a = canonicalize(screen(flat_h, flat_b).toPandas())
        b = canonicalize(screen(part_h, part_b).toPandas())
        result["outputs_identical"] = bool(a.equals(b))
    finally:
        for t in (flat_h, flat_b, part_h, part_b):
            drop_table_and_orphan_location(spark, t)
        shutil.rmtree(big_dir, ignore_errors=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
