"""Replicated-input probe for the merge_keyed form decision (VERDICT r16
item 1: "the merge rewrite's scale argument must be re-made with a
replicated-input probe, not asserted").

Shape under test = the production shape of both registered merge users
(incremental ingest fold, streaming upsert): a SMALL batch merged into a
LARGE state. State = orders replicated N× with shifted keys (~15 M rows
at --replicas 10), batch = a deterministic ~1% key slice, half
overlapping existing keys (updates), half new keys (inserts).

Forms, interleaved A/B/A/B in ONE session, construction inside the timer:
  two-step  (r15/r17 committed): dedup batch -> anti-join old on the
            deduped keys -> union. Old rows are only PROBED by the join
            (broadcast when the batch fits, SMJ otherwise) — the state
            is never width-sorted.
  one-pass  (r16/5df8565): union old+new with a source tag, one window
            pass (row_number + min(src)) over the merge keys — the
            entire state crosses one exchange AND a full-width sort per
            merge.

Also run with autoBroadcastJoinThreshold=-1 (the join strategy a 100 TB
state actually gets — the batch may still broadcast on a real cluster,
but this bounds the two-step form's WORST case).

Usage: python tools/merge_scale_probe_r17.py [--replicas 10] [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEYS = ["o_orderkey"]


def merge_two_step(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    from bigdata_project_spark.operators.distinct_on import distinct_on

    cols = old.columns
    residual = [F.col(c).asc_nulls_last() for c in new.columns if c not in keys]
    deduped = distinct_on(new, keys, residual or [F.lit(1)])
    untouched = old.join(deduped.select(*keys), on=keys, how="left_anti")
    return deduped.select(*cols).unionByName(untouched)


def merge_one_pass(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    cols = old.columns
    residual = [F.col(c).asc_nulls_last() for c in new.columns if c not in keys]
    tagged = (
        new.select(*cols)
        .withColumn("__src", F.lit(0))
        .unionByName(old.select(*cols).withColumn("__src", F.lit(1)))
    )
    w_pick = Window.partitionBy(*keys).orderBy(
        F.col("__src").asc(), *(residual or [F.lit(1)])
    )
    w_key = Window.partitionBy(*keys)
    return (
        tagged.withColumn("__rn", F.row_number().over(w_pick))
        .withColumn("__min_src", F.min("__src").over(w_key))
        .filter(
            ((F.col("__src") == 0) & (F.col("__rn") == 1))
            | ((F.col("__src") == 1) & (F.col("__min_src") == 1))
        )
        .select(*cols)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--dir", default="/tmp/spark_graft_merge_scale")
    args = ap.parse_args()

    from bigdata_project_spark.session import get_spark
    from bigdata_project_spark.sources.readers import load_table

    spark = get_spark("merge-scale-probe")
    base = load_table(spark, "/root/testdata/sf0.1", "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    state_path = os.path.join(args.dir, "state.parquet")
    batch_path = os.path.join(args.dir, "batch.parquet")
    if not os.path.isdir(state_path):
        parts = []
        for r in range(args.replicas):
            parts.append(
                base.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(r * 1_000_000_000)
                )
            )
        state = parts[0]
        for p in parts[1:]:
            state = state.unionByName(p)
        state.write.mode("overwrite").parquet(state_path)
        # ~1% batch: half updates (existing keys, restated price), half
        # inserts (fresh key range)
        upd = base.filter(F.col("o_orderkey") % 200 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + 5.0
        )
        ins = upd.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(900_000_000_000)
        )
        upd.unionByName(ins).write.mode("overwrite").parquet(batch_path)
        print("staged state + batch", flush=True)

    forms = {"two_step": merge_two_step, "one_pass": merge_one_pass}
    results: dict[str, dict] = {}
    for bcast_label, bcast in (("auto_broadcast", None), ("no_broadcast", "-1")):
        if bcast is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        samples = {k: [] for k in forms}
        # warm-ups
        for fname, fn in forms.items():
            old = spark.read.parquet(state_path)
            new = spark.read.parquet(batch_path)
            fn(old, new, KEYS).write.format("noop").mode("overwrite").save()
        for i in range(args.runs):
            order = list(forms) if i % 2 == 0 else list(forms)[::-1]
            for fname in order:
                spark.sparkContext.setJobDescription(
                    f"merge-scale {bcast_label} {fname} run{i}"
                )
                t0 = time.perf_counter()
                old = spark.read.parquet(state_path)
                new = spark.read.parquet(batch_path)
                forms[fname](old, new, KEYS).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[fname].append(round(time.perf_counter() - t0, 3))
        results[bcast_label] = {
            f: {"median": statistics.median(s), "runs": s} for f, s in samples.items()
        }
        print(json.dumps({bcast_label: results[bcast_label]}), flush=True)
        if bcast is not None:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "merge_scale_probe_r17.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
