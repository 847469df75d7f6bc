"""Core-scaling probe: demonstrate that the heavy query plans actually
parallelize (VERDICT r16 item 2).

The driver's 8-vs-32-core bench at sf0.1 reads every ratio ≈ 1 because
each query is bounded by the ~0.3-1 s per-query planning/scheduling
floor, not by scan work — sf0.1 cannot resolve parallelism at all. This
probe runs the heaviest non-stream queries on a 10×-replicated sf0.1
input (the scale_probe replication: shifted keys, on-disk parquet, cold
scans) at SPARK_GRAFT_CPUS=8 vs 32 and records the per-query ratio
t8/t32. A plan that parallelizes reads ≥ 2× once real work dominates
the floor; a ratio ≈ 1 at this size means the query is still
constants-bound (attributed per query in OPTIMIZATION_r17.md).

Methodology: one orchestrator process builds the replicated input once,
then alternates fresh child processes 32,8,32,8,... (a Spark master is
fixed per session, so core counts cannot interleave inside one session;
alternating whole columns brackets the host drift instead — same
rationale as the bench's matched pairs). Per-query medians across the
alternated columns are reported; bench.py itself is untouched (driver
contract intact).

dedup_minhash_recall is excluded for the same reason scale_probe.py
excludes it: its sweep includes the deliberately-degenerate (12,1)
geometry, which on a replicated (duplicate-heavy) corpus goes
quadratic BY DESIGN — the calibration harness runs on bounded samples
at scale.

Usage:
    python tools/core_scaling_probe.py                  # full orchestration
    python tools/core_scaling_probe.py run --dir D      # one column (child)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# Heaviest non-stream queries by the r16 driver column (BENCH_DETAIL),
# biased toward shuffle/scan-heavy plans whose parallelization the 100 TB
# story depends on; one Python-boundary operator included on purpose.
QUERIES = [
    "agg_pricing_summary",        # full-lineitem hash aggregate (Q1)
    "agg_market_share",           # 8-table star join (Q8)
    "dedup_minhash_lsh",          # banded LSH dedup, registered 4x3
    "dedup_fuzzy_lev",            # banded Levenshtein verify
    "dedup_ngram_jaccard",        # PPJoin prefix-filtered exact pairs
    "text_dup_spans_lcp",         # suffix-array capped LCP
    "pipeline_dedup_canonical",   # canonicalize + LSH + cluster
    "dedup_span_removal",         # window rank + anti-join
    "layout_zorder_extents",      # morton ntile + extents join
    "text_source_overlap",        # gram self-join
    "sim_ann_lsh_buckets",        # mapInPandas signature + verify passes
    "graph_triangles",            # oriented wedge join
]


def run_column(sf_dir: str, runs: int, max_partition_bytes: str) -> dict[str, float]:
    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    spark = get_spark("core-scaling-probe")
    # The replicated input is only ~0.1-1 GB per table, so at the default
    # 128 MB split size a scan stage holds 1-8 tasks and CANNOT use more
    # cores no matter what the master says — the first probe run read
    # ratios ≈ 1.1-1.3 for scan-bound queries purely because of split
    # count. At 100 TB a scan has thousands of splits; emulate that here
    # so the ratio measures the PLAN's parallelism, not the toy file
    # count. (Runtime-settable SQL conf; bench.py is untouched.)
    spark.conf.set("spark.sql.files.maxPartitionBytes", max_partition_bytes)
    q = registry.queries()
    out: dict[str, float] = {}
    for name in QUERIES:
        fn = q[name]
        spark.sparkContext.setJobDescription(f"core-scale warmup {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"core-scale {name} run{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[name] = round(samples[len(samples) // 2], 3)
        print(json.dumps({"query": name, "median": out[name], "all": [round(s, 3) for s in samples]}), flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    runp = sub.add_parser("run")
    runp.add_argument("--dir", required=True)
    runp.add_argument("--runs", type=int, default=3)
    runp.add_argument("--out", required=True)
    runp.add_argument("--max-partition-bytes", default="16m")
    orch = ap.add_argument_group("orchestrate")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--dir", dest="top_dir", default="/tmp/spark_graft_corescale")
    ap.add_argument("--columns", type=int, default=2, help="columns per core count")
    ap.add_argument("--runs", dest="top_runs", type=int, default=3)
    args = ap.parse_args()

    if args.cmd == "run":
        timings = run_column(args.dir, args.runs, args.max_partition_bytes)
        with open(args.out, "w") as f:
            json.dump({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "timings": timings}, f)
        return

    # orchestrate: build once, alternate child columns, combine
    big_dir = args.top_dir
    if not os.path.isdir(big_dir) or not os.listdir(big_dir):
        from bigdata_project_spark.session import get_spark
        from tools.scale_probe import build_replicated

        spark = get_spark("core-scaling-build")
        build_replicated(spark, big_dir, args.replicas)
        spark.stop()
        print(f"built {args.replicas}x replicated input at {big_dir}", flush=True)

    cols: dict[str, list[dict]] = {"32": [], "8": []}
    order = ["32", "8"] * args.columns
    for i, cpus in enumerate(order):
        out = os.path.join("/tmp", f"corescale_col{i}_c{cpus}.json")
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        print(f"--- column {i}: {cpus} cores ---", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", "--dir", big_dir,
             "--runs", str(args.top_runs), "--out", out,
             "--max-partition-bytes", "16m"],
            env=env, check=True, cwd=REPO,
        )
        with open(out) as f:
            cols[cpus].append(json.load(f)["timings"])

    result = {"replicas": args.replicas, "queries": {}}
    for name in QUERIES:
        t32 = statistics.median(c[name] for c in cols["32"])
        t8 = statistics.median(c[name] for c in cols["8"])
        result["queries"][name] = {
            "t32_median": t32,
            "t8_median": t8,
            "ratio_8_over_32": round(t8 / max(t32, 1e-9), 2),
            "t32_cols": [c[name] for c in cols["32"]],
            "t8_cols": [c[name] for c in cols["8"]],
        }
        print(json.dumps({"query": name, **result["queries"][name]}), flush=True)
    result["max_partition_bytes"] = "16m"
    out_path = os.path.join(HERE, "core_scaling_probe_r17.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
