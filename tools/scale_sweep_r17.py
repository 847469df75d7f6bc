"""Full-registry scale sweep on the 10x-replicated input (r17).

The core-scaling probe covered the 12 known-heavy queries; this sweep
times EVERY registered query once-warmed on the replicated input so
nothing quadratic hides among the 157 others. Reading: a query whose
sf0.1 bench time is floor-bound (~0.3-1 s) should land ~1-5 s here if
its plan is linear in input mass on 32 cores; tens of seconds flags a
superlinear term worth decomposing. Near-dup pair queries are expected
to blow up BY CONSTRUCTION (the replicas duplicate text verbatim, so
pair mass grows ~replicas^2) — they are reported, not alarmed.

dedup_minhash_recall is excluded (deliberately-degenerate 12x1 sweep
geometry goes quadratic on a duplicate-heavy corpus by design — same
exclusion as scale_probe/core_scaling_probe).

Usage: SPARK_GRAFT_CPUS=32 python tools/scale_sweep_r17.py [--dir /tmp/spark_graft_corescale]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

SKIP = {"dedup_minhash_recall"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/spark_graft_corescale")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--max-partition-bytes", default="16m")
    ap.add_argument("--only", nargs="*", help="subset of query names")
    ap.add_argument("--out", default="scale_sweep_r17.json")
    args = ap.parse_args()

    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    spark = get_spark("scale-sweep-r17")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", args.max_partition_bytes)

    out: dict[str, float] = {}
    for name, fn in registry.queries().items():
        if name in SKIP or (args.only and name not in args.only):
            continue
        spark.sparkContext.setJobDescription(f"scale-sweep warmup {name}")
        t0 = time.perf_counter()
        try:
            fn(spark, args.dir).write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0
            best = None
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(f"scale-sweep {name} run{i}")
                t0 = time.perf_counter()
                fn(spark, args.dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
            print(json.dumps({"q": name, "best": out[name], "warm": round(warm, 3)}), flush=True)
        except Exception as e:  # noqa: BLE001 - sweep must survive one bad query
            out[name] = -1.0
            print(json.dumps({"q": name, "error": str(e)[:200]}), flush=True)

    path = os.path.join(HERE, args.out)
    with open(path, "w") as f:
        json.dump({"dir": args.dir, "max_partition_bytes": args.max_partition_bytes,
                   "best_of": args.runs, "timings": out}, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
