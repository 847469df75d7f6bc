"""Re-read the r15/r16 drift-class watch list (VERDICT r16 item 6).

Isolated 5-run noop-sink medians for the five watch queries, bracketed
by vm_state probes so the reading's host-state is recorded. Quote-able
only when the probes are clean; otherwise the artifact still documents
the attempt and the hour state.

Usage: python tools/drift_watch_r17.py [--runs 5]
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
sys.path.insert(0, os.path.dirname(HERE))

WATCH = [
    "dedup_simhash_pairs",
    "bronze_incremental_batches",
    "gold_overnights_seasonality",
    "graph_pagerank",
    "sim_ivfpq_topk",
]

# r14j/r16b clean-window reference readings (VERDICT item 6's 1.2x line)
CLEAN_REF = {
    "dedup_simhash_pairs": 1.65,
    "bronze_incremental_batches": 2.01,
    "gold_overnights_seasonality": 1.68,
    "graph_pagerank": 1.074,
    "sim_ivfpq_topk": 1.018,
}


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "vm_state_probe.py")],
        capture_output=True, text=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    pre = probe()
    print("probe pre", json.dumps(pre), flush=True)

    spark = get_spark("drift-watch-r17")
    q = registry.queries()
    results = {"probe_pre": pre}
    for name in WATCH:
        fn = q[name]
        spark.sparkContext.setJobDescription(f"drift-watch warmup {name}")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"drift-watch {name} run{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        med = statistics.median(samples)
        ref = CLEAN_REF[name]
        results[name] = {
            "median": med,
            "runs": samples,
            "clean_ref": ref,
            "ratio_vs_ref": round(med / ref, 2),
        }
        print(name, json.dumps(results[name]), flush=True)
    results["probe_post"] = probe()
    print("probe post", json.dumps(results["probe_post"]), flush=True)
    path = os.path.join(HERE, "drift_watch_r17.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
