"""Host CPU-delivery probe: does this sandbox actually deliver 4x going
8 -> 32 cores on embarrassingly parallel work?

The core-scaling probe (core_scaling_probe_r17.json) read t8/t32 ratios
of 0.69-1.67 on the heavy queries — far from the ideal 4x. Before
attributing that to the PLANS, measure the HOST: a pure-CPU Spark job
(sha2 hashing over spark.range, 256 even partitions, no shuffle beyond
the 1-row final aggregate, no parquet, no Python) is the best case any
plan can achieve. Its t8/t32 ratio is the ceiling for every query's
ratio on this machine; per-query attribution is measured against THIS
ceiling, not against the theoretical 4x.

Same orchestration as core_scaling_probe: a Spark master is fixed per
session, so whole child columns alternate 32,8,32,8 to bracket host
drift.

Usage: python tools/cpu_delivery_probe_r17.py
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

N_ROWS = 96_000_000  # ~8 s at 32 cores / ~30 s at 8 — real work, not floor
N_PARTS = 256        # even splits, 8x the largest core count


def run_column(runs: int) -> list[float]:
    from pyspark.sql import functions as F

    from bigdata_project_spark.session import get_spark

    spark = get_spark("cpu-delivery-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def job() -> None:
        (
            spark.range(0, N_ROWS, 1, numPartitions=N_PARTS)
            .select(F.sum(F.pmod(F.xxhash64(F.sha2(F.col("id").cast("string"), 256)), F.lit(1_000_000))).alias("s"))
            .write.format("noop").mode("overwrite").save()
        )

    job()  # warm-up (codegen)
    out = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"cpu-delivery run{i}")
        t0 = time.perf_counter()
        job()
        out.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "runs": out}), flush=True)
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        timings = run_column(int(sys.argv[2]))
        with open(sys.argv[3], "w") as f:
            json.dump(timings, f)
        return

    cols: dict[str, list[float]] = {"32": [], "8": []}
    for i, cpus in enumerate(["32", "8", "32", "8"]):
        out = f"/tmp/cpu_delivery_col{i}.json"
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", "3", out],
            env=env, check=True, cwd=REPO,
        )
        with open(out) as f:
            cols[cpus].extend(json.load(f))

    t32 = statistics.median(cols["32"])
    t8 = statistics.median(cols["8"])
    result = {
        "n_rows": N_ROWS,
        "n_partitions": N_PARTS,
        "t32_runs": cols["32"],
        "t8_runs": cols["8"],
        "t32_median": t32,
        "t8_median": t8,
        "ratio_8_over_32": round(t8 / t32, 2),
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(HERE, "cpu_delivery_probe_r17.json"), "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
