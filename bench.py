"""Benchmark harness: times every registered headline query.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local parallelism (default all cores)
    BENCH_RUNS          timed runs per query (default 3, median reported)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    spark = get_spark("bench")

    timings: dict[str, float] = {}
    for name, fn in registry.queries().items():
        # warm-up run: JIT, file listing, broadcast build
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)

    total = round(sum(timings.values()), 3)
    # Compact separators keep the line short: the driver captures only the
    # tail of stdout (~3 KB) and must find the whole JSON object inside it.
    print(
        json.dumps(
            {
                "metric": "sum_of_median_query_times",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
