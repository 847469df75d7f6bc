"""Hour-state instrument for the bench drift rule (BASELINE.md).

The sf0.1 matched pairs swing ±30% on FROZEN code because the VM's
effective CPU state changes hour to hour, and the two engines degrade
differently (single-threaded DuckDB vs 32-thread Spark). This probe
takes a 4-component fingerprint so a pair's ratio can be attributed to
machine state instead of guessed at:

  py1     single-thread pure-python loop (GIL-bound work)
  blas32  threaded numpy matmul (the multi-core envelope)
  duck    a fixed DuckDB aggregate over sf0.1 lineitem (the oracle side)
  jvm     20 trivial spark jobs (the per-query scheduling floor)

One JSON line; run back-to-back with each matched pair.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i & 7
    out["py1_sec"] = round(time.perf_counter() - t0, 3)

    import numpy as np

    m = np.random.default_rng(7).standard_normal((2048, 2048))
    m @ m  # warm thread pool
    t0 = time.perf_counter()
    for _ in range(5):
        m @ m
    out["blas32_sec"] = round(time.perf_counter() - t0, 3)

    import duckdb

    con = duckdb.connect()
    q = f"SELECT l_returnflag, SUM(l_extendedprice) FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1"
    con.execute(q).fetchall()
    t0 = time.perf_counter()
    for _ in range(5):
        con.execute(q).fetchall()
    out["duck_sec"] = round(time.perf_counter() - t0, 3)

    from bigdata_project_spark.session import get_spark

    spark = get_spark("vm_probe")
    spark.range(1).count()
    t0 = time.perf_counter()
    for _ in range(20):
        spark.range(1).count()
    out["jvm20_sec"] = round(time.perf_counter() - t0, 3)
    out["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
