"""Scheduling-floor experiment (r7 verdict item 7).

The bench ratio band crept 1.45× (r5) → 1.76-1.94× (r7) almost
entirely from (sub-second queries × Spark's fixed per-query floor), not
from plan decay. Before registering more net-new queries, measure which
in-engine levers — shuffle-partition count, noop-write vs count action,
AQE — actually shave that floor, so BASELINE.md can record a decision
instead of folklore.

Probes (all at the bench's sf dir, median of --runs after 2 warm-ups):

1. ``range1``      : noop-write of ``spark.range(1)`` — the pure
                     plan→schedule→commit floor, no data, no shuffle.
2. ``scan``        : noop-write of a single-column lineitem projection —
                     floor + one cold parquet scan, no shuffle.
3. ``agg32``       : lineitem groupBy(returnflag).count() at the
                     session default shuffle partitions.
4. ``agg8/agg4/agg1``: same aggregate with spark.sql.shuffle.partitions
                     runtime-set to 8/4/1 — isolates reducer-task-count
                     cost inside the floor (AQE coalescing already
                     collapses these post-shuffle, so the delta bounds
                     what a per-family partition cap could ever save).
5. ``suite:<name>`` : representative sub-second suite queries under the
                     default vs capped partitions, timed exactly like
                     bench.py (noop write, same session).

Usage:
    SPARK_GRAFT_CPUS=32 python tools/floor_probe.py [--sf DIR] [--runs N]

Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUITE = ["agg_shipping_priority", "agg_region_revenue", "agg_late_by_class"]


def timed(action, runs: int) -> float:
    for _ in range(2):
        action()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        action()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return round(samples[len(samples) // 2], 3)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=7)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark
    from bigdata_project_spark.sources.readers import load_table

    spark = get_spark("floor_probe")
    default_parts = spark.conf.get("spark.sql.shuffle.partitions")
    out: dict[str, float] = {}

    out["range1"] = timed(lambda: noop(spark.range(1)), args.runs)
    li = lambda: load_table(spark, args.sf, "lineitem")  # noqa: E731
    out["scan"] = timed(lambda: noop(li().select("l_returnflag")), args.runs)

    agg = lambda: li().groupBy("l_returnflag").count()  # noqa: E731
    out[f"agg{default_parts}"] = timed(lambda: noop(agg()), args.runs)
    for parts in (8, 4, 1):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        out[f"agg{parts}"] = timed(lambda: noop(agg()), args.runs)
    spark.conf.set("spark.sql.shuffle.partitions", default_parts)

    qs = registry.queries()
    for name in SUITE:
        fn = qs[name]
        out[f"suite:{name}@{default_parts}"] = timed(
            lambda: noop(fn(spark, args.sf)), args.runs
        )
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        out[f"suite:{name}@8"] = timed(
            lambda: noop(fn(spark, args.sf)), args.runs
        )
        spark.conf.set("spark.sql.shuffle.partitions", default_parts)

    print(json.dumps({"sf": args.sf, "runs": args.runs, "sec": out}))


if __name__ == "__main__":
    main()
