"""Sweep registered queries for plan-shape anti-patterns (r16).

For each named query (default: every registered non-stream query), dump
the formatted physical plan, parse the operator tree, and count the
shape-relevant node kinds:

  scans      parquet/file scans (duplicated-subtree smell when >> the
             number of distinct tables the query touches)
  rdd        Scan ExistingRDD (localCheckpoint pins / driver literals)
  exch       Exchange (shuffles)
  bexch      BroadcastExchange
  win        Window / WindowGroupLimit nodes
  py         BatchEvalPython / ArrowEvalPython / MapInPandas / MapInArrow
  smj/shj/bhj  join strategies picked by the static planner
  cart       CartesianProduct (should be zero everywhere)

Usage: python tools/plan_shape_probe.py [--sf DIR] [name ...]
Writes one line per query; sort/grep offline.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_NODE = re.compile(r"(?:[+:]-|^)\s*\*?\(?\d*\)?\s*([A-Za-z][A-Za-z0-9_]*)")


def tree_counts(plan: str) -> Counter:
    """Node-name counts from the tree section of a formatted explain."""
    counts: Counter = Counter()
    for line in plan.splitlines():
        if not line.strip():
            break  # tree section ends at the first blank line
        s = line.strip()
        # tree lines: "AdaptiveSparkPlan (65)", "+- Project (64)", ":- Sort (8)"
        m = re.match(r"^(?:[+:]- )?(?:\* )?([A-Za-z][A-Za-z0-9]*)", s.lstrip("+:- "))
        if m:
            counts[m.group(1)] += 1
        if "Scan parquet" in line:
            counts["ScanParquet"] += 1
        if "Scan ExistingRDD" in line:
            counts["ScanRDD"] += 1
        if "Scan orc" in line:
            counts["ScanOrc"] += 1
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    spark = get_spark("plan_shape_probe")
    names = args.names or [n for n in registry.queries() if not n.startswith("stream_")]
    for name in names:
        fn = registry.queries()[name]
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
        except Exception as e:
            print(f"{name:35s} [explain failed: {e}]", flush=True)
            continue
        c = tree_counts(buf.getvalue())
        print(
            f"{name:35s} scans={c['ScanParquet'] + c['ScanOrc']:<3d} rdd={c['ScanRDD']:<3d} "
            f"exch={c['Exchange']:<3d} bexch={c['BroadcastExchange']:<3d} "
            f"win={c['Window'] + c['WindowGroupLimit'] + c['WindowInPandas']:<2d} "
            f"py={c['BatchEvalPython'] + c['ArrowEvalPython'] + c['MapInPandas'] + c['MapInArrow'] + c['FlatMapGroupsInPandas']:<2d} "
            f"smj={c['SortMergeJoin']:<2d} shj={c['ShuffledHashJoin']:<2d} "
            f"bhj={c['BroadcastHashJoin'] + c['BroadcastNestedLoopJoin']:<2d} "
            f"cart={c['CartesianProduct']:d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
