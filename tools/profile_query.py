"""Profile one or more registered queries: median wall time + formatted plan.

Usage: python tools/profile_query.py [--sf DIR] [--runs N] [--explain] name...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    spark = get_spark("profile")
    for name in args.names:
        fn = registry.queries()[name]
        if args.explain:
            fn(spark, args.sf).explain("formatted")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        print(f"{name:32s} median {samples[len(samples) // 2]:.3f}s  all {[round(s, 3) for s in samples]}")


if __name__ == "__main__":
    main()
