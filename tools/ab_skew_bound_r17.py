"""Interleaved A/B for the §2.5 skew-bound candidate joins (r17 item 3).

Forms (toggled via text_dedup._LSH_SALT_THRESHOLD in ONE session,
construction inside the timer, order-balanced):
  off  (0)    = plain melt self-join — the r16 final form
  on   (1024) = skew_bounded_self_pairs — window bucket count + adaptive
                salt (no-op salt values at fixture scale)

Measures the LOCAL cost of the bound on every affected registered query.

Usage: python tools/ab_skew_bound_r17.py [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_recall",
    "dedup_cluster_cc",
    "pipeline_dedup_canonical",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=",".join(QUERIES))
    args = ap.parse_args()

    from bigdata_project_spark import registry
    from bigdata_project_spark.operators import text_dedup as td
    from bigdata_project_spark.session import get_spark

    spark = get_spark("ab_skew_r17")
    q = registry.queries()
    results = {}
    for name in args.queries.split(","):
        fn = q[name]
        samples = {"off": [], "on": []}
        for form, t in (("off", 0), ("on", 1024)):
            os.environ[td._LSH_SALT_ENV] = str(t)
            spark.sparkContext.setJobDescription(f"ab_skew warmup {name} {form}")
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        for i in range(args.runs):
            order = (("off", 0), ("on", 1024)) if i % 2 == 0 else (("on", 1024), ("off", 0))
            for form, t in order:
                os.environ[td._LSH_SALT_ENV] = str(t)
                spark.sparkContext.setJobDescription(f"ab_skew {name} {form} run{i}")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                samples[form].append(round(time.perf_counter() - t0, 3))
        os.environ.pop(td._LSH_SALT_ENV, None)
        results[name] = {
            "off_median": statistics.median(samples["off"]),
            "on_median": statistics.median(samples["on"]),
            "off_runs": samples["off"],
            "on_runs": samples["on"],
        }
        print(
            f"{name:28s} off {results[name]['off_median']:.3f}s vs on "
            f"{results[name]['on_median']:.3f}s  (off {samples['off']} | on {samples['on']})",
            flush=True,
        )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_skew_bound_r17.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
