"""Interleaved A/B for the three changed-and-regressed r16 queries
(VERDICT r16 "Next round" item 1).

The r16 driver bench read `dedup_incremental_lsh` 0.65x,
`stream_upsert_sink` 0.66x and `bronze_incremental_batches` 0.71x — the
only regressed queries whose plans actually changed in r16
(41f9296 checkpoint eager->lazy; 5df8565 merge one-window-pass). Host
drift plausibly explains all three (untouched neighbors read the same),
but "plausibly" is not "shown": this script settles it with the only
measurement this host supports — module-level form alternation in ONE
session, A/B/A/B..., construction inside the timer, medians reported.

Forms:
  merge   r16 = one-window-pass merge_keyed (committed)
          r15 = dedup + anti-join + union (verbatim from 5df8565^)
  ckpt    r16 = new_hashed localCheckpoint(eager=False) (committed)
          r15 = eager=True (flipped via a DataFrame.localCheckpoint
                wrapper; the screen body has exactly one eager=False
                call site, text_dedup.py:1968, so the wrapper is
                surgical for this query)

Usage: python tools/ab_item1_r17.py [--runs N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_keyed_r15(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """The pre-5df8565 two-step form, copied verbatim."""
    cols = old.columns
    from bigdata_project_spark.operators.distinct_on import distinct_on

    residual: list = []
    for c, t in new.dtypes:
        if c in keys:
            continue
        if t.startswith("map"):
            residual.append(
                F.expr(
                    f"to_json(array_sort(map_entries(`{c}`), "
                    "(a, b) -> CASE WHEN a.key < b.key THEN -1 "
                    "WHEN a.key > b.key THEN 1 ELSE 0 END))"
                ).asc_nulls_last()
            )
        else:
            residual.append(F.col(c).asc_nulls_last())
    deduped = distinct_on(new, keys, residual or [F.lit(1)])
    untouched = old.join(deduped.select(*keys), on=keys, how="left_anti")
    return deduped.select(*cols).unionByName(untouched)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--queries",
        default="bronze_incremental_batches,stream_upsert_sink,dedup_incremental_lsh",
    )
    args = ap.parse_args()

    import bigdata_project_spark.operators.merge as merge_mod
    import bigdata_project_spark.plans.bronze_merge as bm_mod
    import bigdata_project_spark.plans.incremental as incr_mod
    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    spark = get_spark("ab_item1_r17")
    merge_r16 = merge_mod.merge_keyed
    lcp_orig = DataFrame.localCheckpoint

    def lcp_force_eager(self, eager=True):
        return lcp_orig(self, eager=True)

    def set_form(kind: str, form: str) -> None:
        if kind == "merge":
            fn = merge_keyed_r15 if form == "r15" else merge_r16
            merge_mod.merge_keyed = fn
            incr_mod.merge_keyed = fn
            bm_mod.merge_keyed = fn
        elif kind == "ckpt":
            DataFrame.localCheckpoint = (
                lcp_force_eager if form == "r15" else lcp_orig
            )

    KIND = {
        "bronze_incremental_batches": "merge",
        "stream_upsert_sink": "merge",
        "bronze_merge_keyed": "merge",
        "dedup_incremental_lsh": "ckpt",
    }

    queries = registry.queries()
    results: dict[str, dict] = {}
    for name in args.queries.split(","):
        kind = KIND[name]
        fn = queries[name]
        # one warm-up per form (JIT, file listing, memoized stores)
        for form in ("r16", "r15"):
            set_form(kind, form)
            spark.sparkContext.setJobDescription(f"ab_item1 warmup {name} {form}")
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        samples: dict[str, list[float]] = {"r16": [], "r15": []}
        for i in range(args.runs):
            # balance the within-iteration order so a monotone host trend
            # cannot systematically favor the second form
            order = ("r16", "r15") if i % 2 == 0 else ("r15", "r16")
            for form in order:
                set_form(kind, form)
                spark.sparkContext.setJobDescription(
                    f"ab_item1 {name} {form} run{i}"
                )
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                samples[form].append(round(time.perf_counter() - t0, 3))
        set_form(kind, "r16")  # restore committed form
        results[name] = {
            "kind": kind,
            "r16_median": statistics.median(samples["r16"]),
            "r15_median": statistics.median(samples["r15"]),
            "r16_runs": samples["r16"],
            "r15_runs": samples["r15"],
        }
        print(
            f"{name:30s} r16 {results[name]['r16_median']:.3f}s "
            f"vs r15 {results[name]['r15_median']:.3f}s   "
            f"(r16 {samples['r16']} | r15 {samples['r15']})",
            flush=True,
        )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_item1_r17.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
