"""dedup_minhash_recall truth-pass probe (VERDICT r16 item 5).

Two questions:
1. Where do the query's seconds go? (decomposition: shingle checkpoint,
   truth PPJoin pass, candidate melt join, final stats)
2. Can an exact-dup pre-collapse before the pair melt cut the truth
   pass (the r9 prune's supposed leftover)?

For (2) the deciding number is the corpus's exact-dup mass under
content_hash grouping — the pre-collapse can only remove work
proportional to it.

Usage: python tools/recall_truth_probe_r17.py [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def timed(label, build, runs, out):
    samples = []
    build().write.format("noop").mode("overwrite").save()  # warm-up
    for _ in range(runs):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
    out[label] = {"median": statistics.median(samples), "runs": samples}
    print(label, out[label], flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from bigdata_project_spark import registry
    from bigdata_project_spark.functions.text import content_hash
    from bigdata_project_spark.operators import text_dedup as td
    from bigdata_project_spark.session import get_spark

    spark = get_spark("recall-truth-probe")
    out: dict = {}

    corpus = td._corpus_with_near_dups(spark, args.sf)
    # dup-mass: the budget an exact-dup pre-collapse could work with
    g = (
        corpus.select(content_hash(F.col("text")).alias("h"))
        .groupBy("h")
        .count()
    )
    row = g.agg(
        F.count("*").alias("groups"),
        F.sum("count").alias("docs"),
        F.max("count").alias("max_group"),
        F.sum(F.expr("count*(count-1)/2")).alias("intra_pairs"),
    ).collect()[0]
    out["dup_mass"] = {k: int(row[k]) for k in ("groups", "docs", "max_group", "intra_pairs")}
    print("dup_mass", out["dup_mass"], flush=True)

    runs = args.runs

    def full():
        return registry.queries()["dedup_minhash_recall"](spark, args.sf)

    def sh_only():
        return td.shingle_rows(td._corpus_with_near_dups(spark, args.sf))

    def truth_only():
        sh = td.shingle_rows(td._corpus_with_near_dups(spark, args.sf)).localCheckpoint(eager=True)
        return (
            td._prefix_filtered_pairs(sh, td._RECALL_J_NUM, td._RECALL_J_DEN)
            .filter(F.col("jaccard") >= td._RECALL_J_NUM / td._RECALL_J_DEN)
            .select("doc_a", "doc_b")
        )

    def cands_only():
        sh = td.shingle_rows(td._corpus_with_near_dups(spark, args.sf)).localCheckpoint(eager=True)
        sigs = td.minhash_signatures(sh)
        all_bands = F.array(
            *[
                F.struct(
                    F.lit(nb).alias("cfg"),
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "|",
                        *[F.col(f"mh{b * rpb + r}") for r in range(rpb)],
                    ).alias("sig"),
                )
                for nb, rpb in td.MINHASH_RECALL_CONFIGS
                for b in range(nb)
            ]
        )
        melted = sigs.select("doc_id", F.explode(all_bands).alias("bs")).select(
            "doc_id",
            F.col("bs.cfg").alias("cfg"),
            F.col("bs.band").alias("band"),
            F.col("bs.sig").alias("sig"),
        )
        return td.skew_bounded_self_pairs(
            melted, ["cfg", "band", "sig"], carry=("cfg",)
        ).distinct()

    timed("full_query", full, runs, out)
    timed("shingle_rows_only", sh_only, runs, out)
    timed("truth_pass_only(incl sh ckpt)", truth_only, runs, out)
    timed("cands_melt_only(incl sh ckpt)", cands_only, runs, out)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "recall_truth_probe_r17.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
