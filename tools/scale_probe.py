"""Scale-sensitivity probe: measure how operator wall time grows with
input size, as direct evidence for the 100 TB design claims.

Each probed operator family runs at sf0.01 (~60 k lineitem rows /
500 docs) and at a REPLICATED sf0.1 (the sf0.1 parquet unioned
``REPLICAS``× with shifted keys → ~6 M lineitem rows, 100× the small
run). A scale-correct plan should grow ~linearly in input (factor ≈
size ratio × constant), never quadratically; candidate-generation
dedup ops should grow with candidate volume, not with corpus².

This is a diagnostic tool, not a gate: it prints one JSON line per
probe with the observed seconds at each size and the growth factor.
Read the GROWTH SHAPE, not individual seconds: sub-second timings on
this VM drift ±1 s hour to hour (BASELINE.md documents the band), so a
probe can even read "faster" at 100× input when both sides sit on the
scheduling floor. The red flag this tool exists to catch is
growth_vs_linear ≫ 1 — a quadratic candidate generator or an
accidental cross join; observed values ≤ ~0.1 mean every probed plan
is floor- or linear-bound.
Replication happens through an on-disk parquet copy (written under
/tmp) so both runs pay the same cold-scan cost per query — matching
bench.py's no-caching policy.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/scale_probe.py [--replicas 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/root/testdata/sf0.01"
BIG_SRC = "/root/testdata/sf0.1"

# (probe name, registry query) — one representative per scale-critical
# family: hash-agg rollup, un-hinted star join, banded dedup, window
# rank decomposition, as-of join, text explode+agg
PROBES = [
    ("hash_agg_rollup", "agg_pricing_summary"),
    ("star_join_unhinted", "agg_shipping_priority"),
    ("scan_predicate_sum", "agg_forecast_revenue"),
    ("dedup_minhash_lsh", "dedup_minhash_lsh"),
    ("exact_substring_dedup", "text_dup_spans"),
    # candidate-pruned capped-LCP: full-corpus work is one level-SA_T
    # pass; growth must track corpus size, not dup-mass squared
    ("capped_lcp_profile", "text_dup_spans_lcp"),
    ("asof_join", "join_asof"),
    ("char_entropy", "text_char_entropy"),
    ("global_shuffle", "pipeline_global_shuffle"),
    # r9 additions: incremental new-vs-existing screen (cost must track
    # batch size + collisions, never corpus size), the broadcast bloom
    # prune, and the prefix-sum shard planner.
    # dedup_minhash_recall is deliberately NOT probed: its sweep includes
    # the (12,1) single-hash geometry — the intentionally unbounded
    # fan-out extreme of the calibration curve — which on this probe's
    # adversarial ~100%-duplicate corpus degenerates to all-pairs (hot
    # single-minhash buckets of >10k docs). The harness is a banding
    # CALIBRATION tool: at scale it runs on a bounded sample (as every
    # production LSH calibration does), never the full corpus; the
    # bounded-geometry production path (4x3) is probed above as
    # dedup_minhash_lsh.
    ("incremental_dedup", "dedup_incremental_lsh"),
    ("bloom_prefilter", "join_bloom_prefilter"),
    ("shard_manifest", "pipeline_shard_manifest"),
    # r10 additions: the STORE-BACKED incremental screen (store build is
    # amortized by the warm-up run; the timed screen must track batch
    # size + collisions — this is the contract the signature store
    # exists to prove) is covered by incremental_dedup above; the gold
    # income×mobility rollup (broadcast dim join + low-cardinality agg
    # over a materialized silver table — growth must track the fact
    # scan) is probed here.
    ("gold_income_mobility", "gold_income_mobility"),
    # r11 addition: third gold rollup — broadcast holiday dim + one
    # low-cardinality hash agg with two exact distincts over the
    # materialized overnights silver; growth must track the fact scan
    ("gold_overnights_seasonality", "gold_overnights_seasonality"),
    # r12 additions: the three plans changed this round. The no-persist
    # distributed_ntile re-evaluates its projection in the counts and
    # rank subtrees — still two linear scans, which is the claim to
    # verify; the corr bigint lane is ONE scan + ONE 15-column reduce.
    ("zorder_ntile_extents", "layout_zorder_extents"),
    ("equidepth_ntile", "feature_binning_equidepth"),
    ("corr_matrix_moments", "feature_corr_matrix"),
]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# tables whose row count scales with the data (dims replicate with
# shifted keys too — referential integrity is NOT required by any probe,
# only key-distribution realism)
SCALED = {"customer", "supplier", "part", "orders", "lineitem", "events", "documents"}


def build_replicated(spark, out_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    from bigdata_project_spark.sources.readers import load_table

    os.makedirs(out_dir, exist_ok=True)
    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["user_id"],
        "documents": ["doc_id"],
    }
    for t in TABLES:
        df = load_table(spark, BIG_SRC, t)
        if t in SCALED:
            # shift every key by replica*10^9 so replicas don't merge
            parts = []
            for r in range(replicas):
                p = df
                for k in key_cols.get(t, []):
                    p = p.withColumn(k, F.col(k) + F.lit(r * 1_000_000_000))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))


def time_query(fn, spark, sf_dir: str, runs: int = 3) -> float:
    fn(spark, sf_dir).count()  # warm-up
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default="/tmp/spark_graft_scale_probe")
    ap.add_argument("--only", nargs="*", help="probe names to run (default all)")
    args = ap.parse_args()

    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    spark = get_spark("scale-probe")
    big_dir = args.out
    build_replicated(spark, big_dir, args.replicas)

    q = registry.queries()
    # actual input sizes per dir: the fixture families scale differently
    # (lineitem 10x between sf dirs; documents/embeddings are fixed-size
    # at small sf), so per-probe ratios must use the driving table
    counts = {}
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        from bigdata_project_spark.sources.readers import load_table

        counts[t] = {
            "small": load_table(spark, SMALL, t).count(),
            "big": load_table(spark, big_dir, t).count(),
        }
    print(json.dumps({"input_rows": counts}), flush=True)
    driving = {
        "hash_agg_rollup": "lineitem",
        "star_join_unhinted": "lineitem",
        "scan_predicate_sum": "lineitem",
        "dedup_minhash_lsh": "documents",
        "exact_substring_dedup": "documents",
        "capped_lcp_profile": "documents",
        "asof_join": "events",
        "char_entropy": "documents",
        "global_shuffle": "documents",
        "incremental_dedup": "documents",
        "minhash_recall_sweep": "documents",
        "bloom_prefilter": "lineitem",
        "shard_manifest": "documents",
        # silver_people_day derives from orders; the renta dim (part) is
        # broadcast-sized by construction
        "gold_income_mobility": "orders",
        # silver_overnights derives from lineitem; the holiday dim is
        # month-cardinality by construction
        "gold_overnights_seasonality": "lineitem",
        # r12: all three changed plans scan lineitem
        "zorder_ntile_extents": "lineitem",
        "equidepth_ntile": "lineitem",
        "corr_matrix_moments": "lineitem",
    }
    for probe, name in PROBES:
        if args.only and probe not in args.only:
            continue
        small_s = time_query(q[name], spark, SMALL)
        big_s = time_query(q[name], spark, big_dir)
        growth = big_s / max(small_s, 1e-9)
        c = counts[driving[probe]]
        size_ratio = c["big"] / max(c["small"], 1)
        print(
            json.dumps(
                {
                    "probe": probe,
                    "query": name,
                    "small_sec": round(small_s, 3),
                    "big_sec": round(big_s, 3),
                    "input_ratio": round(size_ratio, 1),
                    "growth_factor": round(growth, 2),
                    "growth_vs_linear": round(growth / size_ratio, 3),
                }
            ),
            flush=True,
        )
    shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
