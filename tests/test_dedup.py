"""Semantics of the dedup family beyond oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_spark.operators.text_dedup import (
    query_dedup_exact,
    query_dedup_minhash_lsh,
    query_dedup_ngram_jaccard,
    query_dedup_simhash,
)


def test_exact_dedup_collapses_planted_dups(spark, sf_dir):
    out = query_dedup_exact(spark, sf_dir).toPandas()
    # every planted copy (doc_id >= 1e6) must collapse onto its original
    assert (out["n_copies"] >= 1).all()
    assert (out[out["n_copies"] > 1]["doc_id"] < 1_000_000).all()
    dup_groups = int((out["n_copies"] - 1).sum())
    assert dup_groups == 50  # 50 planted copies


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in query_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in query_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert lsh <= exact  # verification step guarantees no false positives
    if exact:
        assert len(lsh) / len(exact) >= 0.9  # banding recall at j≥0.9


def test_simhash_similar_docs_close(spark, sf_dir):
    """Near-duplicate docs (jaccard ≥ 0.9) should have close simhashes."""
    pairs = query_dedup_ngram_jaccard(spark, sf_dir).collect()
    if not pairs:
        return
    sims = {r["doc_id"]: r["simhash"] for r in query_dedup_simhash(spark, sf_dir).collect()}
    close = sum(
        1
        for r in pairs
        if bin(sims[r["doc_a"]] ^ sims[r["doc_b"]]).count("1") <= 4
    )
    assert close / len(pairs) >= 0.8


def test_simhash_is_32_bit(spark, sf_dir):
    out = query_dedup_simhash(spark, sf_dir).agg(
        F.min("simhash").alias("lo"), F.max("simhash").alias("hi")
    ).first()
    assert 0 <= out["lo"] and out["hi"] < 2**32
