"""Semantics of the corpus-curation signal operators beyond oracle parity."""

from __future__ import annotations

from bigdata_project_spark.operators.text_signals import (
    query_sample_stratified,
    query_text_pii_redact,
    query_text_repetition,
)


def test_repetition_ratios_bounded(spark, sf_dir):
    out = query_text_repetition(spark, sf_dir).toPandas()
    assert len(out) > 0
    for c in ("frac_dup_trigrams", "top_bigram_frac", "top_word_frac"):
        assert (out[c] >= 0).all() and (out[c] <= 1).all()
    # word-soup fixture repeats its small vocabulary heavily
    assert (out["frac_dup_trigrams"] > 0).any()


def test_pii_planted_counts(spark, sf_dir):
    out = query_text_pii_redact(spark, sf_dir).toPandas().set_index("doc_id")
    assert (out.loc[[i for i in out.index if i % 3 == 0], "n_emails"] >= 1).all()
    assert (out.loc[[i for i in out.index if i % 5 == 0], "n_urls"] >= 1).all()
    assert (out.loc[[i for i in out.index if i % 7 == 0], "n_longnums"] >= 1).all()
    assert (out.loc[[i for i in out.index if i % 3 and i % 5 and i % 7], "n_emails"] == 0).all()


def test_stratified_sample_deterministic_and_rated(spark, sf_dir):
    a = query_sample_stratified(spark, sf_dir).toPandas()
    b = query_sample_stratified(spark, sf_dir).toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # replay-stable
    from bigdata_project_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").toPandas()
    n_en = (docs["lang"] == "en").sum()
    if n_en >= 50:
        frac_en = (a["lang"] == "en").sum() / n_en
        assert 0.3 < frac_en < 0.7  # rate 0.5 ± hash noise


def test_source_overlap_invariants(spark, sf_dir):
    """Cross-source overlap audit: every emitted pair is canonical
    (a < b, so no mirror duplicates), shared counts are bounded by both
    vocabularies, and Jaccard is the exact set formula on the reported
    counts."""
    from bigdata_project_spark.operators.text_signals import (
        query_text_source_overlap,
    )

    out = query_text_source_overlap(spark, sf_dir).toPandas()
    assert len(out)  # the fixture has real cross-source overlap
    assert (out["source_a"] < out["source_b"]).all()
    assert not out.duplicated(["source_a", "source_b"]).any()
    assert (out["n_shared"] >= 1).all()
    assert (out["n_shared"] <= out[["n_a", "n_b"]].min(axis=1)).all()
    expect = out["n_shared"] / (out["n_a"] + out["n_b"] - out["n_shared"])
    assert ((out["jaccard"] - expect).abs() <= 1e-6).all()
    assert ((out["jaccard"] > 0) & (out["jaccard"] <= 1)).all()
