"""BPE merge training: algorithm pinned by a hand-computed example."""

from __future__ import annotations

from bigdata_project_spark.operators.bpe import END_OF_WORD, query_bpe_merges, train_merges


def test_bpe_hand_example():
    # classic Sennrich-style toy: {"low":5, "lower":2, "newest":6, "widest":3}
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_merges(counts, n_merges=4)
    # 'e','s' appears in newest(6)+widest(3)=9 — the top pair
    assert merges[0][1:] == ("e", "s", 9)
    # then 'es','t' (9), then 'est','</w>' (9)
    assert merges[1][1:] == ("es", "t", 9)
    assert merges[2][1:] == ("est", END_OF_WORD, 9)
    # ranks are sequential
    assert [m[0] for m in merges] == [0, 1, 2, 3]


def test_bpe_counts_monotone_nonincreasing_and_deterministic(spark, sf_dir):
    a = query_bpe_merges(spark, sf_dir).collect()
    b = query_bpe_merges(spark, sf_dir).collect()
    assert a == b  # replay-stable
    assert len(a) > 0
    # greedy merges: each round's winning count can only rise via previous
    # merges creating new pairs, never above the first round's max of the
    # same symbols... but non-increasing need not hold strictly; assert
    # positive counts and unique (left, right) pairs instead.
    assert all(r["pair_count"] > 0 for r in a)
    assert len({(r["left"], r["right"]) for r in a}) == len(a)


def test_bpe_encode_len_self_pair_runs():
    """Reference-greedy semantics on runs of a self-pair merge — the
    exact case the r5 literal-replace chain got wrong ('aaaaaa' -> 5
    symbols instead of greedy 4). encode_len must pair left-to-right,
    remainder at the end of the run."""
    from bigdata_project_spark.operators.bpe import encode_len

    merges = [(0, "a", "a", 99)]
    # word -> expected symbols (incl. </w>)
    expect = {
        "a": 2,        # a </w>
        "ab": 3,       # a b </w>
        "aaa": 3,      # aa a </w>
        "aaaa": 3,     # aa aa </w>
        "aaaaa": 4,    # aa aa a </w>
        "aaaaaa": 4,   # aa aa aa </w>
        "aaaaaaa": 5,  # aa aa aa a </w>
    }
    for w, n in expect.items():
        assert encode_len(w, merges) == n, w
    # stacked self-pairs: (a,a) then (aa,aa)
    merges2 = [(0, "a", "a", 99), (1, "aa", "aa", 9)]
    assert encode_len("aaaa", merges2) == 2    # aaaa </w>
    assert encode_len("aaaaaa", merges2) == 3  # aaaa aa </w>
    assert encode_len("aaaaa", merges2) == 3   # aaaa a </w>


def _py_tokens(text: str) -> list[str]:
    import re

    return [w for w in re.split(r"\s+", text.strip().lower()) if w]


def _py_encode_doc_counts(rows, vocab_cap):
    """Plain-Python replica of query_bpe_encode: count words, cap the
    vocab, train merges, encode every word reference-greedy."""
    from bigdata_project_spark.operators.bpe import encode_len, train_merges

    counts: dict[str, int] = {}
    for _doc_id, text in rows:
        for w in _py_tokens(text):
            counts[w] = counts.get(w, 0) + 1
    capped = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap]
    merges = train_merges(sorted(capped))
    out: dict[int, tuple[int, int]] = {}
    for doc_id, text in rows:
        ws = _py_tokens(text)
        out[doc_id] = (len(ws), sum(encode_len(w, merges) for w in ws))
    return out


def _fixture_docs(spark, sf_dir):
    from bigdata_project_spark.sources.readers import load_table

    return [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ]


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """query_bpe_encode (dictionary-join path) vs a plain-Python
    reference over the whole fixture corpus."""
    from bigdata_project_spark.operators.bpe import VOCAB_CAP, query_bpe_encode

    rows = _fixture_docs(spark, sf_dir)
    expect = _py_encode_doc_counts(rows, VOCAB_CAP)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in query_bpe_encode(spark, sf_dir).collect()
    }
    assert got == expect


def test_bpe_encode_tail_fallback_matches(spark, sf_dir, monkeypatch):
    """With the vocab cap forced tiny, most words miss the broadcast
    dictionary and take the Arrow pandas-UDF fallback — results must be
    identical to the same-cap Python reference (the fallback computes
    the same function as the dictionary)."""
    import bigdata_project_spark.operators.bpe as bpe_mod

    monkeypatch.setattr(bpe_mod, "VOCAB_CAP", 5)
    rows = _fixture_docs(spark, sf_dir)
    expect = _py_encode_doc_counts(rows, 5)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_mod.query_bpe_encode(spark, sf_dir).collect()
    }
    assert got == expect
