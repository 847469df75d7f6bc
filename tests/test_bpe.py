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
