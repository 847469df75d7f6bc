"""Behavioral tests for the round-6 LLM-pipeline additions:
SemDeDup semantic dedup, deterministic global shuffle, char entropy."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_semantic_dups_stay_within_cell_and_point_down(spark, sf_dir):
    """Every duplicate's survivor is a LOWER-id vector in the SAME
    cell — the SemDeDup contract (cluster-bounded pair search,
    keep-lowest-id survivor rule)."""
    from bigdata_project_spark.operators.semdedup import query_dedup_semantic

    out = query_dedup_semantic(spark, sf_dir)
    dups = out.filter(~F.col("is_kept"))
    assert dups.count() > 0  # fixture plants near-dups
    # dup_of < vec_id always
    assert dups.filter(F.col("dup_of") >= F.col("vec_id")).count() == 0
    # survivor sits in the same cell
    cells = out.select(F.col("vec_id").alias("s_id"), F.col("cell").alias("s_cell"))
    cross = dups.join(cells, F.col("dup_of") == F.col("s_id"))
    assert cross.filter(F.col("cell") != F.col("s_cell")).count() == 0
    # survivors themselves may be dups of something even lower, but every
    # kept vector has no in-cell near-dup below it (kept = dup_of IS NULL)
    assert out.filter(F.col("is_kept") & F.col("dup_of").isNotNull()).count() == 0


def test_semantic_dups_blocked_equals_uncapped_on_giant_cell(spark):
    """The r6 verdict's skew item: a degenerate assignment that lands
    EVERY vector in one cell must produce identical duplicates whether
    the cell is searched as one quadratic block (cap ≫ n) or as many
    chunk-pair blocks (cap=3) — the blocked-matmul decomposition is
    exact, and no single task ever sees more than 2·cap vectors."""
    import random

    from bigdata_project_spark.operators.semdedup import _semantic_dups

    rng = random.Random(7)
    rows = []
    for vid in range(40):
        if vid % 5 == 0 or vid < 4:
            base = [1.0, 0.0, 0.5, -0.25]  # planted near-dup cluster
            vec = [v + rng.uniform(-0.01, 0.01) for v in base]
        else:
            vec = [rng.uniform(-1, 1) for _ in range(4)]
        rows.append((vid, 0, vec))
    assigned = spark.createDataFrame(
        rows, "vec_id long, cell long, embedding array<float>"
    )
    uncapped = {
        r["vec_b"]: r["dup_of"]
        for r in _semantic_dups(assigned, cap=10**9).collect()
    }
    blocked = {
        r["vec_b"]: r["dup_of"]
        for r in _semantic_dups(assigned, cap=3).collect()
    }
    assert uncapped, "fixture must plant at least one near-dup"
    assert blocked == uncapped


def test_global_shuffle_is_exact_permutation_and_deterministic(spark, sf_dir):
    """Positions are exactly 0..n-1 (no gaps/dupes from the rank
    decomposition), shards are fixed-size in shuffle order, and the
    whole ordering is a pure function of (corpus, seed)."""
    from bigdata_project_spark.operators.ordering import (
        SHARD_SIZE,
        query_global_shuffle,
    )

    out = query_global_shuffle(spark, sf_dir).collect()
    n = len(out)
    assert sorted(r["position"] for r in out) == list(range(n))
    for r in out:
        assert r["shard"] == r["position"] // SHARD_SIZE
    # full shards are exactly SHARD_SIZE; only the last may be ragged
    sizes: dict[int, int] = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    last = max(sizes)
    assert all(c == SHARD_SIZE for s, c in sizes.items() if s != last)
    # deterministic: a second run returns the identical order
    again = query_global_shuffle(spark, sf_dir).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in out]
    # and it is NOT the identity order (the hash actually shuffles)
    assert [r["doc_id"] for r in out] != sorted(r["doc_id"] for r in out)


def test_global_shuffle_plan_has_no_global_window(spark, sf_dir):
    """The rank decomposition must never fall back to the single-task
    global window: every Window in the plan is partitioned."""
    from bigdata_project_spark.operators.ordering import query_global_shuffle

    plan = (
        query_global_shuffle(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, f"unpartitioned window: {line[:160]}"


def test_char_entropy_known_values(spark, tmp_path):
    """Hand-checked entropies on a tiny synthetic corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_project_spark.operators.corpus_quality import (
        query_text_char_entropy,
    )

    docs = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["aaaa", "abab", "abcd"],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [4, 4, 4],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in query_text_char_entropy(spark, str(tmp_path)).collect()
    }
    assert out[1]["entropy_bits"] == 0.0  # constant run
    assert abs(out[2]["entropy_bits"] - 1.0) < 1e-5  # two equiprobable chars
    assert abs(out[3]["entropy_bits"] - 2.0) < 1e-5  # four equiprobable chars
    assert out[3]["n_uniq_chars"] == 4 and out[3]["n_chars"] == 4
    assert math.isclose(out[2]["n_chars"], 4)
