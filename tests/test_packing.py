"""Sequence packing + domain mixture: conservation and determinism."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_project_spark.operators.packing import (
    SEQ_LEN,
    pack_sequences,
    query_domain_mixture,
    query_pack_sequences,
)
from bigdata_project_spark.functions.text import tokens
from bigdata_project_spark.sources.readers import load_table


def test_pack_conserves_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total_tok = docs.select(F.sum(F.size(tokens(F.col("text"))))).collect()[0][0]
    packed_tok = pack_sequences(docs).select(F.sum("seq_tokens")).collect()[0][0]
    assert packed_tok == total_tok


def test_pack_every_bin_full_except_last(spark, sf_dir):
    out = query_pack_sequences(spark, sf_dir).collect()
    by_bin = {r["seq_id"]: r["n_tokens"] for r in out}
    last = max(by_bin)
    for b, n in by_bin.items():
        if b != last:
            assert n == SEQ_LEN, f"bin {b} has {n} tokens"
    assert 0 < by_bin[last] <= SEQ_LEN
    # bins are dense 0..last
    assert sorted(by_bin) == list(range(last + 1))


def test_pack_matches_naive_global_window(spark, sf_dir):
    """The two-pass distributed prefix sum equals the naive (single
    reducer) unpartitioned-window cumsum."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("tok")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r["doc_id"]: r["off"]
        for r in toks.select(
            "doc_id", F.coalesce(F.sum("tok").over(w), F.lit(0)).alias("off")
        ).collect()
    }
    packed = pack_sequences(docs)
    starts = {
        r["doc_id"]: r["seq_id"]
        for r in packed.groupBy("doc_id").agg(F.min("seq_id").alias("seq_id")).collect()
    }
    for doc_id, off in naive.items():
        assert starts[doc_id] == off // SEQ_LEN


def test_mixture_hits_floor_of_weighted_cap(spark, sf_dir):
    kept = query_domain_mixture(spark, sf_dir)
    counts = {r["source"]: r["cnt"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    docs = load_table(spark, sf_dir, "documents")
    totals = {r["source"]: r["cnt"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    weights = {s: (int(s[3:]) + 1) / 210.0 for s in totals}
    cap = min(totals[s] / weights[s] for s in totals)
    for s, n in counts.items():
        assert n == int(weights[s] * cap)
        assert n <= totals[s]


def test_mixture_stable_across_layouts(spark, sf_dir):
    a = {tuple(r) for r in query_domain_mixture(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").repartition(13)
    from bigdata_project_spark.operators import packing

    # same query body over a repartitioned scan
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    weighted = counts.select(
        "source", "n",
        ((F.regexp_extract("source", r"src(\d+)", 1).cast("int") + 1) / F.lit(packing._W_DENOM)).alias("w"),
    )
    cap = weighted.agg(F.min(F.col("n") / F.col("w")).alias("cap"))
    keep = weighted.crossJoin(F.broadcast(cap)).select(
        "source", F.floor(F.col("w") * F.col("cap")).alias("keep_n")
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    b = {
        tuple(r)
        for r in docs.select("doc_id", "source", F.row_number().over(w_rank).alias("rnk"))
        .join(F.broadcast(keep), "source")
        .filter(F.col("rnk") <= F.col("keep_n"))
        .select("doc_id", "source")
        .collect()
    }
    assert a == b


def test_pack_ignores_null_text_and_keeps_empty_string(spark):
    """tok == 0 guard: a null-text doc contributes nothing (and produces
    no descending F.sequence artifacts); '' still tokenizes to [''] and
    packs one token."""
    rows = [(1, "alpha beta gamma"), (2, ""), (3, None), (4, "delta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(docs).collect()
    assert all(r["seq_tokens"] > 0 for r in out)
    ids = {r["doc_id"] for r in out}
    assert 3 not in ids
    assert {1, 2, 4} <= ids


def test_mixture_drops_nonconforming_source_on_both_engines(spark, duck):
    """A source that doesn't match src<i> is filtered, not NULL-weighted
    (Spark) / CAST-errored (DuckDB)."""
    from bigdata_project_spark.operators.packing import ORACLE_DOMAIN_MIXTURE

    assert "regexp_matches" in ORACLE_DOMAIN_MIXTURE
    rows = [(i, f"src{i % 3}", "x y z") for i in range(30)] + [(99, "weird", "x")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = (
        docs.filter(F.col("source").rlike(r"src(\d+)"))
        .groupBy("source")
        .count()
        .collect()
    )
    assert {r["source"] for r in kept} == {"src0", "src1", "src2"}


def test_domain_mixture_malformed_source_symmetric(spark):
    """The anchored ^src\\d{1,9}$ guard: malformed tags and tags whose
    digits could overflow INT32 (10+) are dropped identically by the
    Spark filter and the DuckDB oracle's regexp (on DuckDB an unguarded
    overflowing tag would be a CAST ERROR, on Spark a silent NULL — the
    filter makes both engines total; 9 digits always fit INT32, so no
    previously-valid tag is narrowed)."""
    import duckdb
    from pyspark.sql import functions as F

    tags = [
        "src0", "src19", "src999999", "src999999999",  # kept (<= 9 digits)
        "src", "srcX", "xsrc3", "src3y",               # malformed -> dropped
        "src9999999999", "src99999999999999999",       # 10+ digits -> dropped
    ]
    spark_kept = sorted(
        r["source"]
        for r in spark.createDataFrame([(t,) for t in tags], "source string")
        .filter(F.col("source").rlike(r"^src\d{1,9}$"))
        .collect()
    )
    con = duckdb.connect()
    vals = ", ".join(f"('{t}')" for t in tags)
    duck_kept = sorted(
        r[0]
        for r in con.execute(
            "SELECT source FROM (VALUES " + vals + ") t(source) "
            "WHERE regexp_matches(source, '^src\\d{1,9}$')"
        ).fetchall()
    )
    assert spark_kept == duck_kept == [
        "src0", "src19", "src999999", "src999999999"
    ]
    # and the weight cast is total on both engines for every kept tag
    w = (
        spark.createDataFrame([(t,) for t in spark_kept], "source string")
        .select(
            F.regexp_extract("source", r"^src(\d{1,9})$", 1).cast("int").alias("i")
        )
        .collect()
    )
    assert all(r["i"] is not None for r in w)


def test_pack_masked_trainer_contract(spark, sf_dir):
    """Segment tiling + boundary/loss-mask invariants of the trainer
    contract: segments tile each sequence gap-free from 0 (last sequence
    may end short), every doc starts exactly once and ends exactly once,
    and loss_tokens masks exactly the one boundary position per doc."""
    from bigdata_project_spark.operators.packing import (
        SEQ_LEN,
        pack_sequences_masked,
    )
    from bigdata_project_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    seg = pack_sequences_masked(docs).toPandas()
    assert len(seg)
    # per-sequence tiling: sorted segments are contiguous from 0
    for seq_id, g in seg.groupby("seq_id"):
        g = g.sort_values("seg_start")
        assert g["seg_start"].iloc[0] == 0
        ends = (g["seg_start"] + g["seg_len"]).to_numpy()
        assert (g["seg_start"].to_numpy()[1:] == ends[:-1]).all()
        assert ends[-1] <= SEQ_LEN
    last_seq = seg["seq_id"].max()
    full = seg[seg["seq_id"] < last_seq].groupby("seq_id")["seg_len"].sum()
    assert (full == SEQ_LEN).all()
    # each doc starts once, ends once, and its segments sum to its tokens
    per_doc = seg.groupby("doc_id").agg(
        starts=("doc_start", "sum"), ends=("doc_end", "sum")
    )
    assert (per_doc["starts"] == 1).all()
    assert (per_doc["ends"] == 1).all()
    # exactly one masked (no-loss) position per doc: its boundary token
    assert (seg["loss_tokens"] == seg["seg_len"] - seg["doc_start"]).all()
    assert (seg.groupby("doc_id")
            .apply(lambda g: (g["seg_len"] - g["loss_tokens"]).sum(), include_groups=False)
            == 1).all()


def test_pack_masked_no_new_shuffle(spark, sf_dir):
    """The trainer-contract variant must be projections over the same
    two-pass prefix sum — identical Exchange count to the summary
    variant's pre-aggregation core."""
    from bigdata_project_spark.operators.packing import (
        pack_sequences,
        pack_sequences_masked,
    )
    from bigdata_project_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")

    def n_exchanges(df):
        phys = df._jdf.queryExecution().executedPlan().toString()
        return phys.count("Exchange")

    assert n_exchanges(pack_sequences_masked(docs)) == n_exchanges(
        pack_sequences(docs)
    )
