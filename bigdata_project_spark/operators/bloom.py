"""Bloom-filter join pruning — the explicit, engine-portable form of the
runtime row-group/scan filter every warehouse pushes below selective
joins (Spark's own AQE runtime filter, Iceberg/Delta bloom indexes).

The setting: a selective dimension predicate (here a 1% customer
segment) joined against the big fact table. At 100 TB you do NOT want
the fact scan to shuffle rows that cannot match: you build a fixed-size
bit array over the (few) surviving dim keys, broadcast it, and test
membership INSIDE the fact scan's filter expression — zero joins, zero
row amplification, false positives only (never false negatives), so the
exact join afterwards touches a tiny superset.

Portability: k=3 hash functions from the md5-derived 32-bit family
(functions/text.py) with seed prefixes; the bit array packs 63 usable
bits per BIGINT word (bit 63 stays clear — DuckDB raises on 1<<63 where
Spark wraps, so the portable word layout simply never uses it). The
Spark side folds the words into a broadcast array LITERAL (the bit
array is ~1000 longs = 8 KB — a k-bounded driver collect of a sketch,
the same policy class as ivf._seed_centroids); the DuckDB twin keeps
the relational 3-way melt-join form, so the two engines prove the same
membership set through different physical plans.

Output (one row): dim key count, fact row count, bloom-pass count, true
match count, false positives, and the false-positive rate over true
negatives — n_pass - n_true == false positives ≥ 0 IS the
no-false-negative guarantee, oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.functions.scalars import round_portable, round_portable_sql
from bigdata_project_spark.functions.text import WORD_HASH32_SQL, word_hash32
from bigdata_project_spark.sources.readers import load_table

#: total bloom bits; 63 usable bits per 64-bit word (see module doc)
BLOOM_BITS = 65536
BLOOM_WORDS = (BLOOM_BITS + 62) // 63
#: number of seeded hash functions
BLOOM_K = 3

#: the selective dim predicate: a deterministic 1% customer segment —
#: scale-invariant selectivity at every fixture size
_SEGMENT_SQL = "o_custkey % 100 = 1"


def _positions(key_col, seed: int):
    """Bloom bit position for hash function ``seed`` of a BIGINT key."""
    h = word_hash32(F.concat(F.lit(f"{seed}:"), key_col.cast("string")))
    return h % BLOOM_BITS


def _pos_sql(key_expr: str, seed: int) -> str:
    h = WORD_HASH32_SQL.format(w=f"'{seed}:' || CAST({key_expr} AS VARCHAR)")
    return f"({h}) % {BLOOM_BITS}"


def query_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    keys = (
        orders.filter(F.expr(_SEGMENT_SQL))
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    # build the bit array distributed (hash agg on ≤ BLOOM_WORDS rows),
    # then collect the ~1000-word sketch to the driver and fold it into
    # a broadcast literal so membership is a pure scan-side expression
    melted = keys.select(
        F.explode(
            F.array(*[_positions(F.col("k"), i) for i in range(BLOOM_K)])
        ).alias("pos")
    ).select(
        F.expr("pos div 63").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("bit"),
    )
    words_pdf = (
        melted.groupBy("word").agg(F.bit_or("bit").alias("bits")).toPandas()
    )
    words = [0] * BLOOM_WORDS
    for _, row in words_pdf.iterrows():
        words[int(row["word"])] = int(row["bits"])

    fact = lineitem.select("l_orderkey").withColumn("bloom", F.lit(words))
    fact = fact.withColumns(
        {f"p{i}": _positions(F.col("l_orderkey"), i) for i in range(BLOOM_K)}
    )
    # SQL shiftright/element_at accept column operands (the pyspark
    # function wrappers insist on int literals)
    member = " AND ".join(
        f"(shiftright(element_at(bloom, CAST(p{i} div 63 AS INT) + 1),"
        f" CAST(p{i} % 63 AS INT)) & 1) = 1"
        for i in range(BLOOM_K)
    )
    passed = fact.filter(F.expr(member)).select("l_orderkey")
    true_m = lineitem.join(F.broadcast(keys), lineitem.l_orderkey == keys.k, "left_semi")

    n_keys = keys.agg(F.count(F.lit(1)).alias("n_keys"))
    n_fact = lineitem.agg(F.count(F.lit(1)).alias("n_fact"))
    n_pass = passed.agg(F.count(F.lit(1)).alias("n_pass"))
    n_true = true_m.agg(F.count(F.lit(1)).alias("n_true"))
    row = (
        n_keys.crossJoin(n_fact).crossJoin(n_pass).crossJoin(n_true)
    )
    fp = F.col("n_pass") - F.col("n_true")
    neg = F.col("n_fact") - F.col("n_true")
    return row.select(
        "n_keys",
        "n_fact",
        "n_pass",
        "n_true",
        fp.alias("n_false_pos"),
        F.when(neg == 0, F.lit(0.0))
        .otherwise(round_portable(fp / neg.cast("double"), 6))
        .alias("fp_rate"),
    )


def _melt_pos_sql(key_expr: str) -> str:
    rows = ", ".join(f"({_pos_sql(key_expr, i)})" for i in range(BLOOM_K))
    return rows


# the oracle's row-preserving membership spells out one join per hash
assert BLOOM_K == 3, "update ORACLE_JOIN_BLOOM_PREFILTER's p0/p1/p2 joins"


ORACLE_JOIN_BLOOM_PREFILTER = f"""
WITH keys AS (
    SELECT DISTINCT o_orderkey AS k FROM orders WHERE {_SEGMENT_SQL}
),
melted AS (
    SELECT u.pos // 63 AS word,
           CAST(1 AS BIGINT) << CAST(u.pos % 63 AS INTEGER) AS bit
    FROM keys, LATERAL (VALUES {_melt_pos_sql("k")}) AS u(pos)
),
bloom AS (SELECT word, bit_or(bit) AS bits FROM melted GROUP BY word),
-- row-preserving membership: one hashed row per FACT ROW (the synthetic
-- lineitem has no unique key — 6000 rows, 4599 distinct
-- (l_orderkey, l_linenumber) pairs — so a melt+group-back would
-- collapse duplicates and undercount), three unique-key left joins
hashed AS (
    SELECT l_orderkey,
           {_pos_sql("l_orderkey", 0)} AS p0,
           {_pos_sql("l_orderkey", 1)} AS p1,
           {_pos_sql("l_orderkey", 2)} AS p2
    FROM lineitem
),
pass AS (
    SELECT h.l_orderkey
    FROM hashed h
    LEFT JOIN bloom b0 ON b0.word = h.p0 // 63
    LEFT JOIN bloom b1 ON b1.word = h.p1 // 63
    LEFT JOIN bloom b2 ON b2.word = h.p2 // 63
    WHERE COALESCE((b0.bits >> CAST(h.p0 % 63 AS INTEGER)) & 1, 0) = 1
      AND COALESCE((b1.bits >> CAST(h.p1 % 63 AS INTEGER)) & 1, 0) = 1
      AND COALESCE((b2.bits >> CAST(h.p2 % 63 AS INTEGER)) & 1, 0) = 1
),
counts AS (
    SELECT
        (SELECT COUNT(*) FROM keys) AS n_keys,
        (SELECT COUNT(*) FROM lineitem) AS n_fact,
        (SELECT COUNT(*) FROM pass) AS n_pass,
        (SELECT COUNT(*) FROM lineitem l
          WHERE EXISTS (SELECT 1 FROM keys WHERE k = l.l_orderkey)) AS n_true
)
SELECT n_keys, n_fact, n_pass, n_true,
       n_pass - n_true AS n_false_pos,
       CASE WHEN n_fact - n_true = 0 THEN 0.0
            ELSE {round_portable_sql(
                "(n_pass - n_true) * 1.0 / (n_fact - n_true)", 6)}
       END AS fp_rate
FROM counts
"""
