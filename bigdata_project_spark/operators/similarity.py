"""Similarity search over the ``embeddings`` table (array<float> column).

- **Brute-force cosine top-k** — the exactness baseline: one pass over all
  vectors against a broadcast query vector; dot/norms as JVM-side
  ``zip_with``/``aggregate`` folds (no UDF, no Python).
- **Threshold pair search (IVF-style)** — all near pairs *within a coarse
  partition* (``label`` plays the IVF cell id): the scale path, because the
  join key prunes the O(n²) pair space to per-cell blocks.
- **Random-hyperplane LSH bucketing** — rows-only scale variant: 16-bit
  sign signatures from deterministic md5-derived hyperplanes; candidate
  pairs share a signature band. Recall vs the exact baseline is asserted
  in tests/test_similarity.py.

Float-parity: both engines fold element products sequentially in index
order with a double accumulator — bit-identical, verified; DuckDB's
``list_cosine_similarity`` builtin computes in float32 and does NOT match,
so oracles use the explicit fold.

Scale notes: top-k against a broadcast query is a map-only scan + per-
partition heap (TakeOrderedAndProject). The pair searches shuffle once on
the cell/bucket key; cells bound memory, and skewed cells split under AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.functions.scalars import round_portable, round_portable_sql
from bigdata_project_spark.functions.text import HEX16_TO_INT_SQL, hex16_to_int
from bigdata_project_spark.sources.readers import load_table


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (index order, double accumulator)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB twins of the folds above — identical op order via list_reduce
# (no-init left fold; 0.0-init and no-init agree exactly for IEEE adds).
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in range(1, len({a}) + 1)], (x, y) -> x + y)"
    )


def _cos_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"


def query_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest neighbours of vec_id=0, brute force."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    scored = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    return (
        scored.select(
            "vec_id",
            "label",
            round_portable(cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


ORACLE_COSINE_TOPK = f"""
WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       {round_portable_sql(_cos_sql("embedding", "q_emb"), 6)} AS cos_sim
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id ASC
LIMIT 10
"""


def query_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style same-cell pair search: cosine ≥ 0.35 within each label."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cos.alias("raw_cos"),
        )
        .filter(F.col("raw_cos") >= 0.35)
        .select(
            "vec_a",
            "vec_b",
            "label",
            round_portable(F.col("raw_cos"), 6).alias("cos_sim"),
        )
    )


ORACLE_NEARDUP_PAIRS = f"""
WITH pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           {_cos_sql("a.embedding", "b.embedding")} AS raw_cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, label, {round_portable_sql("raw_cos", 6)} AS cos_sim
FROM pairs
WHERE raw_cos >= 0.35
"""

# --------------------------------------------------- LSH scale variant --

N_PLANES = 16


def _plane_sign(dim_idx: Column, plane: int) -> Column:
    """Deterministic ±1 hyperplane component from md5(plane, dim)."""
    h = F.md5(F.encode(F.concat(F.lit(f"p{plane}d"), dim_idx.cast("string")), "UTF-8"))
    return F.when(hex16_to_int(h) % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_signatures(emb: DataFrame) -> DataFrame:
    """16-bit sign signature per vector: sig bit p = (v · plane_p) > 0.

    Hyperplane components are ±1 derived from md5 — reproducible on any
    engine/cluster with no stored model."""
    sig = None
    for p in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(
                _as_double(F.col("embedding")),
                F.transform(
                    F.sequence(F.lit(0), F.size("embedding") - 1),
                    lambda i: _plane_sign(i, p),  # noqa: B023
                ),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return emb.select("vec_id", "label", "embedding", sig.cast("bigint").alias("lsh_sig"))


def query_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs sharing one of four 4-bit LSH signature bands,
    verified by exact cosine ≥ 0.35. Rows-only (the md5-derived planes are
    deliberately engine-internal); recall asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    sigs = lsh_signatures(emb)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.floor(F.col("lsh_sig") / (2 ** (4 * b))).cast("bigint").__mod__(16).alias("nib"),
            )
            for b in range(4)
        ]
    )
    melted = sigs.select("vec_id", "embedding", F.explode(bands).alias("bs")).select(
        "vec_id", "embedding", F.col("bs.band").alias("band"), F.col("bs.nib").alias("nib")
    )
    a, b = melted.alias("a"), melted.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.nib") == F.col("b.nib"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("emb_a"),
            F.col("b.embedding").alias("emb_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cos = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        cands.withColumn("cos_sim", round_portable(cos, 6))
        .filter(F.col("cos_sim") >= 0.35)
        .select("vec_a", "vec_b", "cos_sim")
    )
