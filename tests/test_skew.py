"""Salting operators preserve semantics on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_spark.operators.skew import salted_join, salted_sum_count


def _skewed(spark):
    """90% of rows share one key."""
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["sv"], r["n"])
        for r in df.groupBy("k").agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["n_rows"])
        for r in salted_sum_count(df, ["k"], {"v": "sum_v"}, n_salts=8).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"d{i}") for i in range(97)],
        "k string, label string",
    )
    plain = fact.join(dim, "k").groupBy("label").count()
    salted = salted_join(fact, dim, "k", n_salts=8).groupBy("label").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_row_entropy_layout_stable(spark):
    """With a stable row_entropy column the join output (and the salt
    assignment driving it) is identical across partition layouts."""
    fact = _skewed(spark).withColumn("rid", F.monotonically_increasing_id()).cache()
    fact.count()
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"d{i}") for i in range(97)],
        "k string, label string",
    )
    out_a = salted_join(fact, dim, "k", n_salts=8, row_entropy=F.col("rid"))
    out_b = salted_join(
        fact.repartition(7), dim, "k", n_salts=8, row_entropy=F.col("rid")
    )
    rows_a = sorted(tuple(r) for r in out_a.collect())
    rows_b = sorted(tuple(r) for r in out_b.collect())
    assert rows_a == rows_b
    plain = sorted(tuple(r) for r in fact.join(dim, "k").collect())
    assert rows_a == plain
