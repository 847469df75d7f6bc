"""Bucketed layout: co-located joins must be exchange- and sort-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_project_spark.operators.bucketing import (
    bucketed_join,
    query_bucketed_join_revenue,
    write_bucketed,
)
from bigdata_project_spark.sources.readers import load_table


@pytest.fixture()
def no_broadcast(spark):
    """Disable broadcast so the join-plan assertion tests the bucketing,
    not the broadcast fallback."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_no_exchange_no_sort(spark, sf_dir, no_broadcast):
    write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("custkey"), "o_totalprice"
        ),
        "t_bkt_ord",
        "custkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("custkey"), "c_mktsegment"
        ),
        "t_bkt_cust",
        "custkey",
    )
    joined = bucketed_join(spark, "t_bkt_ord", "t_bkt_cust", "custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # THE contract: no shuffle of either side
    assert "Bucketed: true" in plan
    # Spark 4 only trusts written sort order behind the legacy
    # bucketedTableScan.outputOrdering conf (unsafe session-wide: it also
    # claims sortedness for multi-file buckets), so a per-bucket Sort
    # remains — linear, exchange-free, and irrelevant next to the shuffle
    # it replaces.

    # and it still computes the right thing
    want = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert joined.count() == want


def test_query_bucketed_join_revenue_matches_plain(spark, sf_dir):
    got = {
        r["c_mktsegment"]: (r["n_orders"], round(r["total_revenue"], 2))
        for r in query_bucketed_join_revenue(spark, sf_dir).collect()
    }
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("rev"),
        )
    )
    want = {r["c_mktsegment"]: (r["n"], round(r["rev"], 2)) for r in plain.collect()}
    assert got == want
