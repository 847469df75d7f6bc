"""Physical-plan shape assertions — the scale contract.

Correctness says what a query returns; these tests pin HOW Spark will
execute it, so a refactor can't silently regress the 100 TB story:
dimension joins stay broadcast, aggregates keep map-side partials,
top-k stays heap-based, rank-limits push into the shuffle, and nothing
ever plans a cartesian product.
"""

from __future__ import annotations

import pytest

from bigdata_project_spark import registry


def _plan(spark, sf_dir, name: str) -> str:
    df = registry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# deliberate tiny-side cross joins (1-row broadcast query vector)
_CROSS_JOIN_OK = {"sim_cosine_topk"}


def test_no_cartesian_products_anywhere(spark, sf_dir):
    for name in registry.queries():
        plan = _plan(spark, sf_dir, name)
        if name in _CROSS_JOIN_OK:
            continue
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a BNLJ"


def test_dimension_joins_broadcast(spark, sf_dir):
    for name in ["silver_od", "silver_ine_empresas", "silver_ine_poblacion", "join_semi_anti"]:
        assert "BroadcastHashJoin" in _plan(spark, sf_dir, name), name


def test_aggregates_have_map_side_partials(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_pricing_summary")
    assert "HashAggregate" in plan
    # partial + final pair around the exchange
    assert plan.count("HashAggregate") >= 2


def test_global_topk_is_heap_not_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_top_customers")
    assert "TakeOrderedAndProject" in plan


def test_grouped_topk_pushes_rank_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "win_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_parquet_scans_prune_columns(spark, sf_dir):
    """Column pruning reaches the scan: the pricing summary reads 7 of
    lineitem's 16 columns, never the full row."""
    plan = _plan(spark, sf_dir, "agg_pricing_summary")
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, "no parquet scan with ReadSchema found"
    schema = scan[0].split("ReadSchema:")[1]
    assert "l_comment" not in schema and "l_shipdate" not in schema
    assert "l_extendedprice" in schema


def test_predicate_pushdown_reaches_scan(spark, sf_dir):
    """dedup_exact's doc_id<50 planted-dup filter is pushed into the
    parquet reader (PushedFilters), not applied post-scan."""
    plan = _plan(spark, sf_dir, "dedup_exact")
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,50)]" in plan or (
        "PushedFilters" in plan and "LessThan(doc_id,50)" in plan
    ), plan[:2000]
