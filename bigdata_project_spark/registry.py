"""Query registry: the single source of truth behind ``__spark_entry__``.

Each plans/operators module contributes named queries (PySpark builders)
and their DuckDB oracle SQL. The driver cross-checks every pair at sf=0.01
(row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- doubles are rounded with identical per-row arithmetic (same op order →
  identical IEEE results → identical rounding);
- aggregate sums go through DECIMAL so Spark's partition-parallel
  summation and DuckDB's sequential one are both exact;
- timestamps are emitted as formatted strings, session TZ pinned to UTC.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def _load() -> None:
    if _QUERIES:
        return
    from bigdata_project_spark.plans import (
        bronze_merge,
        holidays_json,
        silver_distances,
        silver_ine,
        silver_od,
        silver_people_day,
    )

    register("silver_od", silver_od.query, silver_od.ORACLE)
    register("silver_people_day", silver_people_day.query, silver_people_day.ORACLE)
    register("silver_zones", silver_distances.query_zones, silver_distances.ORACLE_ZONES)
    register(
        "silver_distances",
        silver_distances.query_distances,
        silver_distances.ORACLE_DISTANCES,
    )
    register(
        "bronze_merge_all_columns",
        bronze_merge.query_merge_all_columns,
        bronze_merge.ORACLE_MERGE_ALL,
    )
    register(
        "bronze_merge_keyed",
        bronze_merge.query_merge_keyed,
        bronze_merge.ORACLE_MERGE_KEYED,
    )
    register("silver_ine_empresas", silver_ine.query_ine_empresas, silver_ine.ORACLE_INE_EMPRESAS)
    register("silver_ine_renta", silver_ine.query_ine_renta, silver_ine.ORACLE_INE_RENTA)
    register("bronze_holidays_json", holidays_json.query, holidays_json.ORACLE)


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
