"""Deterministic DISTINCT ON (SURVEY.md §2.4 A2).

The reference keeps one row per key with DuckDB ``SELECT DISTINCT ON (COD)``
and *no* ORDER BY — a nondeterministic pick (silver/ine/ine_empresas.py:31,
ine_poblacion.py:31, ine_renta.py:40). For a reproducible engine (and an
oracle-comparable one) the pick must be pinned: we take the first row per
key under an explicit ordering.

Scale note: ``row_number`` over (partitionBy keys, orderBy tiebreakers) is
one shuffle on the keys; Catalyst pushes a partial top-1 per partition
(WindowGroupLimit) before the shuffle, so the exchange carries at most one
candidate row per key per input partition — this survives arbitrary scale
and skew far better than ``groupBy().agg(first(...))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distinct_on(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Keep exactly one row per ``keys`` group, the first under ``order_by``."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
