"""MERGE / upsert semantics (SURVEY.md §2.1 S9).

The reference deduplicates bronze loads with DuckDB MERGE in two flavors:

- **all-column MERGE** — keys = every data column, so a matched row updates
  to itself; net effect is "insert rows not already present"
  (reference bronze/utils.py:348-366). Equivalent to dedup-union.
- **keyed MERGE** — explicit key list (``Id``/``COD``/``ID``), matched rows
  take the incoming values (bronze/utils.py:442-454, 697-711).

Without a transactional table format these are emulated as pure DataFrame
expressions; with one on the classpath the same call sites can switch to a
real ``MERGE INTO``. Availability was PROBED round 10
(tools/delta_probe.py → tools/delta_probe_result.json): neither the
delta-spark/pyiceberg python packages nor the ``delta``/``iceberg``
datasources exist in this image (DATA_SOURCE_NOT_FOUND from both the
DataFrameReader and catalog-SQL paths), so the emulation is the only
executable form here — recorded once, caveat closed.

Scale notes
-----------
- Both shapes are a single shuffle on the merge keys (hash aggregate /
  hash join) — map-side partial aggregation applies, and AQE handles skew.
- The keyed merge broadcasts nothing by default: either side may be huge.
  If the incoming batch is small relative to the base table, Catalyst/AQE
  converts the anti-join to broadcast automatically under the threshold.
- At 100 TB the rewrite cost of emulation is the real bottleneck — the
  production answer is Delta/Iceberg MERGE with file-level pruning; this
  module isolates the choice behind one function pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_all_columns(old: DataFrame, new: DataFrame) -> DataFrame:
    """All-column MERGE ≡ union + dedup on every column
    (bronze/utils.py:342-366: merge keys generated from
    information_schema.columns = all data columns)."""
    cols = old.columns
    return old.unionByName(new.select(*cols)).dropDuplicates(cols)


def merge_keyed(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Keyed MERGE: incoming rows win on key match, unmatched old rows kept
    (``WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *``,
    bronze/utils.py:442-454)."""
    cols = old.columns
    # An at-least-once upstream can repeat a key WITHIN one incoming batch;
    # without this dedup both copies would be inserted (the anti-join only
    # guards against rows already in `old`), breaking the unique-key
    # invariant. Deterministic pick: first row under the ordering of all
    # non-key columns (SQL MERGE would raise on multi-match; we resolve it
    # reproducibly instead).
    from bigdata_project_spark.operators.distinct_on import distinct_on

    # Maps are not orderable in Spark, so order them via a canonical JSON
    # serialization: entries sorted by key (keys are unique, so the
    # key-only comparator is total), then to_json. Every other type orders
    # natively — keeping duplicate-key resolution deterministic even when
    # rows differ only in a map column.
    residual: list = []
    for c, t in new.dtypes:
        if c in keys:
            continue
        if t.startswith("map"):
            residual.append(
                F.expr(
                    f"to_json(array_sort(map_entries(`{c}`), "
                    "(a, b) -> CASE WHEN a.key < b.key THEN -1 "
                    "WHEN a.key > b.key THEN 1 ELSE 0 END))"
                ).asc_nulls_last()
            )
        else:
            residual.append(F.col(c).asc_nulls_last())
    if set(new.columns) != set(cols):
        # columns differ: keep the two-step form so the in-batch dedup
        # can order by incoming-only columns before they are dropped
        deduped = distinct_on(new, keys, residual or [F.lit(1)])
        untouched = old.join(deduped.select(*keys), on=keys, how="left_anti")
        return deduped.select(*cols).unionByName(untouched)
    # r16: single-shuffle form. The two-step shape above consumed the
    # deduped batch twice (anti-join probe + union branch), so Spark
    # re-derived the batch subtree per consumer, and a fold chain
    # (plans/incremental.py) compounded that duplication multiplicatively
    # (10 scans / 27 window-family nodes in the 3-batch fold's plan).
    # Union old+new with a source tag instead and resolve everything in
    # ONE window pass over the merge keys: new rows sort first, so
    # row_number()==1 within the src=0 block is exactly distinct_on(new)
    # and any key that has a new row drops its old rows (min(src)==0) —
    # row-for-row the semantics of the anti-join form, including
    # duplicate-key old tables (all old rows of unmatched keys survive).
    # Plan: one Exchange on the keys + one sort serving both window
    # functions, versus window-exchange + anti-join exchanges + union.
    tagged = (
        new.select(*cols)
        .withColumn("__src", F.lit(0))
        .unionByName(old.select(*cols).withColumn("__src", F.lit(1)))
    )
    w_pick = Window.partitionBy(*keys).orderBy(
        F.col("__src").asc(), *(residual or [F.lit(1)])
    )
    w_key = Window.partitionBy(*keys)
    return (
        tagged.withColumn("__rn", F.row_number().over(w_pick))
        .withColumn("__min_src", F.min("__src").over(w_key))
        .filter(
            ((F.col("__src") == 0) & (F.col("__rn") == 1))
            | ((F.col("__src") == 1) & (F.col("__min_src") == 1))
        )
        .select(*cols)
    )
