"""bigdata_project_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing surface of the reference
mobility-analytics lakehouse (JoanFer030/bigdata-project, surveyed in
/root/repo/SURVEY.md) as idiomatic Spark DataFrame/SQL pipelines, and
extends it with the operators a large-scale training-data pipeline
needs (dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    : SparkSession factory (UTC, AQE, Arrow, sane shuffle).
- ``sources``    : readers (all-string CSV, JSON, parquet + audit cols) and
                   table sinks (create/replace/append/merge).
- ``operators``  : relational building blocks that Spark does not ship as a
                   single call (MERGE emulation, deterministic DISTINCT ON,
                   conformed union), plus the scale-out dedup/similarity ops.
- ``functions``  : scalar expression helpers (haversine, epoch-ms dates,
                   split_part, tri-state booleans, text statistics, vector
                   math) — all built on pyspark.sql.functions, JVM-side.
- ``plans``      : the reference's silver-layer transforms re-expressed over
                   the driver's synthetic tables.
- ``streaming``  : Structured Streaming variants of the event-window ops.
- ``multimodal`` : binary-column plumbing with stubbed codecs.
"""

__version__ = "0.1.0"
