"""Vector-column aggregate operators: per-label centroids in long form.

The centroid table (class mean vector) is the workhorse of embedding-
space curation — cluster pruning, label-noise detection, and the IVF
coarse quantizer's supervised cousin. Spark-first shape: ``posexplode``
the vector column → ONE combiner-friendly hash aggregate on
(label, pos) — no Python, no per-row UDF, and the long-form output
avoids array re-assembly entirely (callers that need array form pivot
the ≤ labels×dim rows driver-side; that table is tiny by construction).

Float-sum parity: partition-parallel float addition is order-dependent,
so values are portable-rounded to 6 decimals and summed as
DECIMAL(27,8) — exact, associative, identical across engines (the same
contract the pricing aggregates use).

Scale: explode inflates rows ×dim, but entirely map-side before the one
shuffle on (label, pos); partial aggregation collapses each partition to
≤ labels×dim rows before the exchange, so shuffle volume is independent
of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.functions.scalars import round_portable, round_portable_sql
from bigdata_project_spark.sources.readers import load_table

_DEC = "decimal(27,8)"


def query_emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    long = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),  # 1-based to match SQL subscripts
        round_portable(F.col("val").cast("double"), 6).alias("v6"),
    )
    return long.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        round_portable(
            F.sum(F.col("v6").cast(_DEC)).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("centroid_val"),
    )


ORACLE_EMB_LABEL_CENTROIDS = f"""
WITH long AS (
    SELECT label,
           generate_subscripts(embedding, 1) AS pos,
           {round_portable_sql("CAST(unnest(embedding) AS DOUBLE)", 6)} AS v6
    FROM embeddings
)
SELECT label, pos, COUNT(*) AS n_vectors,
       {round_portable_sql("CAST(SUM(CAST(v6 AS DECIMAL(27,8))) AS DOUBLE) / COUNT(*)", 6)} AS centroid_val
FROM long
GROUP BY label, pos
"""
