"""SemDeDup-style semantic deduplication over the embedding column.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster embeddings with
k-means, then search for near-duplicate pairs ONLY within each cluster
— the cluster assignment bounds the quadratic pair search to cell-sized
blocks, which is the whole reason the method works at web scale.

This implementation reuses the IVF coarse quantizer (operators/ivf.py):
seeded centroids (first K vectors — deterministic k-means init) and the
Arrow-batched BLAS assignment pass, so the cluster step has an exact
DuckDB SQL twin. Within each cell, the pair search is a per-cell Gram
matrix in float64 (same kernel as sim_neardup_pairs), rounded to 1e-6
BEFORE thresholding so BLAS-vs-sequential-fold ulp noise cannot flip a
boundary pair. A vector is a semantic duplicate when some LOWER-id
vector in its cell has rounded cosine ≥ TAU; the survivor rule
(keep-lowest-id) makes the output deterministic.

Scale design: one shuffle keys vectors by cell; each cell's pair block
is an O(cell²) BLAS matmul at memory-bandwidth speed. At 100 TB the
operator holds because k scales with corpus size (SemDeDup uses
k ≈ sqrt(N), keeping cells bounded) — k is the K_CELLS parameter here,
pinned small only for the fixture. The dup rollup shuffles candidate
PAIRS (already threshold-pruned), never embeddings; the final left join
is vec_id-keyed.

Reference parity: the reference (JoanFer030/bigdata-project) has no
embedding operators at all — beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.functions.scalars import round_portable_sql
from bigdata_project_spark.operators.ivf import K_CELLS, _assign_cells, _seed_centroids
from bigdata_project_spark.operators.similarity import _cos_sql
from bigdata_project_spark.sources.readers import load_table

SEM_TAU = 0.35


def query_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector semantic-dup verdict: cell, the lowest-id near-dup in
    the same cell (NULL if none), and the keep flag."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids, cell_ids = _seed_centroids(emb, K_CELLS)
    assigned = _assign_cells(emb, centroids, cell_ids)

    def cell_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "vec_b": pd.Series(dtype="int64"),
                    "dup_of": pd.Series(dtype="int64"),
                }
            )
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        gram = np.floor((m @ m.T) / np.outer(norms, norms) * 1e6 + 0.5) / 1e6
        # lowest-id duplicate: for column b, the first row a<b over TAU
        hits = gram >= SEM_TAU
        np.fill_diagonal(hits, False)
        ids = pdf["vec_id"].to_numpy()
        out_b, out_a = [], []
        for j in range(1, len(ids)):
            above = np.nonzero(hits[:j, j])[0]
            if len(above):
                out_b.append(ids[j])
                out_a.append(ids[above[0]])  # rows sorted → lowest vec_id
        return pd.DataFrame({"vec_b": out_b, "dup_of": out_a})

    dups = assigned.groupBy("cell").applyInPandas(
        cell_dups, schema="vec_b long, dup_of long"
    )
    return (
        assigned.select("vec_id", "cell")
        .join(dups, F.col("vec_id") == F.col("vec_b"), "left")
        .select(
            "vec_id",
            "cell",
            "dup_of",
            F.col("dup_of").isNull().alias("is_kept"),
        )
        .orderBy("vec_id")
    )


ORACLE_DEDUP_SEMANTIC = f"""
WITH c AS (
    SELECT vec_id AS cell, embedding AS cemb
    FROM embeddings WHERE vec_id < {K_CELLS}
),
assign AS (
    SELECT vec_id, cell, embedding FROM (
        SELECT e.vec_id, c.cell, e.embedding,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {round_portable_sql(_cos_sql("e.embedding", "c.cemb"), 6)} DESC,
                            c.cell ASC
               ) AS rn
        FROM embeddings e CROSS JOIN c
    ) WHERE rn = 1
),
dup AS (
    SELECT b.vec_id AS vec_b, MIN(a.vec_id) AS dup_of
    FROM assign a JOIN assign b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {round_portable_sql(_cos_sql("a.embedding", "b.embedding"), 6)} >= {SEM_TAU}
    GROUP BY b.vec_id
)
SELECT s.vec_id, s.cell, d.dup_of, d.dup_of IS NULL AS is_kept
FROM assign s LEFT JOIN dup d ON s.vec_id = d.vec_b
ORDER BY s.vec_id
"""
