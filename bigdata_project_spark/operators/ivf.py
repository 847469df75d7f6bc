"""IVF with a learned coarse quantizer: Lloyd's k-means over the embedding
corpus, then inverted-file ANN search probing only the nearest cells.

The iterative structure is the Spark-idiomatic one for small-k clustering:

- **assignment** is distributed — one Arrow-batched ``mapInPandas`` pass,
  each task BLAS-scoring its partition against the broadcast k×d centroid
  matrix (k·d ≈ KBs even for k=65536, d=1024 — always broadcastable);
- **update** (mean per cell) is one hash aggregate; only the k centroid
  rows ever reach the driver, so iterations are cheap and the loop count
  is fixed and small (Lloyd converges fast; IVF needs balance, not
  optimality).

Search: score the query against centroids, probe the ``nprobe`` nearest
cells, exact-rank inside them. Deliberately engine-internal (k-means has
no SQL twin) → registered rows-only; recall vs brute force is asserted in
tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.sources.readers import load_table

K_CELLS = 8
N_ITERS = 3
N_PROBE = 2


def _assign_cells(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Distributed assignment: nearest centroid by cosine, BLAS per batch."""
    C = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def batches(it):
        for pdf in it:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": (m @ C.T).argmax(axis=1).astype("int32"),
                }
            )

    return emb.mapInPandas(
        batches, schema="vec_id long, embedding array<float>, cell int"
    )


def train_kmeans(emb: DataFrame, k: int = K_CELLS, iters: int = N_ITERS) -> np.ndarray:
    """Lloyd's iterations; deterministic init from the first k vec_ids.

    One Spark job per iteration: assignment fuses into the same stage as
    the per-cell vector mean (``applyInPandas`` after the one shuffle on
    ``cell``). The caller passes a cached (vec_id, embedding) projection —
    iteration re-reads hit memory, not parquet."""
    init = (
        emb.filter(F.col("vec_id") < k)
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
    )
    centroids = np.stack(init.to_numpy()).astype(np.float64)

    def cell_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"cell": pdf["cell"].iloc[:1], "centroid": [m.mean(axis=0).tolist()]}
        )

    for _ in range(iters):
        means = (
            _assign_cells(emb, centroids)
            .groupBy("cell")
            .applyInPandas(cell_mean, schema="cell int, centroid array<double>")
            .toPandas()
        )
        for _, row in means.iterrows():
            centroids[int(row["cell"])] = np.asarray(row["centroid"], dtype=np.float64)
    return centroids


def query_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbours of vec_id=0 probing N_PROBE of K_CELLS learned
    cells — the scale ANN path (scores ~nprobe/k of the corpus)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    centroids = train_kmeans(emb)
    assigned = _assign_cells(emb, centroids)

    q = emb.filter(F.col("vec_id") == 0).toPandas()["embedding"][0]
    qv = np.asarray(q, dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    C = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probe = [int(c) for c in (C @ qv).argsort()[::-1][:N_PROBE]]

    cands = assigned.filter(F.col("cell").isin(probe) & (F.col("vec_id") != 0))

    def score(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            cos = m @ qv
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": pdf["cell"],
                    "cos_sim": np.floor(cos * 1e6 + 0.5) / 1e6,
                }
            )

    scored = cands.mapInPandas(score, schema="vec_id long, cell int, cos_sim double")
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(10)
