"""Count-min sketch heavy hitters over the corpus token stream.

The frequency question every corpus curation loop asks — "which tokens
dominate?" — answered the way it has to be answered at 100 TB: with a
MERGEABLE FIXED-SIZE sketch (Cormode & Muthukrishnan 2005), not an
exact count table. The sketch is D×W = 4×256 counters; counter updates
are sums, and sums merge, so the counters can be folded from the raw
stream (map-side combine to ≤ D·W partial cells per partition — the
oracle's construction) or from any partition-local pre-aggregation
(the registered plan folds the per-token count table, tokenizing and
shuffling the corpus exactly once) — identical sketches either way.
Estimation probes the broadcast sketch:
est(t) = min over d of cell(d, hash_d(t)) — the classic upward-biased
point estimate.

Everything is integer arithmetic on the engine-portable md5 hash
(functions/text.py), so the DuckDB oracle reproduces the sketch — and
therefore the estimates and the top-k — exactly.

Candidate enumeration (the distinct-token pass) is the one
corpus-sized aggregate; real deployments feed a candidate set (query
log, previous top-k) instead. The sketch build itself never
materializes per-token state — that is the point of CMS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.functions.text import WORD_HASH16_SQL, tokens, word_hash16
from bigdata_project_spark.sources.readers import load_table

#: sketch depth (independent hash rows) and width (counters per row)
CMS_DEPTH = 4
CMS_WIDTH = 256
TOP_K = 15


def _cell(tok, d: int):
    """Row-d counter index for a token: md5-based 16-bit hash of the
    seed-prefixed token, folded onto the sketch width."""
    return F.pmod(word_hash16(F.concat(F.lit(f"{d}:"), tok)), F.lit(CMS_WIDTH))


def _cell_sql(tok_expr: str, d: int) -> str:
    h = WORD_HASH16_SQL.format(w=f"'{d}:' || {tok_expr}")
    return f"({h}) % {CMS_WIDTH}"


def query_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))

    # One corpus pass: partition-local token pre-aggregation. Folding a
    # pre-aggregated (tok, n) table into the counters yields the SAME
    # sketch as folding the raw stream — counter updates are sums, and
    # sums merge; that mergeability is the whole CMS contract. This also
    # doubles as the candidate set, so the corpus is tokenized and
    # shuffled exactly once.
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))

    cells = counts.select(
        "tok",
        "n",
        F.posexplode(
            F.array(*[_cell(F.col("tok"), d) for d in range(CMS_DEPTH)])
        ).alias("d", "cell"),
    )
    sketch = cells.groupBy("d", "cell").agg(F.sum("n").alias("cnt"))

    est = (
        cells.join(F.broadcast(sketch), ["d", "cell"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_n"))
    )
    return est.orderBy(F.desc("est_n"), "tok").limit(TOP_K)


def _cells_union_sql(tok_expr: str) -> str:
    rows = ", ".join(f"({d}, {_cell_sql(tok_expr, d)})" for d in range(CMS_DEPTH))
    return rows


ORACLE_CMS_HEAVY_HITTERS = f"""
WITH toks AS (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
    FROM documents
),
stream_cells AS (
    SELECT u.d, u.cell
    FROM toks, LATERAL (VALUES {_cells_union_sql('tok')}) AS u(d, cell)
),
sketch AS (
    SELECT d, cell, COUNT(*) AS cnt FROM stream_cells GROUP BY d, cell
),
cand AS (SELECT DISTINCT tok FROM toks),
cand_cells AS (
    SELECT cand.tok, u.d, u.cell
    FROM cand, LATERAL (VALUES {_cells_union_sql('tok')}) AS u(d, cell)
)
SELECT c.tok, CAST(MIN(s.cnt) AS BIGINT) AS est_n
FROM cand_cells c JOIN sketch s USING (d, cell)
GROUP BY c.tok
ORDER BY est_n DESC, tok
LIMIT {TOP_K}
"""
