"""Small-file compaction: rewrite a parquet directory into ~target-size files.

The operational reality of every streaming/incremental sink (the
foreachBatch upsert in streaming/windows.py, micro-batch appends, the
reference's per-day bronze loads): thousands of KB-scale files whose
open/footer overhead eventually dominates scan time and whose listing
breaks driver memory. The standing fix is a periodic compaction pass —
what Delta/Iceberg expose as OPTIMIZE / rewrite_data_files — which is,
Spark-first, just: read, `coalesce(ceil(bytes / target))`, write.

`coalesce` (not `repartition`): compaction reduces file count, so the
narrow dependency suffices — no shuffle, each output task concatenates a
set of input files. Use `repartition` only when the input is skewed
enough that merged files would be lopsided (it buys balance with a full
shuffle of the data).

File sizes come from `df.inputFiles()` + local stat here; on a cluster
the same listing arrives from the FileIndex/object-store listing (or the
table format's manifest) without touching data.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024


def plan_compaction(df: DataFrame, target_bytes: int = TARGET_FILE_BYTES) -> int:
    """Number of output files: ceil(total input bytes / target), min 1."""
    total = 0
    for f in df.inputFiles():
        p = urlparse(f).path
        try:
            total += os.path.getsize(p)
        except OSError:
            continue
    return max(1, math.ceil(total / target_bytes))


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite ``src_path`` into ``dst_path`` as ~target-size files;
    returns the output file count. Row content is preserved exactly
    (asserted in tests/test_compaction.py)."""
    df = spark.read.parquet(src_path)
    n_out = plan_compaction(df, target_bytes)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst_path)
    return n_out
