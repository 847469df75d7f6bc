"""Z-order (Morton-curve) multi-dimensional clustering.

Range-partitioning on ONE key gives perfect file-level min/max pruning on
that key and none on any other. Interleaving the bits of two keys into a
Morton z-value and range-partitioning on THAT bounds every file's extent
in BOTH dimensions — the published layout trick (Morton 1966; used by
Delta/Iceberg OPTIMIZE ZORDER) that turns parquet footer min/max stats
into 2-D data skipping. Beyond-reference surface: the reference never
controls physical layout (DuckLake writes whatever order arrives,
SURVEY §4).

Spark-first mechanics:
- the z-value is a pure codegen integer expression (no UDF);
- ``write_zordered`` = repartitionByRange(z) + sortWithinPartitions(z) →
  parquet: each output file covers one contiguous z-range, so its
  min/max footer stats are tight in both source dims;
- at 100 TB this is one range-exchange (sampled boundaries, skew-proof)
  + local sort — the same cost as any clustered write, no extra pass.

The registered query computes per-z-range-bucket extents of both dims —
the measurable clustering quality a reader's pruning would see — and is
oracle-checked (ntile over a unique total order is deterministic).
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_project_spark.sources.readers import load_table

Z_BITS = 16  # per dimension → 32-bit z-value; exact in BIGINT arithmetic
N_BUCKETS = 32


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    z = Σⱼ bitⱼ(x)·4ʲ + 2·bitⱼ(y)·4ʲ. floor-div/mod arithmetic (not
    engine bit-ops) so the DuckDB twin is textually identical."""
    z: Column | None = None
    for j in range(bits):
        bx = F.floor(x / (2**j)) % 2
        by = F.floor(y / (2**j)) % 2
        term = (bx * (2 ** (2 * j)) + by * (2 ** (2 * j + 1))).cast("bigint")
        z = term if z is None else z + term
    return z


def _zvalue_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    terms = []
    for j in range(bits):
        terms.append(
            f"(CAST(floor({x} / {2**j}) AS BIGINT) % 2) * {2 ** (2 * j)}"
            f" + (CAST(floor({y} / {2**j}) AS BIGINT) % 2) * {2 ** (2 * j + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


def scaled(col: Column, lo: int, hi: int, bits: int = Z_BITS) -> Column:
    """Min/max-scale an integer column onto [0, 2^bits): raw-bit
    interleave degenerates when one dim's domain is much narrower than
    the other's (its high bits are constant zero and stop participating
    in the ordering), so — like Delta's OPTIMIZE ZORDER, which
    interleaves range-partition ids — we interleave *scaled* positions.
    (v-lo)*65535 stays ≤ ~2^53, so the double division is exact-rounded
    identically on both engines."""
    span = max(hi - lo, 1)
    return F.floor((col - F.lit(lo)) * ((2**bits) - 1) / F.lit(span)).cast("bigint")


def _scaled_sql(col: str, lo: str, hi: str, bits: int = Z_BITS) -> str:
    return (
        f"CAST(floor(({col} - {lo}) * {(2**bits) - 1} * 1.0"
        f" / greatest({hi} - {lo}, 1)) AS BIGINT)"
    )


def write_zordered(
    df: DataFrame, xcol: str, ycol: str, path: str, n_files: int = N_BUCKETS
) -> None:
    """Clustered parquet write: files cover contiguous z-ranges, tight in
    both ``xcol`` and ``ycol`` — parquet min/max footers then skip files
    for selective predicates on either column. One extra tiny aggregate
    computes the per-column ranges for scaling (at 100 TB: a footer-stats
    read or a sample, not a full scan)."""
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(xcol), F.max(xcol), F.min(ycol), F.max(ycol)
    ).first()
    z = zvalue(
        scaled(F.col(xcol), lo_x, hi_x), scaled(F.col(ycol), lo_y, hi_y)
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


# perf-only cache bookkeeping for persist_projection=True — see the
# lifecycle note inside distributed_ntile; guarded for concurrent builders
_CACHE_LOCK = threading.Lock()
_PREV_CACHES: list[DataFrame] = []


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list[str],
    n_parts: int = 32,
    lead_range: tuple[int, int] | None = None,
    persist_projection: bool = False,
) -> DataFrame:
    """``ntile(n_buckets) OVER (ORDER BY order_cols)`` without the global
    single-task window.

    Classic distributed ranking, the same boundary idea
    ``repartitionByRange`` uses, made branch-deterministic: the
    range-partition id is a *pure function of the row*. When the
    leading column's domain is known statically (``lead_range`` —
    z-values always are: [0, 4^bits)), the id is one integer division;
    otherwise sampled cut points are collected ONCE driver-side
    (``approxQuantile``). A per-range ``row_number`` window
    (partitioned — parallel) plus a broadcast join against the tiny
    per-range offset table turns local row numbers into exact global
    ranks. Every window here runs over either a partition-local frame
    or the ≤``n_parts``-row count table (the one deliberately
    unpartitioned window in the repo — its input is bounded by
    construction, never data-sized) — no
    ``WindowExec: No Partition Defined`` path on any data-sized
    relation.

    The whole computation is ONE lazy plan (r6 advice): per-range
    counts, exclusive-cumsum offsets, the global row total, and the
    ntile quotient/remainder are all columns of the broadcast side —
    no driver collect sits between a counts pass and a rank pass, so
    there is no cross-job consistency window at all. Re-evaluating the
    source subtree inside the single plan is deterministic (pure
    row-functions over a file listing pinned at plan time), so cache
    eviction can only ever cost recomputation, never correctness.

    Bucket assignment replays SQL ntile's exact semantics (first
    ``n mod N`` buckets one row larger), so results — and the oracle —
    are identical to the serial window form. Requires the order key to
    be unique overall (true here: it ends in the lineitem primary key);
    ties on the *leading* column are fine because equal leading values
    always land in the same range (uniform-width ranges only skew
    parallelism under data skew, never correctness).

    ``persist_projection`` — the cache lifecycle is now a per-caller
    knob, measured both ways in round 12 (both IN THE BENCH CONTEXT,
    the 169-query session that decides — standalone probe sessions
    mislead here, see below):

    - **False (default)**: no persist. The counts subtree and the rank
      subtree re-evaluate the projection — for a CHEAP projection that
      beats one columnar-cache write + read-back + the eager
      materialization job the cached variant needs to stop AQE's
      concurrent build/probe stages from racing a cold cache.
      feature_binning_equidepth (3 plain columns): 2.36 → 1.87 s in
      the r12b bench column.
    - **True**: evict-then-persist-then-eager-count, for projections
      whose re-evaluation is NOT cheap. layout_zorder_extents' 64-term
      Morton expression measured 1.28 s no-persist in a quiet probe
      session but **11.6 s in the r12b bench session** — the r5-era
      cliff where the fused scan→project→exchange stage's generated
      method grows past the JIT compile limit and the giant expression
      runs interpreted, per evaluation. The cache confines that risk
      to ONE evaluation. Eviction order matters: CacheManager keys by
      logical plan, and consecutive calls build IDENTICAL plans —
      persist-then-evict would no-op the persist and then remove the
      previous entry, leaving nothing (measured 2.5 → 13 s in r5).

    Correctness never depends on the cache — the whole computation is
    ONE lazy plan over deterministic row-functions (see above), so the
    knob is purely physical."""
    if persist_projection:
        from pyspark import StorageLevel

        with _CACHE_LOCK:
            while _PREV_CACHES:
                _PREV_CACHES.pop().unpersist(blocking=False)
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            _PREV_CACHES.append(df)
    lead = order_cols[0]
    if lead_range is not None:
        lo, hi = lead_range
        span = max(hi - lo + 1, 1)
        pid: Column = F.expr(f"CAST((({lead} - {lo}) * {n_parts}) div {span} AS INT)")
        if persist_projection:
            # eager warm-up: AQE submits the broadcast-build and
            # probe-map stages concurrently; on a cold cache they race
            # and each re-evaluates the projection — one cheap count
            # materializes it for both. The quantile branch needs no
            # extra job (approxQuantile materializes the cache).
            df.count()
    else:
        probs = [i / n_parts for i in range(1, n_parts)]
        cuts = sorted(set(df.stat.approxQuantile(lead, probs, 0.001)))
        pid = F.lit(0)
        for c in cuts:
            pid = pid + (F.col(lead) > F.lit(c)).cast("int")
    keyed = df.withColumn("__pid", pid)
    # per-range counts → exclusive cumsum + global total, all in-plan:
    # both windows run over the ≤n_parts-row count table
    counts = keyed.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stats = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_cum), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_all).alias("__n"),
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = keyed.join(F.broadcast(stats), "__pid").withColumn(
        "__rank", F.row_number().over(w_local) + F.col("__off")
    )
    # SQL ntile over n rows: q = n div N, rem = n mod N; the first rem
    # buckets hold q+1 rows, the rest q. greatest(q,1) guards q=0 (then
    # rem=n and every rank falls in the first branch). All quotients use
    # integer `div`, not floor(/): double division is exact only below
    # 2^53 rows, and this must hold at any row count.
    ranked = ranked.withColumn(
        "__q", F.expr(f"__n div {n_buckets}")
    ).withColumn("__rem", F.col("__n") % n_buckets)
    big = F.col("__rem") * (F.col("__q") + 1)  # rows in q+1-sized buckets
    bucket = F.when(
        F.col("__rank") <= big,
        F.expr("(__rank - 1) div (__q + 1)") + 1,
    ).otherwise(
        F.col("__rem")
        + F.expr("(__rank - 1 - __rem * (__q + 1)) div greatest(__q, 1L)")
        + 1
    )
    return ranked.withColumn("bucket", bucket.cast("int")).drop(
        "__pid", "__rank", "__off", "__n", "__q", "__rem"
    )


def query_zorder_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering quality of the z-order layout: bucket lineitem into
    N_BUCKETS contiguous z-ranges (what repartitionByRange produces) and
    report each bucket's row count and min/max extent in BOTH dims.
    Tight extents in both columns = 2-D pruning works.

    Bucketing runs through :func:`distributed_ntile` — exact SQL-ntile
    semantics with no global window, so the plan scales like any range
    exchange while the oracle keeps its plain ``ntile``."""
    li = load_table(spark, sf_dir, "lineitem")
    lo_x, hi_x, lo_y, hi_y = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    x = scaled(F.col("l_partkey"), lo_x, hi_x)
    y = scaled(F.col("l_suppkey"), lo_y, hi_y)
    zed = (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .withColumn("z", zvalue(x, y))
    )
    return (
        distributed_ntile(
            zed,
            N_BUCKETS,
            ["z", "l_orderkey", "l_linenumber"],
            lead_range=(0, 4**Z_BITS - 1),
            # the 64-term Morton projection MUST be evaluated once —
            # recomputation hit the JIT-size cliff (11.6 s) in the r12b
            # bench; see the distributed_ntile lifecycle note
            persist_projection=True,
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
            F.min("l_suppkey").alias("min_suppkey"),
            F.max("l_suppkey").alias("max_suppkey"),
        )
    )


ORACLE_ZORDER_EXTENTS = f"""
WITH r AS (
    SELECT MIN(l_partkey) AS lo_x, MAX(l_partkey) AS hi_x,
           MIN(l_suppkey) AS lo_y, MAX(l_suppkey) AS hi_y
    FROM lineitem
),
z AS (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           {_zvalue_sql(_scaled_sql("l_partkey", "lo_x", "hi_x"), _scaled_sql("l_suppkey", "lo_y", "hi_y"))} AS z
    FROM lineitem, r
),
b AS (
    SELECT *, ntile({N_BUCKETS}) OVER (ORDER BY z, l_orderkey, l_linenumber) AS bucket
    FROM z
)
SELECT bucket, COUNT(*) AS n_rows,
       MIN(l_partkey) AS min_partkey, MAX(l_partkey) AS max_partkey,
       MIN(l_suppkey) AS min_suppkey, MAX(l_suppkey) AS max_suppkey
FROM b
GROUP BY bucket
"""
