"""Structured Streaming forms of the event-window operators.

The batch forms live in plans/event_windows.py and share the same
``F.window``/aggregation expressions — this module only swaps the source
(``readStream``) and adds watermarks, which is exactly Spark's
batch/streaming unification contract.

The reference has no streaming (SURVEY.md §2.10); this is the additive
scale path: at 100 TB/day the bronze ingest becomes a file-arrival stream
with these exact queries, watermark-bounded state, and checkpointed
exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long (see sources.readers)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


from contextlib import contextmanager


def ephemeral_checkpoint_dir(prefix: str = "stream_ckpt_") -> str:
    """Checkpoint dir for a DRAINED verification query — one that runs to
    completion in-process and is never resumed. Durability buys nothing
    for these (the dir is deleted with the query), so prefer tmpfs
    (``/dev/shm``) over disk: the micro-batch commit protocol is many
    small file creates+renames per batch, and tmpfs shaves ~0.2-0.3 s
    per drained stream. Production streams that must survive a restart
    pass a real, durable ``checkpointLocation`` instead — this helper is
    only for run-to-completion checks (the kill-and-resume test uses a
    durable dir on purpose)."""
    import os
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


@contextmanager
def stream_shuffle_partitions(spark: SparkSession, n: int = 8):
    """Scope a smaller ``spark.sql.shuffle.partitions`` around a drained
    streaming query. Stateful streaming cost is dominated by state-store
    instances — one per shuffle partition per stateful operator per
    micro-batch (checkpoint + commit each) — so partitions must be sized
    to stream volume, not to the batch session's core count: the fixture
    stream is a few MB, where 32 partitions spend 5× longer committing
    state than joining (measured 11.9 s → 2.2 s at 8). At 100 TB/day the
    same knob goes UP (state sharding), set once at stream start —
    partitions are pinned by the checkpoint from the first run either
    way, which is why this is a deliberate per-stream setting and not
    the session default."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one file = one micro-batch
    in tests; a directory of arriving files in production)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # The long-typed scan yields epoch integers whose unit depends on how
    # the fixture was generated (TIMESTAMP(NANOS) → ns via nanosAsLong;
    # TIMESTAMP(MICROS) → µs directly). Prefer the parquet footer's
    # logical type — one metadata read per table, same as the batch
    # reader — and keep the magnitude heuristic (ns > 1e17 for any
    # modern date, µs < 1e17 until year ~5138) only as the fallback for
    # footers without a timestamp type. Getting this wrong compresses
    # event time 1000× and silently floods interval joins — caught by
    # the stream-vs-batch equality tests.
    from bigdata_project_spark.sources.readers import _parquet_ts_unit

    unit = _parquet_ts_unit(f"{sf_dir}/events.parquet", "ts")
    if unit == "ns":
        us = F.expr("ts div 1000")
    elif unit == "us":
        us = F.col("ts")
    else:
        us = F.when(
            F.col("ts") > F.lit(100_000_000_000_000_000), F.expr("ts div 1000")
        ).otherwise(F.col("ts"))
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    return raw.withColumn("ts", F.timestamp_micros(us))


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregate; append-mode safe."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (``session_window``) — the streaming twin of
    the batch gaps-and-islands sessionizer (plans/event_windows.py)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once dedup on event_id — the streaming twin of
    the reference's idempotent MERGE re-ingest (bronze/utils.py:348-366):
    replayed rows inside the watermark horizon are dropped, and state is
    bounded by the watermark instead of growing with the stream.
    ``dropDuplicatesWithinWatermark`` keys state on (event_id) only for
    the watermark window — the 100 TB-safe form of streaming dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream_static(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast join: per-micro-batch hash join against the
    (re-read) static dimension — the streaming form of the silver dim
    enrichments (J2). No state, no shuffle of the stream side."""
    return events.join(F.broadcast(dim), events.user_id == dim.c_custkey, "left").select(
        "event_id", "ts", "user_id", "event_type", "value", dim.c_mktsegment.alias("segment")
    )


def join_clicks_purchases(events: DataFrame, horizon: str = "30 minutes") -> DataFrame:
    """Watermarked stream-stream interval join: each purchase matched to
    the same user's clicks within the preceding ``horizon``.

    The time-bound condition + watermarks on BOTH sides is what makes
    this run with bounded state at scale: Spark keeps only clicks newer
    than (watermark - horizon) in the join state store and evicts the
    rest — without the interval bound, stream-stream inner join state
    grows forever. Batch twin: the same join on the static frame
    (asserted equal in tests/test_streaming.py)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


def use_rocksdb_state_store(spark: SparkSession) -> None:
    """Swap the in-memory (HDFS-backed) state store for RocksDB — the
    production setting for large streaming state (dedup sets, join
    buffers, session windows): state lives on executor-local disk with
    changelog checkpointing instead of in JVM heap, so state size is
    bounded by disk, not memory. Bundled with Spark since 3.2 — a pure
    config flip, no extra jars."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def upsert_sink(stream_df: DataFrame, table: str, keys: list[str], checkpoint: str):
    """Streaming upsert: foreachBatch MERGE into a catalog table — the
    streaming form of the reference's idempotent bronze MERGE re-ingest
    (bronze/utils.py:348-366). Each micro-batch is merged keyed, so
    replayed batches (at-least-once sources, restarts from the
    checkpoint) converge to exactly-once table contents.

    Returns the started StreamingQuery; caller manages lifecycle."""
    from bigdata_project_spark.operators.merge import merge_keyed
    from bigdata_project_spark.sources.sinks import replace_table

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if spark.catalog.tableExists(table):
            # read current state BEFORE overwriting; cache to break lineage
            old = spark.table(table).localCheckpoint(eager=True)
            merged = merge_keyed(old, batch_df, keys)
        else:
            merged = batch_df.dropDuplicates(keys)
        replace_table(merged, table)

    return (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(merge_batch)
        .start()
    )


def query_stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible CORRECTNESS query for :func:`upsert_sink`: stage the
    events file TWICE in a stream directory, process one file per
    micro-batch, and foreachBatch-MERGE each batch into a catalog table
    keyed on ``event_id``. Batch 0 creates the table; batch 1 is a full
    at-least-once replay that must leave it unchanged — so the final table
    equals the deduped events set regardless of batch order, and the
    oracle is a plain SELECT over ``events`` (event_id is unique in the
    fixture; the merge path, not the fixture, enforces that invariant).

    This is the streaming twin of the reference's idempotent bronze MERGE
    re-ingest (bronze/utils.py:348-366). ``ts`` stays out of the output:
    replay-convergence is about row identity, pinned by the unique key +
    value columns."""
    import shutil
    import tempfile

    from bigdata_project_spark.sources.sinks import drop_table_and_orphan_location

    src = tempfile.mkdtemp(prefix="stream_upsert_src_")
    ckpt = ephemeral_checkpoint_dir("stream_upsert_ckpt_")
    table = "stream_upsert_sink_tbl"
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/batch0.parquet")
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/batch1.parquet")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select("event_id", "user_id", "event_type", "value")
        )
        drop_table_and_orphan_location(spark, table)
        with stream_shuffle_partitions(spark):
            q = upsert_sink(stream, table, ["event_id"], ckpt)
            q.processAllAvailable()
            q.stop()
        # materialize before dropping the backing table
        return spark.table(table).localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


ORACLE_STREAM_UPSERT = """
SELECT event_id, user_id, event_type, value FROM events
"""


def query_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible CORRECTNESS query for :func:`join_clicks_purchases`:
    run the watermarked stream-stream interval join to completion over
    the events fixture and emit the batch twin's exact output columns,
    sharing ``plans.event_windows.ORACLE_INTERVAL_JOIN_CLICKS``. An
    inner interval join emits matches as both sides arrive, so draining
    the stream converges to the batch join exactly — the full value-hash
    oracle holds, not just a rows-only check."""
    import uuid

    qname = f"ssj_{uuid.uuid4().hex[:8]}"
    with stream_shuffle_partitions(spark):
        joined = join_clicks_purchases(read_event_stream(spark, sf_dir))
        drain_to_memory(joined, qname, "append")
    rec = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return rec.select(
        "user_id",
        "purchase_id",
        "click_id",
        F.date_format("purchase_ts", fmt).alias("purchase_ts"),
        F.date_format("click_ts", fmt).alias("click_ts"),
    )


def query_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible CORRECTNESS query for :func:`tumbling_counts`: the
    canonical watermarked tumbling-window aggregate, drained in complete
    mode so the final table covers every window (append would hold back
    the trailing watermark hour) and shares the batch twin's oracle
    (``plans.event_windows.ORACLE_TUMBLING_1H``) value-exactly."""
    import uuid

    qname = f"tumb_{uuid.uuid4().hex[:8]}"
    ev = read_event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    with stream_shuffle_partitions(spark):
        drain_to_memory(agg, qname, "complete")
    rec = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    return rec.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def query_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible CORRECTNESS query for :func:`session_windows`:
    drain the watermarked native-session-window stream and emit one row
    per closed session with its value rollup. The oracle is the batch
    gaps-and-islands sessionizer (plans/event_windows.py) minus its
    session_seq ordinal — merge semantics agree except for gaps of
    EXACTLY the 30-minute threshold (session_window merges `< gap`,
    the batch flag starts new on `> gap`), which cannot occur on the
    micro-timestamped fixture; an exact tie would surface here as a
    driver-row failure, not silently."""
    import uuid

    qname = f"sess_{uuid.uuid4().hex[:8]}"
    ev = read_event_stream(spark, sf_dir)
    sess = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("session_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    # complete mode: append would hold back every session inside the
    # final watermark horizon (the last hour of the fixture) — complete
    # emits the full merged session state each trigger, so the drained
    # table is the whole answer
    with stream_shuffle_partitions(spark):
        drain_to_memory(sess, qname, "complete")
    rec = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return rec.select(
        "user_id",
        F.date_format("first_ts", fmt).alias("session_start"),
        F.date_format("last_ts", fmt).alias("session_end"),
        "n_events",
        "session_value",
    )


ORACLE_STREAM_SESSIONIZE = """
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
with_id AS (
    SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM with_id
GROUP BY user_id, session_seq
"""


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain all available input synchronously into a memory sink table."""
    drain_to_memory(stream_df, name, "complete" if stream_df.isStreaming else "append")


def drain_to_memory(stream_df: DataFrame, name: str, mode: str) -> None:
    """Start → processAllAvailable → stop into a memory-sink table, with
    an ephemeral tmpfs checkpoint (see :func:`ephemeral_checkpoint_dir`)
    that is removed once the drain completes."""
    import shutil

    ckpt = ephemeral_checkpoint_dir()
    q = (
        stream_df.writeStream.outputMode(mode)
        .option("checkpointLocation", ckpt)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)


def query_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible CORRECTNESS query for watermarked streaming dedup:
    every event arrives TWICE (map-side duplication of the stream) and
    ``dropDuplicatesWithinWatermark`` on the event key must restore
    exactly-once — the drained output's per-type rollup equals the
    plain batch rollup of the events table.

    ``dropDuplicatesWithinWatermark`` (not plain dropDuplicates) is the
    production form: state for a key is evicted once the watermark
    passes it, so state size is bounded by the watermark horizon ×
    arrival rate instead of growing with the stream's lifetime key
    count — the only dedup that survives an unbounded stream. The
    duplicates here arrive inside one watermark window, the case the
    operator guarantees; the rollup aggregate runs batch-side on the
    drained sink (chaining a second stateful aggregate behind dedup in
    one streaming query is deliberately avoided — multi-stateful
    chaining restrictions are version-sensitive, and the contract under
    test is the dedup, not the chain)."""
    import uuid

    qname = f"dedup_{uuid.uuid4().hex[:8]}"
    ev = read_event_stream(spark, sf_dir)
    doubled = ev.withColumn(
        "__copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("__copy")
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    with stream_shuffle_partitions(spark):
        drain_to_memory(deduped, qname, "append")
    rec = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    return (
        rec.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_id").alias("n_unique"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


ORACLE_STREAM_DEDUP = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_id) AS n_unique,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def query_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the Structured Streaming feature
    every event pipeline leans on (micro-batch events joined to a slowly
    changing dimension without any stream state): the event stream inner-
    joins the STATIC customer table on user_id, broadcast-hinted so each
    micro-batch is a map-side hash join, then rolls up per nation.

    Stream-static inner joins are stateless by definition (the static
    side is re-planned per micro-batch; no watermark, no state store) —
    which is why this is the right shape for dimension enrichment at any
    scale, and why the drained result must equal the batch join exactly."""
    import uuid

    from bigdata_project_spark.sources.readers import load_table

    qname = f"enrich_{uuid.uuid4().hex[:8]}"
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_nationkey")
    )
    enriched = (
        read_event_stream(spark, sf_dir)
        .join(
            F.broadcast(customers),
            F.col("user_id") == F.col("c_custkey"),
            "inner",
        )
        # prune before the sink: the memory sink materializes every
        # drained row, so carrying the full event+customer width through
        # it measured ~2x the whole query (r9c 3.97 s -> see commit A/B)
        .select("user_id", "c_nationkey")
    )
    with stream_shuffle_partitions(spark):
        drain_to_memory(enriched, qname, "append")
    rec = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    return rec.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


ORACLE_STREAM_STATIC_ENRICH = """
SELECT c.c_nationkey,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_nationkey
"""
