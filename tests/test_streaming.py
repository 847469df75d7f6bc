"""Structured Streaming: the streaming twins must agree with batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_spark.plans.event_windows import query_tumbling_1h
from bigdata_project_spark.streaming.stateful import events_after_threshold
from bigdata_project_spark.streaming.windows import (
    dedup_within_watermark,
    enrich_stream_static,
    read_event_stream,
    run_to_memory,
    session_windows,
    tumbling_counts,
)


def test_stream_tumbling_matches_batch(spark, sf_dir):
    stream = tumbling_counts(read_event_stream(spark, sf_dir))
    run_to_memory(stream, "stream_tumbling")
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM stream_tumbling").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in query_tumbling_1h(spark, sf_dir)
        .withColumn("window_start", F.to_timestamp("window_start"))
        .collect()
    }
    assert got == want


def test_stream_session_windows_run(spark, sf_dir):
    stream = session_windows(read_event_stream(spark, sf_dir))
    run_to_memory(stream, "stream_sessions")
    rows = spark.sql("SELECT * FROM stream_sessions").collect()
    assert rows
    assert all(r["n_events"] >= 1 for r in rows)


def test_stream_dedup_within_watermark(spark, sf_dir):
    stream = dedup_within_watermark(read_event_stream(spark, sf_dir))
    q = stream.writeStream.outputMode("append").format("memory").queryName("dedup_wm").start()
    q.processAllAvailable()
    q.stop()
    from bigdata_project_spark.sources.readers import load_table

    n_distinct = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    out = spark.sql("SELECT event_id FROM dedup_wm")
    assert out.count() == n_distinct
    assert out.distinct().count() == n_distinct


def test_stream_static_join_enriches(spark, sf_dir):
    from bigdata_project_spark.sources.readers import load_table

    dim = load_table(spark, sf_dir, "customer")
    stream = enrich_stream_static(read_event_stream(spark, sf_dir), dim)
    q = stream.writeStream.outputMode("append").format("memory").queryName("enriched").start()
    q.processAllAvailable()
    q.stop()
    pdf = spark.sql("SELECT * FROM enriched").toPandas()
    ev_n = load_table(spark, sf_dir, "events").count()
    assert len(pdf) == ev_n  # left join preserves the stream
    assert pdf["segment"].notna().any()


def test_stream_upsert_sink_exactly_once(spark, sf_dir, tmp_path):
    """Duplicated input stream + keyed foreachBatch MERGE → exactly-once
    table contents."""
    from bigdata_project_spark.sources.readers import load_table
    from bigdata_project_spark.sources.sinks import drop_table
    from bigdata_project_spark.streaming.windows import upsert_sink

    table = "t_stream_upsert"
    drop_table(spark, table)
    # duplicate the source: every event arrives twice
    stream = read_event_stream(spark, sf_dir)
    doubled = stream.unionByName(stream)
    q = upsert_sink(doubled, table, keys=["event_id"], checkpoint=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        n_distinct = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
        got = spark.table(table)
        assert got.count() == n_distinct
        assert got.select("event_id").distinct().count() == n_distinct
    finally:
        drop_table(spark, table)


def test_query_stream_upsert_sink_matches_events(spark, sf_dir):
    """The registered CORRECTNESS query: a twice-staged (replayed) stream
    upserted on event_id converges to exactly the events table."""
    from bigdata_project_spark.sources.readers import load_table
    from bigdata_project_spark.streaming.windows import query_stream_upsert_sink

    out = query_stream_upsert_sink(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in ev.collect()
    )


def test_stateful_threshold_operator(spark, sf_dir):
    stream = events_after_threshold(read_event_stream(spark, sf_dir), threshold=3)
    q = stream.writeStream.outputMode("append").format("memory").queryName("after3").start()
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM after3").toPandas()
    from bigdata_project_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").groupBy("user_id").count().toPandas()
    expected_rows = int((ev["count"] - 3).clip(lower=0).sum())
    assert len(out) == expected_rows
    assert (out["seen_so_far"] > 3).all()


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    from bigdata_project_spark.sources.readers import load_table
    from bigdata_project_spark.streaming.windows import join_clicks_purchases

    stream = join_clicks_purchases(read_event_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    batch = join_clicks_purchases(load_table(spark, sf_dir, "events"))
    want = {(r["purchase_id"], r["click_id"]) for r in batch.collect()}
    assert got == want
    assert want  # fixture must actually produce matches


def test_rocksdb_state_store_provider_runs(spark, sf_dir):
    from bigdata_project_spark.streaming.windows import use_rocksdb_state_store

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state_store(spark)
    try:
        stream = dedup_within_watermark(read_event_stream(spark, sf_dir))
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_rocks")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        from bigdata_project_spark.sources.readers import load_table

        n = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
        assert spark.sql("SELECT * FROM dedup_rocks").count() == n
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stateful_transitions_match_batch(spark, sf_dir):
    """The per-user stateful transition stream aggregates to exactly the
    batch LAG-window transition counts."""
    from bigdata_project_spark.operators.funnel import query_events_transitions
    from bigdata_project_spark.streaming.stateful import transitions_stateful

    stream = transitions_stateful(read_event_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("trans_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["src_event"], r["dst_event"]): r["n"]
        for r in spark.sql(
            "SELECT src_event, dst_event, COUNT(*) AS n FROM trans_stream GROUP BY 1, 2"
        ).collect()
    }
    want = {
        (r["src_event"], r["dst_event"]): r["n"]
        for r in query_events_transitions(spark, sf_dir).collect()
    }
    assert got == want


def test_checkpoint_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-resume: a checkpointed file-source → file-sink stream,
    stopped and restarted on the SAME checkpoint, must (1) not
    reprocess the batch it already committed and (2) pick up exactly
    the files that arrived while it was down — the offset-log +
    sink-commit-log contract that makes streaming restarts exactly-once
    at any scale."""
    import shutil

    from bigdata_project_spark.streaming.windows import EVENT_SCHEMA

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")

    def run_once():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .parquet(str(src))
            .select("event_id", "event_type")
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    run_once()
    first = spark.read.parquet(str(out))
    assert first.count() == n
    assert first.select("event_id").distinct().count() == n

    # restart with nothing new: committed batch must NOT replay
    run_once()
    assert spark.read.parquet(str(out)).count() == n

    # a file arrives while "down"; restart picks up exactly that file
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
    run_once()
    final = spark.read.parquet(str(out))
    assert final.count() == 2 * n
    # every event id appears exactly twice (once per input file)
    assert (
        final.groupBy("event_id").count().filter(F.col("count") != 2).count() == 0
    )


def test_stream_hll_python_twin_matches_relational(spark):
    """The streaming worker's Python (register, rho) must equal the
    relational md5 form in operators/sketches.py for the same user ids —
    the identity the stream-vs-batch oracle convergence rests on."""
    from pyspark.sql import functions as F

    from bigdata_project_spark.functions.text import word_hash32
    from bigdata_project_spark.operators.sketches import HLL_M
    from bigdata_project_spark.streaming.stateful import _hll_rho32

    ids = list(range(0, 2000, 37)) + [2**31, 2**40 + 123]
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    rel = (
        df.select("user_id", word_hash32(F.col("user_id").cast("string")).alias("h"))
        .select(
            "user_id",
            F.expr(f"h % {HLL_M}").alias("register"),
            F.expr(f"h div {HLL_M}").alias("w"),
        )
        .select(
            "user_id",
            "register",
            F.when(F.col("w") == 0, F.lit(25))
            .otherwise(F.lit(25) - F.length(F.expr("bin(w)")))
            .alias("rho"),
        )
        .collect()
    )
    for row in rel:
        assert (row["register"], row["rho"]) == _hll_rho32(row["user_id"], HLL_M)


def test_stream_hll_matches_batch_sketch(spark, sf_dir):
    """Drained increment records max-merge to EXACTLY the batch register
    table per event type (stream == batch, engine-internally; the DuckDB
    oracle asserts the same cross-engine)."""
    from pyspark.sql import functions as F

    from bigdata_project_spark.functions.text import word_hash32
    from bigdata_project_spark.operators.sketches import HLL_M
    from bigdata_project_spark.streaming.stateful import query_stream_hll_users
    from bigdata_project_spark.sources.readers import load_table

    streamed = query_stream_hll_users(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    batch = (
        ev.select(
            "event_type", word_hash32(F.col("user_id").cast("string")).alias("h")
        )
        .select(
            "event_type",
            F.expr(f"h % {HLL_M}").alias("register"),
            F.expr(f"h div {HLL_M}").alias("w"),
        )
        .select(
            "event_type",
            "register",
            F.when(F.col("w") == 0, F.lit(25))
            .otherwise(F.lit(25) - F.length(F.expr("bin(w)")))
            .alias("rho"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            (F.lit(HLL_M) - F.countDistinct("register")).alias("n_zero_registers"),
        )
        .toPandas()
        .set_index("event_type")
    )
    got = streamed.set_index("event_type")
    assert (
        got["n_zero_registers"].sort_index()
        == batch["n_zero_registers"].sort_index()
    ).all()
