"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the arbitrary-state API the engine offers for operators that
windowed aggregation can't express: here, a per-user running counter +
first-seen dedup that emits only events beyond a per-user threshold.

Scale notes: state is partitioned by the grouping key across executors;
per-key state is a few counters (bounded), and the timeout conf reaps idle
keys. This is the pattern slot for reference-less operators like
incremental sessionization or online MinHash sketches.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("seen_so_far", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def _emit_after_threshold(threshold: int):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (count,) = state.get if state.exists else (0,)
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
            pdf = pdf.sort_values("event_id")
            # vectorized running counter: position within the sorted
            # batch, offset by the carried per-user count
            seen = count + np.arange(1, len(pdf) + 1, dtype=np.int64)
            count += len(pdf)
            mask = seen > threshold
            if mask.any():
                yield pd.DataFrame(
                    {
                        "user_id": np.int64(key[0]),
                        "event_id": pdf["event_id"].to_numpy()[mask],
                        "seen_so_far": seen[mask],
                    }
                )
        state.update((count,))

    return fn


def events_after_threshold(events: DataFrame, threshold: int = 3) -> DataFrame:
    """Emit each user's events only after their first ``threshold`` events."""
    return events.groupBy("user_id").applyInPandasWithState(
        _emit_after_threshold(threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------- Markov transitions --

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("src_event", T.StringType()),
        T.StructField("dst_event", T.StringType()),
        T.StructField("user_id", T.LongType()),
    ]
)

TRANSITION_STATE_SCHEMA = T.StructType(
    [T.StructField("last_type", T.StringType())]
)


def _emit_transitions(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    parts = [pdf for pdf in pdfs if len(pdf)]
    if parts:
        # one global (ts, event_id) sort per group-batch, then the
        # transition emission is a vectorized shift: src = dst.shift(1)
        # with the carried last_type prepended into the first slot
        pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        dst = pdf["event_type"].reset_index(drop=True)
        src = dst.shift(1)
        if last is not None:
            src.iloc[0] = last
        last = dst.iloc[-1]
        out = pd.DataFrame(
            {"src_event": src, "dst_event": dst, "user_id": np.int64(key[0])}
        )
        out = out[out["src_event"].notna()]
        if len(out):
            yield out
    state.update((last,))


def transitions_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/funnel.query_events_transitions``:
    per-user state carries only the LAST event type, and each micro-batch
    emits its (src → dst) transition records incrementally — the LAG
    window a batch engine uses is inexpressible in a stream, so this is
    exactly the applyInPandasWithState pattern slot. State is one string
    per live user, partitioned by the grouping key across executors;
    equality with the batch LAG form is asserted in
    tests/test_streaming.py."""
    return events.groupBy("user_id").applyInPandasWithState(
        _emit_transitions,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def query_stream_transitions(spark, sf_dir: str) -> DataFrame:
    """Driver-visible CORRECTNESS query for :func:`transitions_stateful`:
    run the stateful stream to completion over the events fixture, then
    aggregate the emitted transition records into the batch twin's exact
    output — (src, dst, n, P(dst|src)) — so it shares
    ``ORACLE_EVENTS_TRANSITIONS`` with the LAG-window form. A streaming
    operator with a full value-hash oracle, not just a rows-only check:
    the stream must converge to the batch answer exactly."""
    import uuid

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata_project_spark.functions.scalars import round_portable
    from bigdata_project_spark.streaming.windows import read_event_stream

    qname = f"trans_stream_{uuid.uuid4().hex[:8]}"
    from bigdata_project_spark.streaming.windows import stream_shuffle_partitions

    # 16, not the join queries' 8: the Python stateful worker benefits
    # from extra partition parallelism (measured flat 8↔16, 4× worse at
    # the session's 32 — state-store commits dominate there)
    from bigdata_project_spark.streaming.windows import drain_to_memory

    with stream_shuffle_partitions(spark, 16):
        drain_to_memory(
            transitions_stateful(read_event_stream(spark, sf_dir)), qname, "append"
        )
    rec = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    trans = rec.groupBy("src_event", "dst_event").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("src_event")
    return trans.select(
        "src_event",
        "dst_event",
        "n",
        round_portable((F.col("n") * F.lit(1.0)) / F.sum("n").over(w), 6).alias("p"),
    )


# ------------------------------------------- streaming HyperLogLog ------

HLL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("register", T.LongType()),
        T.StructField("rho", T.LongType()),
    ]
)

HLL_STATE_SCHEMA = T.StructType(
    [T.StructField("regs", T.ArrayType(T.LongType()))]
)


def _hll_rho32(uid: int, m: int) -> tuple[int, int]:
    """(register, rho) from the portable md5-derived 32-bit hash — the
    EXACT Python twin of the relational form in operators/sketches.py
    (int(hexdigest[:8], 16) IS the value hex32_to_int computes: conv
    on the Spark side since r12, the Horner fold in the DuckDB
    oracle — all three parse the same first 8 hex chars)."""
    import hashlib

    h = int(hashlib.md5(str(uid).encode("utf-8")).hexdigest()[:8], 16)
    w = h // m
    return h % m, (25 - w.bit_length()) if w else 25


def _emit_hll_increments(m: int):
    """Per-key stateful worker: maintain the m-register sketch in state;
    emit ONLY the registers a batch RAISED (the sketch-update stream —
    output ∝ sketch changes, never ∝ events; at most m·log₂ increments
    per key over any stream length). Downstream max-merge of the emitted
    increments reconstructs the exact register table, whatever the batch
    order — max associativity, the same property the batch roll-up
    leans on."""

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        regs = (
            np.asarray(state.get[0], dtype=np.int64)
            if state.exists
            else np.zeros(m, dtype=np.int64)
        )
        new = regs.copy()
        for pdf in pdfs:
            if not len(pdf):
                continue
            for uid in pd.unique(pdf["user_id"]):
                r, rho = _hll_rho32(int(uid), m)
                if rho > new[r]:
                    new[r] = rho
        changed = np.nonzero(new > regs)[0]
        if len(changed):
            yield pd.DataFrame(
                {
                    "event_type": key[0],
                    "register": changed.astype(np.int64),
                    "rho": new[changed],
                }
            )
        state.update((new.tolist(),))

    return fn


def hll_increments_stateful(events: DataFrame, m: int) -> DataFrame:
    return events.groupBy("event_type").applyInPandasWithState(
        _emit_hll_increments(m),
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def query_stream_hll_users(spark, sf_dir: str) -> DataFrame:
    """Streaming distinct-user sketch per event type — HLL registers
    maintained in ``applyInPandasWithState`` state, with the sketch-
    UPDATE stream (register increments) as the emitted records: the
    deployment shape where downstream consumers (dashboards, the batch
    lake) fold tiny increment records instead of re-reading events.

    Drained increments max-merge into exactly the batch sketch's
    register table, so the final estimates share the batch HLL's
    arithmetic (operators/sketches.py hll_finalize) and get a FULL
    value-hash oracle: the stream must converge to the batch answer
    bit-for-bit, transcendental included."""
    import uuid

    from pyspark.sql import functions as F

    from bigdata_project_spark.operators.sketches import HLL_M, hll_finalize
    from bigdata_project_spark.sources.readers import load_table
    from bigdata_project_spark.streaming.windows import (
        drain_to_memory,
        read_event_stream,
        stream_shuffle_partitions,
    )

    qname = f"hll_stream_{uuid.uuid4().hex[:8]}"
    with stream_shuffle_partitions(spark, 16):
        drain_to_memory(
            hll_increments_stateful(read_event_stream(spark, sf_dir), HLL_M),
            qname,
            "append",
        )
    inc = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    regs = inc.groupBy("event_type", "register").agg(F.max("rho").alias("rho"))
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users_exact"))
    )
    return hll_finalize(regs, exact, "event_type")
