"""Streaming stateful operators — watermarked windows + custom state.

Three patterns the batch pipeline cannot express (SURVEY.md §2.4 streaming
margin; the reference has no streaming story — its REST server processes
one file per request — so these are the Spark-native continuous forms of
its batch semantics):

* ``windowed_event_counts`` — event-time tumbling-window aggregation with
  a watermark for late data: the built-in operator path
  (``withWatermark`` + ``window()`` + ``groupBy``), fully JVM-side and
  incrementally maintained by the streaming state store.
* ``first_seen_entities`` — continuous entity canonicalization: the first
  time an entity key is observed across the whole stream it is emitted,
  later mentions are suppressed.  This is the streaming twin of the batch
  ``nodes_of`` dedupe, kept as bounded per-key state via
  ``applyInPandasWithState`` (GroupState), because the built-in
  ``dropDuplicates`` cannot attach per-key metadata (first-seen time,
  running mention count) to the emission.
* ``sessionized_events`` — gap-based sessionization with event-time
  TIMEOUTS: sessions close either from observed data (a >gap successor
  event) or from the watermark passing the open session's deadline —
  the latter has no batch analogue and is the canonical GroupState +
  ``EventTimeTimeout`` shape.

At 100 TB/day the state store is the scaling concern: both operators key
state by a high-cardinality column (window x type; entity_id), so state
partitions shard evenly across executors; the watermark bounds the window
state, and first-seen state is the entity table itself (the thing the
pipeline exists to materialize).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["windowed_event_counts", "first_seen_entities",
           "sessionized_events", "dedup_events_stream",
           "FIRST_SEEN_OUTPUT_SCHEMA", "SESSION_OUTPUT_SCHEMA"]


def dedup_events_stream(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup — the continuous twin of the batch
    ``dedup_exact`` family for at-least-once upstream delivery (a
    redelivered event carries the same event_id with the same event
    time).  Uses the built-in ``dropDuplicatesWithinWatermark``: fully
    JVM-side, and — unlike plain streaming ``dropDuplicates``, whose
    key state grows forever — its per-key state is EVICTED once the
    watermark passes the first-seen event time, so state tracks the
    lateness horizon, not all ids ever seen.  That bounded-state
    property is the whole design at 100 TB/day: ~horizon×rate keys
    sharded across executors by event_id.

    On a batch DataFrame this degrades to plain ``dropDuplicates`` on
    the same key (the test compares drained-stream vs batch output)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    return (
        events
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time windows over the events stream (R13 streaming
    form): counts + value sum per (window, event_type), tolerating
    ``watermark`` of event-time lateness before a window is finalized.

    Works identically on a batch DataFrame (window agg; the watermark is
    streaming-only and skipped there) — the test compares the two.
    """
    # event-time watermarks require TIMESTAMP (not NTZ, which parquet
    # tables often carry); cast on both batch and stream so windows align
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


FIRST_SEEN_OUTPUT_SCHEMA = StructType([
    StructField("entity_id", StringType()),
    StructField("first_subj", StringType()),
    StructField("first_ts", TimestampType()),
    StructField("n_mentions_batch", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("seen", LongType()),
])


def _first_seen_fn(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit the first observation of this entity key; afterwards only
    bump the (bounded, single-row) state counter."""
    total = 0
    first_row = None
    for pdf in pdfs:
        if len(pdf):
            # a hot key spanning several Arrow chunks delivers them in
            # unspecified order — the global min must consider EVERY
            # chunk, not just the first non-empty one
            cand = pdf.sort_values(["ts", "subj"]).iloc[0]
            if first_row is None or (
                    (cand["ts"], cand["subj"]) <
                    (first_row["ts"], first_row["subj"])):
                first_row = cand
        total += len(pdf)
    if state.exists:
        (seen,) = state.get
        state.update((seen + total,))
        return
    state.update((total,))
    if first_row is not None:
        yield pd.DataFrame({
            "entity_id": [key[0]],
            "first_subj": [first_row["subj"]],
            "first_ts": [first_row["ts"]],
            "n_mentions_batch": [total],
        })


def first_seen_entities(mentions: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """mentions(entity_id, subj, ts) stream -> first-seen emission.

    State: one row per entity_id (a counter), sharded by the grouping
    key; exactly-once across restarts via the query checkpoint.
    """
    return (
        mentions
        # parquet gives TIMESTAMP_NTZ; withWatermark requires TIMESTAMP
        # (same cast the windowed sibling does)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("entity_id")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=FIRST_SEEN_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# -- gap-based streaming sessionization ---------------------------------------
# The continuous twin of ops/relational.q_events_sessionize: per-user
# sessions close when a >30-min event-time gap is observed IN the data
# (emitted immediately) or when the watermark passes the open session's
# gap deadline (event-time TIMEOUT — the part only a stateful streaming
# operator can express: the batch op sees the whole table, the stream
# must decide "this session is over" from the watermark alone).  State
# is one 4-field row per user (epoch-microseconds as int64 — portable
# across the state store, no timestamp serialization edge cases), sharded by
# user_id; the timeout bound means state size tracks ACTIVE users, not
# all users ever seen.

SESSION_GAP_SECONDS = 1800  # == ops/relational._SESSION_GAP_US / 1e6

SESSION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_GAP_US = SESSION_GAP_SECONDS * 1_000_000


def _emit_df(user_id: int, sessions: list) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": [user_id] * len(sessions),
        "session_start": [pd.Timestamp(s, unit="us") for s, *_ in sessions],
        "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in sessions],
        "n_events": [n for *_, n, _ in sessions],
        "total_value": [round(v, 4) for *_, v in sessions],
    })


def _sessionize_fn(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    if state.hasTimedOut:
        # watermark passed the gap deadline: the open session is final
        start_us, last_us, n, tot = state.get
        state.remove()
        yield _emit_df(user_id, [(start_us, last_us, n, tot)])
        return

    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return
    batch = pd.concat(chunks, ignore_index=True).sort_values(
        ["ts", "event_id"], kind="mergesort")
    # pandas datetime64[ns] -> integer microseconds
    us = batch["ts"].astype("int64") // 1000

    if state.exists:
        start_us, last_us, n, tot = state.get
    else:
        start_us = last_us = None
        n, tot = 0, 0.0

    closed = []
    for t, v in zip(us.tolist(), batch["value"].tolist()):
        if start_us is None:
            start_us, last_us, n, tot = t, t, 1, float(v)
        elif t - last_us > _GAP_US:
            closed.append((start_us, last_us, n, tot))
            start_us, last_us, n, tot = t, t, 1, float(v)
        else:
            # a late-but-within-watermark arrival (t < last_us, possible
            # across micro-batches) merges into the open session WITHOUT
            # regressing its bounds — min/max, never overwrite (a plain
            # last_us = t would shrink the window and a later event
            # could falsely split the session vs the batch twin)
            start_us = min(start_us, t)
            last_us, n, tot = max(last_us, t), n + 1, tot + float(v)

    state.update((start_us, last_us, n, tot))
    # fire when the WATERMARK (event time, not wall clock) passes the
    # open session's gap deadline
    state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_SECONDS * 1000)
    if closed:
        yield _emit_df(user_id, closed)


def sessionized_events(events: DataFrame,
                       watermark: str = "2 hours") -> DataFrame:
    """events(ts, user_id, event_id, value, ...) stream -> CLOSED
    sessions, exactly the rows the batch sessionize op computes (the
    final still-open session per user emits once the watermark passes
    its gap deadline)."""
    return (
        events
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("ts", "user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
