"""Streaming stateful operators — watermarked windows + custom state.

Two patterns the batch pipeline cannot express (SURVEY.md §2.4 streaming
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
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["windowed_event_counts", "first_seen_entities",
           "FIRST_SEEN_OUTPUT_SCHEMA"]


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
