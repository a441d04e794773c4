"""Structured Streaming ingest: stream output == batch output, and new
file drops are picked up incrementally with exactly-once progress."""

from pyspark.sql import functions as F

from kgmwcp import fixtures
from kgmwcp.pipeline import Pipeline, PipelineConfig
from kgmwcp.streaming.ingest import run_available_now


def _triples_set(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    config = PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"})

    corpus1 = fixtures.corpus_df(spark, replication=1, hot_rows=2)
    corpus1.write.mode("append").parquet(src)

    tables = run_available_now(spark, src, out, config)
    expected1 = _triples_set(Pipeline(config).run(corpus1)["triples"])
    assert _triples_set(tables["triples"]) == expected1

    # drop more files; availableNow drains only the new ones (checkpointed)
    corpus2 = fixtures.corpus_df(spark, replication=2, hot_rows=4).join(
        corpus1, ["repo", "path", "commit"], "left_anti"
    )
    corpus2.write.mode("append").parquet(src)
    tables2 = run_available_now(spark, src, out, config)

    expected_all = _triples_set(
        Pipeline(config).run(corpus1.unionByName(corpus2))["triples"]
    )
    assert _triples_set(tables2["triples"]) == expected_all

    # no duplicated records despite the two incremental drains
    records = spark.read.parquet(f"{out}/records")
    dup = (
        records.filter(F.col("kind") == "mention")
        .groupBy("root_sha256", "subj", "pred", "obj", "repo", "path")
        .count().filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_stream_kill_restart_yields_identical_triples(spark, tmp_path):
    """The full extract->triples path under foreachBatch with lineage
    manifests as the sink commit: a crash mid-stream in the sharpest
    window (batch data written, manifest NOT committed, stream
    checkpoint not advanced) followed by a restart yields exactly the
    batch pipeline's triples — no duplicates, no losses."""
    import pytest

    src = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    config = PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"})

    corpus = fixtures.corpus_df(spark, replication=2, hot_rows=4)
    # many part files so maxFilesPerTrigger=2 forces several micro-batches
    corpus.repartition(8).write.parquet(src)

    with pytest.raises(Exception, match="simulated crash"):
        run_available_now(spark, src, out, config,
                          max_files_per_trigger=2, fail_after_batches=2)

    # partial state on disk: exactly 2 committed batches, but MORE
    # batch_id partitions than committed (the crashed batch's data landed)
    from kgmwcp.streaming.ingest import (STREAM_MANIFEST_NAME,
                                         _stream_manifest_entries)

    committed = [e["batch_id"]
                 for e in _stream_manifest_entries(f"{out}/{STREAM_MANIFEST_NAME}")
                 if e.get("status") == "done"]
    assert len(committed) == 2
    records_raw = spark.read.parquet(f"{out}/records")
    on_disk = {r["batch_id"] for r in
               records_raw.select("batch_id").distinct().collect()}
    assert len(on_disk) > 2, "crash window should leave uncommitted data"

    # restart: same out dir, same checkpoint — drains the rest
    tables = run_available_now(spark, src, out, config,
                               max_files_per_trigger=2)
    expected = _triples_set(Pipeline(config).run(corpus)["triples"])
    assert _triples_set(tables["triples"]) == expected

    # exactly-once at the records level too: each mention row appears once
    records = spark.read.parquet(f"{out}/records")
    dup = (
        records.filter(F.col("kind") == "mention")
        .groupBy("root_sha256", "subj", "pred", "obj", "repo", "path")
        .count().filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_windowed_event_counts_stream_matches_batch(spark, tmp_path):
    """Watermarked tumbling-window agg: the streaming result (availableNow
    drain) equals the batch window agg on the same events."""
    from kgmwcp.streaming.stateful import windowed_event_counts

    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(src)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(batch).collect()
    }
    assert expected, "batch window agg is empty"

    # the file stream source needs a directory, not a single parquet file
    stream_dir = tmp_path / "events"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(stream_dir))
    windowed = windowed_event_counts(stream)
    assert "EventTimeWatermark" in windowed._jdf.queryExecution().logical().toString()
    q = (
        windowed.writeStream.format("memory").queryName("win_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expected


def test_first_seen_entities_state_across_batches_and_restart(spark, tmp_path):
    """applyInPandasWithState: each entity emitted exactly once across
    micro-batches AND across query restarts (checkpointed state)."""
    import datetime

    from kgmwcp.streaming.stateful import (
        FIRST_SEEN_OUTPUT_SCHEMA, first_seen_entities)

    src = tmp_path / "mentions"
    out = tmp_path / "first_seen"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def ts(minute):
        return datetime.datetime(2024, 1, 1, 0, minute)

    schema = "entity_id string, subj string, ts timestamp"

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = (first_seen_entities(stream).writeStream.format("parquet")
             .option("path", str(out)).option("checkpointLocation", str(ckpt))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.schema(FIRST_SEEN_OUTPUT_SCHEMA).parquet(str(out)).collect()

    spark.createDataFrame(
        [("e1", "s1", ts(1)), ("e1", "s2", ts(2)), ("e2", "s3", ts(3))],
        schema).coalesce(1).write.mode("append").parquet(str(src))
    rows = drain()
    assert {r["entity_id"] for r in rows} == {"e1", "e2"}
    e1 = next(r for r in rows if r["entity_id"] == "e1")
    assert e1["first_subj"] == "s1" and e1["n_mentions_batch"] == 2

    # restart with overlapping + new entities: only e3 is new
    spark.createDataFrame(
        [("e1", "s9", ts(9)), ("e3", "s4", ts(4))],
        schema).coalesce(1).write.mode("append").parquet(str(src))
    rows = drain()
    assert sorted(r["entity_id"] for r in rows) == ["e1", "e2", "e3"]
    e3 = next(r for r in rows if r["entity_id"] == "e3")
    assert e3["first_subj"] == "s4"


def test_streaming_with_router_matches_batch(spark, tmp_path):
    """The signature router composes onto readStream (pure projection):
    routed streaming triples == routed batch triples."""
    src = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    config = PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"},
                            use_router=True)
    corpus = fixtures.corpus_df(spark, replication=1, hot_rows=2)
    corpus.write.mode("append").parquet(src)
    tables = run_available_now(spark, src, out, config)
    expected = _triples_set(Pipeline(config).run(corpus)["triples"])
    assert _triples_set(tables["triples"]) == expected


def test_first_seen_fn_scans_all_chunks():
    """The global first observation must consider EVERY Arrow chunk of a
    hot key, not just the first non-empty one (code-review finding)."""
    import pandas as pd

    from kgmwcp.streaming.stateful import _first_seen_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    chunk1 = pd.DataFrame({"entity_id": ["e"] * 2,
                           "subj": ["s9", "s8"],
                           "ts": pd.to_datetime(["2020-01-02", "2020-01-03"])})
    chunk2 = pd.DataFrame({"entity_id": ["e"],
                           "subj": ["s1"],
                           "ts": pd.to_datetime(["2020-01-01"])})
    out = list(_first_seen_fn(("e",), [chunk1, chunk2], FakeState()))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["first_subj"] == "s1"          # earliest lives in chunk 2
    assert row["n_mentions_batch"] == 3


def test_available_now_empty_drop_folder(spark, tmp_path):
    """The natural first call — draining an empty folder — must return
    empty tables, not PATH_NOT_FOUND (code-review finding)."""
    from kgmwcp.pipeline import PipelineConfig
    from kgmwcp.streaming.ingest import run_available_now

    src = tmp_path / "drop"
    src.mkdir()
    tables = run_available_now(spark, str(src), str(tmp_path / "out"),
                               PipelineConfig(n_buckets=4))
    assert tables["triples"].count() == 0
    assert tables["reports"].count() == 0


def test_sessionized_events_stream_matches_batch_closed_sessions(spark, tmp_path):
    """Gap-based streaming sessionization: data-driven closures emit as
    soon as the >gap successor arrives; watermark-driven closures emit
    via EventTimeTimeout on a later micro-batch (across a query
    RESTART, so the open-session state is checkpointed); the union of
    emitted sessions equals the batch sessionize op minus each user's
    final (still-open) session."""
    import datetime

    from kgmwcp.ops.relational import q_events_sessionize
    from kgmwcp.streaming.stateful import (
        SESSION_OUTPUT_SCHEMA, sessionized_events)

    def ts(h, m):
        return datetime.datetime(2024, 1, 1, h, m)

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    src = tmp_path / "events_stream"
    out = tmp_path / "sessions"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    file1 = [
        (1, ts(0, 0), 7, "click", 1.0, "{}"),
        (2, ts(0, 29), 7, "click", 2.0, "{}"),   # same session (29 min)
        (3, ts(0, 5), 8, "view", 5.0, "{}"),
    ]
    file2 = [
        (4, ts(1, 30), 7, "click", 3.0, "{}"),   # >30min: closes 7's A
        (5, ts(3, 0), 8, "buy", 7.0, "{}"),      # closes 8's A
        (6, ts(6, 0), 99, "click", 0.5, "{}"),   # watermark pusher
    ]
    file3 = [
        (7, ts(6, 1), 99, "click", 0.5, "{}"),   # extra batch: timeouts fire
    ]

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(str(src))

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = (sessionized_events(stream).writeStream.format("parquet")
             .option("path", str(out)).option("checkpointLocation", str(ckpt))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.schema(SESSION_OUTPUT_SCHEMA) \
            .parquet(str(out)).collect()

    write_file(file1)
    write_file(file2)
    rows = drain()
    # data-driven closures only (timeouts need a subsequent batch)
    got1 = {(r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], r["total_value"]) for r in rows}
    assert (7, ts(0, 0), ts(0, 29), 2, 3.0) in got1
    assert (8, ts(0, 5), ts(0, 5), 1, 5.0) in got1
    assert not any(u == 99 for (u, *_) in got1)

    # restart from checkpoint; the new batch advances past the open
    # sessions' gap deadlines (watermark 04:00) -> timeout emissions
    write_file(file3)
    rows = drain()
    got = {(r["user_id"], r["session_start"], r["session_end"],
            r["n_events"], r["total_value"]) for r in rows}

    # batch twin: every session except those STILL OPEN at the final
    # watermark — a user's last session is open iff its gap deadline is
    # beyond the watermark (max event time - 2h); earlier sessions are
    # always closed (a successor event exists)
    ev_dir = tmp_path / "batch_twin"
    ev_dir.mkdir()
    spark.createDataFrame(file1 + file2 + file3, schema).coalesce(1) \
        .write.parquet(str(ev_dir / "events.parquet"))
    batch = q_events_sessionize(spark, str(ev_dir)).collect()
    final_wm = ts(6, 1) - datetime.timedelta(hours=2)
    gap = datetime.timedelta(seconds=1800)
    last_seq = {}
    for r in batch:
        last_seq[r["user_id"]] = max(last_seq.get(r["user_id"], 0),
                                     r["session_seq"])
    expected = set()
    for r in batch:
        start = datetime.datetime.strptime(r["session_start"],
                                           "%Y-%m-%d %H:%M:%S")
        end = datetime.datetime.strptime(r["session_end"],
                                         "%Y-%m-%d %H:%M:%S")
        is_last = r["session_seq"] == last_seq[r["user_id"]]
        if is_last and end + gap > final_wm:
            continue  # still open in the stream (only user 99's)
        expected.add((r["user_id"], start, end,
                      r["n_events"], r["total_value"]))
    assert got == expected and len(expected) == 4


def test_sessionized_events_late_event_merges_without_split(spark, tmp_path):
    """A late-but-within-watermark event arriving in a later micro-batch
    must merge into the open session WITHOUT regressing its end bound —
    a naive last_ts overwrite would make the next on-time event look
    >gap away and falsely split the session (review finding)."""
    import datetime

    from kgmwcp.streaming.stateful import (
        SESSION_OUTPUT_SCHEMA, sessionized_events)

    def ts(h, m):
        return datetime.datetime(2024, 1, 1, h, m)

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    src = tmp_path / "s"
    out = tmp_path / "o"
    ckpt = tmp_path / "c"
    src.mkdir()

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(str(src))

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        q = (sessionized_events(stream).writeStream.format("parquet")
             .option("path", str(out)).option("checkpointLocation", str(ckpt))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.schema(SESSION_OUTPUT_SCHEMA) \
            .parquet(str(out)).collect()

    write_file([(1, ts(10, 0), 5, "click", 1.0, "{}")])
    write_file([
        (2, ts(9, 50), 5, "click", 1.0, "{}"),    # LATE (within watermark)
        (3, ts(10, 25), 5, "click", 1.0, "{}"),   # 25 min after 10:00
        (4, ts(14, 0), 99, "click", 0.0, "{}"),   # watermark pusher
    ])
    write_file([(5, ts(14, 1), 99, "click", 0.0, "{}")])  # timeout batch
    rows = drain()
    mine = [(r["session_start"], r["session_end"], r["n_events"])
            for r in rows if r["user_id"] == 5]
    assert mine == [(ts(9, 50), ts(10, 25), 3)]  # ONE session, no split


def test_dedup_events_stream_drops_redeliveries_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: redelivered event_ids — including
    ones redelivered in a LATER micro-batch within the watermark horizon
    — are dropped; output equals the batch dropDuplicates twin."""
    import datetime

    from kgmwcp.streaming.stateful import dedup_events_stream

    def ts(h, m):
        return datetime.datetime(2024, 1, 1, h, m)

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    src = tmp_path / "dedup_stream"
    src.mkdir()
    file1 = [
        (1, ts(0, 0), 7, "click", 1.0, "{}"),
        (2, ts(0, 10), 7, "view", 2.0, "{}"),
        (2, ts(0, 10), 7, "view", 2.0, "{}"),   # in-batch duplicate
        (3, ts(0, 20), 8, "click", 3.0, "{}"),
    ]
    file2 = [
        (2, ts(0, 10), 7, "view", 2.0, "{}"),   # cross-batch redelivery
        (4, ts(0, 40), 8, "purchase", 9.0, "{}"),
        (3, ts(0, 20), 8, "click", 3.0, "{}"),  # cross-batch redelivery
    ]
    spark.createDataFrame(file1, schema).coalesce(1).write.parquet(
        str(src / "f1"))
    spark.createDataFrame(file2, schema).coalesce(1).write.parquet(
        str(src / "f2"))
    # flatten: file source wants a directory of part files
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for sub in ("f1", "f2"):
        for p in sorted((src / sub).glob("*.parquet")):
            shutil.copy(p, flat / f"{sub}_{p.name}")
            n += 1
    assert n == 2

    batch = spark.read.schema(schema).parquet(str(flat))
    expected = {tuple(r) for r in dedup_events_stream(batch).collect()}
    assert len(expected) == 4  # ids 1..4 exactly once

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)  # force two micro-batches
              .parquet(str(flat)))
    deduped = dedup_events_stream(stream)
    q = (deduped.writeStream.format("memory").queryName("dedup_ev")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("SELECT * FROM dedup_ev").collect()}
    assert got == expected
