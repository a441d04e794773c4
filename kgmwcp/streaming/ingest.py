"""Structured Streaming ingest — continuous KG construction.

The batch pipeline's stages compose unchanged onto a streaming DataFrame:
stage 0 and the mapInArrow extract stage are stateless row transforms, so
``readStream`` -> extract -> ``writeStream`` needs no new operator code.
The (stateful) dedup/linking stages run as periodic batch compaction over
the streamed records table — the classic lambda-free "stream raw,
aggregate on read" layout.  The sink is ``foreachBatch`` with the batch
pipeline's lineage-manifest commit protocol (records partitioned by
(batch_id, bucket), dynamic overwrite, manifest line appended after the
data lands): Spark's checkpointLocation gives at-least-once batch
replay with stable batch ids, and the idempotent overwrite + manifest
visibility filter upgrade that to exactly-once under kill/restart
(pinned by tests/test_streaming.py).

``run_available_now`` drains everything currently in the source directory
and stops (Trigger.AvailableNow), which is both the test mode and the
incremental-backfill mode for a 100 TB drop-folder corpus.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from kgmwcp.pipeline import Pipeline, PipelineConfig
from kgmwcp.schema import DOCUMENTS_SCHEMA, ROUTE_COLUMN
from kgmwcp.stages.extract import extract_records
from kgmwcp.stages.ingest import prepare_samples

__all__ = ["stream_documents", "stream_records", "run_available_now"]


def stream_documents(spark: SparkSession, source_dir: str,
                     with_route: bool = True,
                     max_files_per_trigger: Optional[int] = None) -> DataFrame:
    """readStream over a parquet drop-folder of documents rows.
    ``max_files_per_trigger`` bounds micro-batch size (AvailableNow
    drains in multiple batches honoring it — the test lever for
    multi-batch resume)."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = DOCUMENTS_SCHEMA
    if with_route:
        schema = StructType(list(schema) + [StructField(ROUTE_COLUMN, StringType())])
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def stream_records(docs_stream: DataFrame,
                   config: Optional[PipelineConfig] = None) -> DataFrame:
    """documents stream -> records stream (stage 0 [+ router] + extract,
    stateless — the signature router is a pure projection, so it composes
    onto the stream unchanged)."""
    from kgmwcp.stages.router import route_samples

    config = config or PipelineConfig()
    samples = prepare_samples(docs_stream, n_buckets=config.n_buckets)
    if config.use_router:
        samples = route_samples(samples)
    return extract_records(samples, group_order=config.group_order,
                           knowledge_base=config.knowledge_base,
                           route_scope="root" if config.use_router else "all",
                           emit_file_data=config.emit_file_data,
                           greedy=config.greedy)


STREAM_MANIFEST_NAME = "stream_manifest.jsonl"


def _stream_manifest_entries(path) -> list:
    """Committed micro-batch entries — the same torn-line-tolerant read
    the batch bucket manifest uses."""
    from kgmwcp.lineage import read_jsonl_tolerant

    return read_jsonl_tolerant(path)


def run_available_now(spark: SparkSession, source_dir: str, out_dir: str,
                      config: Optional[PipelineConfig] = None,
                      max_files_per_trigger: Optional[int] = None,
                      fail_after_batches: Optional[int] = None) -> dict:
    """Drain the source dir into a records table under ``foreachBatch``
    with the batch pipeline's lineage-manifest commit protocol, then
    compact KG tables.

    Exactly-once under kill/restart comes from two layers: the sink is
    idempotent per micro-batch (records are written partitioned by
    (batch_id, bucket) with dynamic partition overwrite, and Spark
    replays an unacknowledged batch with the SAME batch_id, so a replay
    overwrites its own partitions instead of appending duplicates), and
    a stream manifest line is appended only AFTER the batch's data
    lands — read-back semi-joins committed batch ids, so a crash between
    data write and manifest append leaves invisible data that the replay
    overwrites.  Already-committed batch ids are skipped on replay.

    ``fail_after_batches`` is a test hook mirroring
    ``CheckpointedRun.write_records``: after N committed batches, the
    next batch crashes AFTER its data write but BEFORE its manifest
    append — the sharpest window the resume story must heal.

    Returns the batch-compacted tables (triples/nodes/edges/...) over
    everything committed so far.
    """
    import pathlib

    from pyspark.sql import functions as F

    config = config or PipelineConfig()
    records = stream_records(
        stream_documents(spark, source_dir,
                         max_files_per_trigger=max_files_per_trigger),
        config)
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    records_path = f"{out_dir}/records"
    manifest_path = out / STREAM_MANIFEST_NAME

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        done = {e["batch_id"] for e in _stream_manifest_entries(manifest_path)
                if e.get("status") == "done"}
        if int(batch_id) in done:
            return  # replayed batch already committed: idempotent skip
        (
            batch_df.withColumn("batch_id", F.lit(int(batch_id)))
            .repartition("bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "bucket")
            .parquet(records_path)
        )
        if fail_after_batches is not None and len(done) >= fail_after_batches:
            raise RuntimeError(
                "simulated crash: batch data written, manifest not committed")
        with manifest_path.open("a") as fh:
            fh.write(json.dumps({"batch_id": int(batch_id),
                                 "status": "done"}) + "\n")

    query = (
        records.writeStream
        .foreachBatch(_commit)
        .option("checkpointLocation", f"{out_dir}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    # a drain over an empty drop folder commits zero batches: the sink
    # dir may be missing entirely or exist with zero part files (schema
    # inference would fail) — the natural first call must return empty
    # tables, not crash
    from kgmwcp.schema import EXTRACT_SCHEMA

    done = [int(e["batch_id"])
            for e in _stream_manifest_entries(manifest_path)
            if e.get("status") == "done"]
    if pathlib.Path(records_path).exists() and done:
        from pyspark.sql.types import LongType, StructField, StructType

        # explicit schema (+ the batch_id partition column): a drain
        # whose only committed batches were EMPTY leaves the sink dir
        # with no data files, and schema inference would crash where an
        # empty frame is the right answer (code-review finding — the
        # same hole this comment block was originally written for)
        read_schema = StructType(
            list(EXTRACT_SCHEMA) + [StructField("batch_id", LongType())])
        # only committed micro-batches are visible (data written by a
        # crashed uncommitted batch is excluded until its replay commits)
        done_df = spark.createDataFrame([(b,) for b in sorted(set(done))],
                                        "batch_id long")
        all_records = (
            spark.read.schema(read_schema).parquet(records_path)
            .join(F.broadcast(done_df), "batch_id", "left_semi")
            .drop("batch_id")
            # partition discovery appends bucket at the end; restore the
            # canonical records column order
            .select(*[f.name for f in EXTRACT_SCHEMA])
        )
    else:
        all_records = spark.createDataFrame([], EXTRACT_SCHEMA)
    return Pipeline(config).tables_from_records(all_records)
