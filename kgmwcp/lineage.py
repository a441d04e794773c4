"""Per-partition lineage manifests + idempotent resume (SURVEY.md R8, §4.2).

Checkpointing model:
  * every sample carries a deterministic ``bucket`` id (crc32(sha256) % N,
    stage 0) — stable across runs, independent of partitioning,
  * extraction output is written partitioned by bucket with dynamic
    partition overwrite, so re-processing a bucket *replaces* its output
    instead of appending duplicates,
  * a manifest (JSON lines: bucket, n_rows, n_roots, status) is committed
    only after the bucket data lands; resume anti-joins the sample frontier
    against completed buckets — the Spark analogue of the reference's
    "already parsed -> skip" semantics (mwcp/dispatcher.py:285-294,350-351).
"""

from __future__ import annotations

import json
import pathlib
from typing import Optional, Set

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CheckpointedRun", "read_manifest", "completed_buckets",
           "read_jsonl_tolerant"]

MANIFEST_NAME = "manifest.jsonl"
RECORDS_DIR = "records"


def read_jsonl_tolerant(path) -> list:
    """JSONL entries, skipping torn/partial lines — the crash-mid-append
    window every manifest commit here must heal (a torn line simply means
    that unit isn't committed and re-runs idempotently).  Shared by the
    batch bucket manifest and the streaming batch manifest."""
    path = pathlib.Path(path)
    if not path.exists():
        return []
    entries = []
    with path.open() as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                entries.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return entries


def read_manifest(out_dir: str) -> list:
    return read_jsonl_tolerant(pathlib.Path(out_dir) / MANIFEST_NAME)


def completed_buckets(out_dir: str) -> Set[int]:
    return {
        e["bucket"] for e in read_manifest(out_dir) if e.get("status") == "done"
    }


class CheckpointedRun:
    """Drives one resumable extraction over a prepared samples DataFrame."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out_dir = pathlib.Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.records_path = str(self.out_dir / RECORDS_DIR)

    def frontier(self, samples: DataFrame) -> DataFrame:
        """Samples in buckets not yet committed (anti-join resume)."""
        done = completed_buckets(str(self.out_dir))
        if not done:
            return samples
        done_df = self.spark.createDataFrame(
            [(b,) for b in sorted(done)], "bucket int"
        )
        # tiny dim side -> broadcast anti-join, no shuffle of the fact side
        return samples.join(F.broadcast(done_df), "bucket", "left_anti")

    def write_records(self, records: DataFrame,
                      fail_after_buckets: Optional[int] = None) -> int:
        """Extract + persist records partitioned by bucket; commit manifest.

        ``fail_after_buckets`` is a test hook: commit only the first K
        buckets to the manifest, simulating a mid-run crash *after* data
        write but *before* full manifest commit (the overwrite path must
        heal this on resume).
        Returns the number of buckets committed in this call.
        """
        records = records.cache()
        try:
            stats = (
                records.groupBy("bucket")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.countDistinct("root_sha256").alias("n_roots"),
                )
                .orderBy("bucket")
                .collect()
            )
            if not stats:
                return 0
            (
                records.repartition("bucket")
                .write.mode("overwrite")
                # per-write dynamic overwrite: resume must replace only the
                # re-processed buckets even on a session that didn't set
                # spark.sql.sources.partitionOverwriteMode=dynamic — with
                # static mode a resume would wipe every committed bucket
                # while the manifest still marks them done.
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(self.records_path)
            )
            manifest_path = self.out_dir / MANIFEST_NAME
            committed = 0
            with manifest_path.open("a") as fh:
                for i, row in enumerate(stats):
                    if fail_after_buckets is not None and i >= fail_after_buckets:
                        break
                    fh.write(json.dumps({
                        "bucket": int(row["bucket"]),
                        "n_rows": int(row["n_rows"]),
                        "n_roots": int(row["n_roots"]),
                        "status": "done",
                    }) + "\n")
                    committed += 1
            return committed
        finally:
            records.unpersist()

    def read_records(self) -> DataFrame:
        """All committed records (uncommitted buckets are filtered out)."""
        records = self.spark.read.parquet(self.records_path)
        done = completed_buckets(str(self.out_dir))
        done_df = self.spark.createDataFrame(
            [(b,) for b in sorted(done)], "bucket int"
        )
        return records.join(F.broadcast(done_df), "bucket", "left_semi")
