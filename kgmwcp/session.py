"""SparkSession factory with the pipeline's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "tune"]

_DEFAULT_CONF = {
    # Arrow everywhere; small batches — content blobs can be large.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
    # AQE: runtime coalesce + skew handling for the canonicalization joins.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # Idempotent resume: rewriting a bucket replaces it, never duplicates.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.session.timeZone": "UTC",
}


def tune(builder: SparkSession.Builder) -> SparkSession.Builder:
    for key, value in _DEFAULT_CONF.items():
        builder = builder.config(key, value)
    return builder


def get_spark(app_name: str = "kgmwcp", master: str | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    return tune(builder).getOrCreate()
