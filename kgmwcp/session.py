"""SparkSession factory with the pipeline's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "tune"]

_DEFAULT_CONF = {
    # local-mode JVM sizing (the sandbox has 128 GiB; Spark's 1g default
    # dies on blob-heavy caches)
    "spark.driver.memory": "32g",
    "spark.driver.maxResultSize": "8g",
    # ZGC: G1 suffers GCLocker allocation storms under concurrent Arrow IPC
    # socket writes at 32 cores (measured 2-3x extract slowdown); ZGC and
    # ParallelGC both avoid it, ZGC measured fastest.
    "spark.driver.extraJavaOptions": "-XX:+UseZGC",
    # Arrow everywhere; small batches — content blobs can be large, and
    # small batches pipeline JVM->python transfer with python compute
    # (measured: 64-256 rows beats 1024+ on blob extraction).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "128",
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
