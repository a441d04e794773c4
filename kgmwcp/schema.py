"""Spark schemas for every table the pipeline produces or consumes."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Input corpus — shape fixed by BASELINE.json input_hint.
DOCUMENTS_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("content", StringType()),
])

# Optional per-row routing column (YARA-routing analogue,
# mwcp/runner.py:158-209): restricts a row to one parser group.
ROUTE_COLUMN = "route"

# stage-0 output: documents + identity columns
SAMPLES_SCHEMA = StructType(list(DOCUMENTS_SCHEMA) + [
    StructField(ROUTE_COLUMN, StringType()),
    StructField("content_bin", BinaryType()),
    StructField("sha256", StringType()),
    StructField("md5", StringType()),
    StructField("size", LongType()),
    StructField("bucket", IntegerType()),
])

# extract-stage output: one unified record stream (mentions + file tree rows)
EXTRACT_SCHEMA = StructType([
    StructField("kind", StringType()),          # 'mention' | 'file_node'
    StructField("root_sha256", StringType()),
    StructField("subj", StringType()),          # attributed source sha256
    StructField("pred", StringType()),          # Element type name
    StructField("obj", StringType()),           # canonical JSON payload
    # file-tree columns (kind='file_node')
    StructField("file_sha256", StringType()),
    StructField("file_md5", StringType()),
    StructField("file_name", StringType()),
    StructField("file_description", StringType()),
    StructField("file_derivation", StringType()),
    StructField("parent_sha256", StringType()),
    StructField("depth", IntegerType()),
    # provenance
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("parser", StringType()),        # rule that parsed the subject
    StructField("error", StringType()),
    StructField("bucket", IntegerType()),
])

TRIPLES_SCHEMA = StructType([
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
])

NODES_SCHEMA = StructType([
    StructField("entity_id", StringType()),
    StructField("entity_kind", StringType()),
    StructField("canonical_value", StringType()),
    StructField("payload", StringType()),
    StructField("n_mentions", LongType()),
    StructField("n_samples", LongType()),
])

EDGES_SCHEMA = StructType([
    StructField("src", StringType()),    # sample sha256 or parent file sha256
    StructField("rel", StringType()),    # pred, or 'dispatched' for file tree
    StructField("dst", StringType()),    # entity_id or child sha256
    StructField("repo", StringType()),
])

MANIFEST_SCHEMA = StructType([
    StructField("bucket", IntegerType()),
    StructField("n_rows", LongType()),
    StructField("n_roots", LongType()),
    StructField("status", StringType()),
])
