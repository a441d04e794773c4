"""Multimodal column plumbing — opaque binary payloads + typed metadata.

The real image/audio codecs aren't present in this environment, so the
*decode* is a clearly-marked deterministic fake, but the Spark-side
plumbing is real and tested: binary column synthesis, Arrow batching
through ``mapInPandas``, typed metadata schema, and an SQL oracle that
recomputes the same deterministic metadata — proving the UDF path emits
exactly what the declarative twin does.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

__all__ = ["QUERIES", "ORACLES", "fake_decode_batch", "decode_real"]

_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
])

_MEDIA_TYPES = ["image", "audio", "video"]


def decode_real(payload: bytes, media_type: str):
    """Real decoder hook — deliberately unimplemented in this container.

    A production deployment swaps this in (PIL / soundfile / pyav) while
    keeping the identical mapInPandas plumbing below.
    """
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "fake_decode_batch provides the deterministic stand-in"
    )


def fake_decode_batch(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for a decode: metadata derived from bytes.

    ``channels`` hashes the payload (md5 first byte) rather than reading
    ``payload[0]`` directly: the first *byte* of UTF-8 text and the first
    *codepoint* the SQL oracle can reach diverge on non-ASCII-leading
    text, while md5-of-bytes is computed identically on both engines.
    """
    import hashlib

    n_bytes = payloads.str.len()  # vectorized (works for bytes Series)
    h1 = payloads.map(lambda b: int(hashlib.md5(b).hexdigest()[:2], 16))
    return pd.DataFrame({
        "n_bytes": n_bytes.astype("int64"),
        "width": ((n_bytes % 640) + 16).astype("int32"),
        "height": ((n_bytes % 480) + 16).astype("int32"),
        "channels": ((h1 % 3) + 1).astype("int32"),
    })


def _media_df(spark, sf_dir) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def q_multimodal_meta(spark, sf_dir):
    media = _media_df(spark, sf_dir)

    def mapper(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(bytes)
            meta = fake_decode_batch(payloads)
            out = pd.concat(
                [pdf[["doc_id", "media_type"]].reset_index(drop=True), meta],
                axis=1,
            )
            yield out

    return media.mapInPandas(mapper, schema=_META_SCHEMA)


# the oracle recomputes the fake decode declaratively
SQL_MULTIMODAL_META = """
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
       octet_length(encode(text)) AS n_bytes,
       ((octet_length(encode(text)) % 640) + 16)::INT AS width,
       ((octet_length(encode(text)) % 480) + 16)::INT AS height,
       ((('0x' || substr(md5(text), 1, 2))::INT % 3) + 1)::INT AS channels
FROM documents
"""


def q_multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing: one row per sampled 'frame' (explode of a
    deterministic frame index sequence) — the Spark shape of video decode."""
    media = _media_df(spark, sf_dir).filter(F.col("media_type") == "video")
    n_frames = (F.length("payload") % 5 + 1).cast("int")
    return (
        media.withColumn("n_frames", n_frames)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
    )


SQL_MULTIMODAL_FRAME_SAMPLE = """
SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx
FROM (
  SELECT doc_id, (octet_length(encode(text)) % 5 + 1) AS n_frames
  FROM documents
  WHERE ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] = 'video'
)
"""


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_frame_sample": q_multimodal_frame_sample,
}

ORACLES = {
    "multimodal_meta": SQL_MULTIMODAL_META,
    "multimodal_frame_sample": SQL_MULTIMODAL_FRAME_SAMPLE,
}
