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


def decode_real(payload: bytes) -> dict:
    """Real decode for the formats whose parsers need no external codec:
    BMP and 16-bit PCM WAV header parses (engine/media.py, pure python,
    public formats).  Sniffs the magic — the media_type hint is NOT
    trusted.  Anything else (JPEG/PNG/MP4/...) still raises: those
    codecs aren't in this container; a production deployment extends the
    sniff chain (PIL / soundfile / pyav) on the same plumbing.
    """
    from kgmwcp.engine import media

    bmp = media.parse_bmp(payload)
    if bmp is not None:
        return {
            "media_type": "image/bmp", "n_bytes": bmp["n_bytes"],
            "width": bmp["width"], "height": bmp["height"],
            "channels": bmp["channels"],
            "sample_rate": None, "duration_ms": None,
        }
    wav = media.parse_wav(payload)
    if wav is not None:
        return {
            "media_type": "audio/wav", "n_bytes": wav["n_bytes"],
            "width": None, "height": None,
            "channels": wav["channels"],
            "sample_rate": wav["sample_rate"],
            "duration_ms": wav["duration_ms"],
        }
    raise NotImplementedError(
        "no pure-python parser for this payload; only BMP/WAV decode "
        "is available in this environment"
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


# -- real decode path --------------------------------------------------------------
# Deterministic spec-conformant BMP/WAV files are synthesized per doc_id
# (engine/media.py builders), then decode_real parses ONLY the bytes —
# the mapper never hands the synthesis parameters to the decoder, so the
# oracle (the same parameters recomputed declaratively) verifies a
# genuine header parse round-trip, not an echo.

_REAL_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_ms", LongType()),
])

_REAL_COLS = [f.name for f in _REAL_META_SCHEMA.fields]


def _synth_payload(doc_id: int) -> bytes:
    from kgmwcp.engine import media

    if doc_id % 2 == 0:
        return media.make_bmp(doc_id % 32 + 1, doc_id % 24 + 1,
                              3 + (doc_id // 2) % 2, seed=doc_id)
    return media.make_wav((doc_id // 2) % 2 + 1,
                          8000 + (doc_id % 5) * 4000,
                          doc_id % 400 + 1, seed=doc_id)


def q_multimodal_real_meta(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def mapper(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rows.append({"doc_id": d, **decode_real(_synth_payload(d))})
            out = pd.DataFrame(rows, columns=_REAL_COLS)
            for col in ("width", "height", "channels", "sample_rate"):
                out[col] = out[col].astype("Int32")
            out["duration_ms"] = out["duration_ms"].astype("Int64")
            yield out

    return docs.mapInPandas(mapper, schema=_REAL_META_SCHEMA)


# the oracle recomputes the synthesis parameters declaratively; matching
# the Spark side proves decode_real recovered them from the bytes alone
SQL_MULTIMODAL_REAL_META = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END AS media_type,
       CASE WHEN doc_id % 2 = 0
            THEN 54 + (doc_id % 24 + 1)
                 * (((doc_id % 32 + 1) * (3 + (doc_id // 2) % 2) + 3) // 4 * 4)
            ELSE 44 + (doc_id % 400 + 1) * ((doc_id // 2) % 2 + 1) * 2
       END AS n_bytes,
       CASE WHEN doc_id % 2 = 0 THEN (doc_id % 32 + 1)::INT END AS width,
       CASE WHEN doc_id % 2 = 0 THEN (doc_id % 24 + 1)::INT END AS height,
       CASE WHEN doc_id % 2 = 0 THEN (3 + (doc_id // 2) % 2)::INT
            ELSE ((doc_id // 2) % 2 + 1)::INT END AS channels,
       CASE WHEN doc_id % 2 = 1 THEN (8000 + (doc_id % 5) * 4000)::INT
       END AS sample_rate,
       CASE WHEN doc_id % 2 = 1
            THEN (doc_id % 400 + 1) * 1000 // (8000 + (doc_id % 5) * 4000)
       END AS duration_ms
FROM documents
"""


# -- real resize + real feature extraction ------------------------------------------
# Same proof shape as real_meta, one level deeper: the mapper hands the
# decoder ONLY bytes; resize_bmp_nearest samples actual pixel bytes
# (stride padding, stored row order) and wav_features decodes actual
# int16 sample words — the oracles recompute the expected checksums /
# amplitude sums from the synthesis closed form ((seed+i) % 256), so a
# hash match proves the pixel/sample bytes were genuinely read and
# resampled, not echoed from headers.  All-integer arithmetic keeps the
# twins bit-exact.

_RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("checksum", LongType()),
])


def q_multimodal_resize(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").filter(F.col("doc_id") % 2 == 0)
    )

    def mapper(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kgmwcp.engine import media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                r = media.resize_bmp_nearest(_synth_payload(d))
                rows.append({"doc_id": d, **r})
            out = pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels",
                               "checksum"])
            for col in ("width", "height", "channels"):
                out[col] = out[col].astype("Int32")
            yield out

    return docs.mapInPandas(mapper, schema=_RESIZE_SCHEMA)


SQL_MULTIMODAL_RESIZE = """
WITH p AS (
  SELECT doc_id,
         (doc_id % 32 + 1) AS w,
         (doc_id % 24 + 1) AS h,
         (3 + (doc_id // 2) % 2) AS ch
  FROM documents WHERE doc_id % 2 = 0
), q AS (
  SELECT doc_id, w, h, ch,
         ((w * ch + 3) // 4 * 4) AS stride,
         ((w + 1) // 2) AS out_w,
         ((h + 1) // 2) AS out_h
  FROM p
)
SELECT doc_id,
       out_w::INT AS width, out_h::INT AS height, ch::INT AS channels,
       CAST(list_aggregate(flatten(list_transform(range(out_h), oy ->
            flatten(list_transform(range(out_w), ox ->
              list_transform(range(ch), c ->
                (doc_id + (oy * h // out_h) * stride
                 + (ox * w // out_w) * ch + c) % 256))))), 'sum') AS BIGINT)
         AS checksum
FROM q
"""


_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sum_abs", LongType()),
    StructField("peak", IntegerType()),
])


def q_multimodal_features(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").filter(F.col("doc_id") % 2 == 1)
    )

    def mapper(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kgmwcp.engine import media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                r = media.wav_features(_synth_payload(d))
                rows.append({"doc_id": d, **r})
            out = pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "channels", "sum_abs",
                               "peak"])
            for col in ("n_frames", "channels", "peak"):
                out[col] = out[col].astype("Int32")
            yield out

    return docs.mapInPandas(mapper, schema=_FEATURES_SCHEMA)


SQL_MULTIMODAL_FEATURES = """
WITH p AS (
  SELECT doc_id,
         ((doc_id // 2) % 2 + 1) AS ch,
         (doc_id % 400 + 1) AS n_frames
  FROM documents WHERE doc_id % 2 = 1
), s AS (
  SELECT doc_id, ch, n_frames,
         list_transform(range(n_frames * ch), k ->
           abs(CASE WHEN ((doc_id + 2*k) % 256
                          + 256 * ((doc_id + 2*k + 1) % 256)) >= 32768
                    THEN ((doc_id + 2*k) % 256
                          + 256 * ((doc_id + 2*k + 1) % 256)) - 65536
                    ELSE ((doc_id + 2*k) % 256
                          + 256 * ((doc_id + 2*k + 1) % 256)) END)) AS a
  FROM p
)
SELECT doc_id, n_frames::INT AS n_frames, ch::INT AS channels,
       CAST(list_aggregate(a, 'sum') AS BIGINT) AS sum_abs,
       CAST(list_aggregate(a, 'max') AS INT) AS peak
FROM s
"""


# -- ViT-style patch extraction -----------------------------------------------
# The image→patch-sequence prep a vision-transformer training pipeline
# runs per image: non-overlapping 8x8 tiles (full tiles only — the
# ragged margins are cropped, the standard to-multiple crop), one output
# ROW per patch with its pixel-byte checksum, in stored row order.
# Same proof shape as resize/features: the mapper hands the decoder
# ONLY bytes; the oracle recomputes every patch sum from the synthesis
# closed form ((seed+i) % 256), so a hash match proves the actual tile
# bytes were read and partitioned, not echoed.  Scale shape: mapper-only
# per-image work emitting n_patches rows — composes directly into
# corpus_pack_sequences downstream.

_PATCH = 8

_PATCHIFY_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("patch_row", IntegerType()),
    StructField("patch_col", IntegerType()),
    StructField("checksum", LongType()),
])


def q_multimodal_patchify(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").filter(F.col("doc_id") % 2 == 0)
    )

    def mapper(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kgmwcp.engine import media

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for py, px, cs in media.bmp_patchify(
                        _synth_payload(d), patch=_PATCH) or []:
                    rows.append({"doc_id": d, "patch_row": py,
                                 "patch_col": px, "checksum": cs})
            out = pd.DataFrame(
                rows, columns=["doc_id", "patch_row", "patch_col",
                               "checksum"])
            for col in ("patch_row", "patch_col"):
                out[col] = out[col].astype("Int32")
            yield out

    return docs.mapInPandas(mapper, schema=_PATCHIFY_SCHEMA)


SQL_MULTIMODAL_PATCHIFY = """
WITH p AS (
  SELECT doc_id,
         (doc_id % 32 + 1) AS w,
         (doc_id % 24 + 1) AS h,
         (3 + (doc_id // 2) % 2) AS ch
  FROM documents WHERE doc_id % 2 = 0
), q AS (
  SELECT doc_id, w, h, ch,
         ((w * ch + 3) // 4 * 4) AS stride,
         (w // {P}) AS npx, (h // {P}) AS npy
  FROM p WHERE w >= {P} AND h >= {P}
), sel AS (
  SELECT doc_id,
         unnest(flatten(list_transform(range(npy), py ->
           list_transform(range(npx), px -> struct_pack(
             py := py, px := px,
             cs := list_aggregate(flatten(list_transform(range({P}), dy ->
               list_transform(range({P} * ch), i ->
                 (doc_id + (py * {P} + dy) * stride + px * {P} * ch + i)
                   % 256))), 'sum')))))) AS u
  FROM q
)
SELECT doc_id, CAST(u.py AS INT) AS patch_row, CAST(u.px AS INT) AS patch_col,
       CAST(u.cs AS BIGINT) AS checksum
FROM sel
""".format(P=_PATCH)


QUERIES = {
    "multimodal_patchify": q_multimodal_patchify,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_real_meta": q_multimodal_real_meta,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_features": q_multimodal_features,
}

ORACLES = {
    "multimodal_patchify": SQL_MULTIMODAL_PATCHIFY,
    "multimodal_meta": SQL_MULTIMODAL_META,
    "multimodal_real_meta": SQL_MULTIMODAL_REAL_META,
    "multimodal_frame_sample": SQL_MULTIMODAL_FRAME_SAMPLE,
    "multimodal_resize": SQL_MULTIMODAL_RESIZE,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
}
