"""Stage 0 — ingest + identity.

Pure Column expressions (whole-stage codegen, no Python):
  * binary payload decode: ``lang='binary-b64'`` rows hold base64 in
    ``content``; everything else is utf-8 text,
  * sha256/md5 identity — THE per-row invariant vs the reference's
    FileObject hashes (mwcp/file_object.py:342-370),
  * deterministic bucket id for lineage/checkpointing (crc32, stable
    across runs/sessions, unlike a random or partition-local id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgmwcp.schema import ROUTE_COLUMN

__all__ = ["prepare_samples", "single_sample_docs"]


def single_sample_docs(spark, data: bytes, name: str, repo: str = "upload",
                       route: str | None = None) -> DataFrame:
    """One raw blob -> a one-row documents DataFrame (binary-b64 lang
    tag) — the shared ingest shape for stdin (`--input -`) and the REST
    server, so the two one-shot surfaces cannot drift from each other
    or from the table contract."""
    import base64

    docs = spark.createDataFrame(
        [(repo, name, "", "binary-b64",
          base64.b64encode(data).decode("ascii"))],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    if route:
        docs = docs.withColumn(ROUTE_COLUMN, F.lit(route))
    return docs


def prepare_samples(docs: DataFrame, n_buckets: int = 64) -> DataFrame:
    """documents(repo,path,commit,lang,content[,route]) -> samples."""
    if ROUTE_COLUMN not in docs.columns:
        docs = docs.withColumn(ROUTE_COLUMN, F.lit(None).cast("string"))
    content_bin = F.coalesce(
        # NULL content (or un-decodable base64) must not poison identity:
        # a null sha256/bucket row would crash the manifest commit and
        # could never be marked done, re-running forever on resume
        F.when(F.col("lang") == "binary-b64", F.unbase64(F.col("content")))
        .otherwise(F.encode(F.col("content"), "utf-8")),
        F.lit(b""),
    )
    samples = (
        docs
        .withColumn("content_bin", content_bin)
        .withColumn("sha256", F.sha2(F.col("content_bin"), 256))
        .withColumn("md5", F.md5(F.col("content_bin")))
        .withColumn("size", F.length(F.col("content_bin")).cast("long"))
        .withColumn(
            "bucket",
            F.pmod(F.crc32(F.encode(F.col("sha256"), "utf-8")), F.lit(n_buckets))
            .cast("int"),
        )
    )
    return samples
