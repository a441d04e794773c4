"""Stage 6b — per-root report JSON assembly (SURVEY.md R3, S10).

Groups mentions by root sample and serializes a report document per root.
Element order inside the report is the canonical (subj, pred, obj) sort —
the reference compares reports order-insensitively anyway
(mwcp/tests/test_parsers.py:308-312,364).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgmwcp.stages.link import files_of, mentions_of

__all__ = ["reports_of"]


def reports_of(records: DataFrame, parser: str | None = None) -> DataFrame:
    """records -> (root_sha256, n_elements, report_json)."""
    mentions = mentions_of(records).select(
        "root_sha256", "subj", "pred", "obj", "repo", "path", "commit"
    )
    grouped = (
        mentions.groupBy("root_sha256")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("subj", "pred", "obj"))
            ).alias("metadata"),
            F.first("repo").alias("repo"),
            F.first("path").alias("path"),
            F.first("commit").alias("commit"),
        )
    )
    roots = (
        files_of(records)
        .filter(F.col("depth") == 0)
        .select(
            F.col("sha256").alias("root_sha256"),
            F.col("md5").alias("input_md5"),
            F.col("name").alias("input_name"),
            F.col("description").alias("input_description"),
        )
        .dropDuplicates(["root_sha256"])
    )
    joined = roots.join(grouped, "root_sha256", "left")
    report_json = F.to_json(
        F.struct(
            F.col("root_sha256").alias("sha256"),
            F.col("input_md5").alias("md5"),
            F.col("input_name").alias("name"),
            F.col("input_description").alias("description"),
            F.lit(parser).alias("parser"),
            F.coalesce(F.col("metadata"), F.array()).alias("metadata"),
        ),
        {"ignoreNullFields": "false"},
    )
    return joined.select(
        "root_sha256",
        F.size(F.coalesce(F.col("metadata"), F.array())).alias("n_elements"),
        report_json.alias("report_json"),
    )
