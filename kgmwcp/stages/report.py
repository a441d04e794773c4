"""Stage 6b — per-root report JSON assembly (SURVEY.md R3, S10).

Groups mentions by root sample and serializes one report document per
root, shaped after the reference's report model (mwcp/metadata.py:
2916-2943): ``input_file`` block + ``metadata`` list whose entries are
the element payloads with the ``type`` discriminator injected first
(mwcp/metadata.py:253-255).  The element entries are assembled by string
surgery on the canonical ``obj`` JSON — pure Column expressions, no
Python and no re-serialization drift.

Entry order is the canonical sort; the reference compares reports
order-insensitively anyway (mwcp/tests/test_parsers.py:308-312,364).
Entries are deduped across the root's residual files, matching the
merged report's cross-source flatten-dedupe (mwcp/report.py:925-975).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgmwcp.stages.link import files_of, mentions_of

__all__ = ["reports_of"]


def _json_bytes(obj):
    """Non-JSON knowledge-base values: the canonical serialization rule
    (canonical.py _jsonable: bytes -> base64), str() as last resort."""
    from kgmwcp.canonical import _jsonable

    out = _jsonable(bytes(obj) if isinstance(obj, bytearray) else obj)
    return out if out is not obj else str(obj)


def reports_of(records: DataFrame, parser: str | None = None,
               external_knowledge: dict | None = None,
               include_file_data: bool = False) -> DataFrame:
    """records -> (root_sha256, n_elements, report_json).

    ``external_knowledge`` mirrors the reference report model's snapshot
    of the caller-supplied knowledge base (mwcp/report.py:156-157,
    metadata.py:2938); ``recursive`` is always true for this pipeline
    (residual files are always dispatched).  ``include_file_data``
    (reference report.py:112,536-541) fills File elements' ``data``
    field with the base64 payload — requires the records to carry
    ``file_data`` (PipelineConfig.emit_file_data)."""
    import json as _json
    mentions = mentions_of(records)
    if include_file_data:
        # join the content-addressed payload bytes back onto file
        # mentions by the element's own sha256, then patch the canonical
        # JSON in place: sorted-key compact serialization guarantees
        # exactly one '"data":null' in a file payload
        payloads = (
            records.filter((F.col("kind") == "file_node")
                           & F.col("file_data").isNotNull())
            .select(
                F.col("file_sha256").alias("_fsha"),
                # some Spark builds MIME-chunk base64 with \r\n every
                # 76 chars (legacy.chunkBase64String) — strip
                # unconditionally so the JSON stays valid
                F.translate(F.base64("file_data"), "\r\n", "").alias("_b64"))
            .dropDuplicates(["_fsha"])
        )
        # join ONLY the file mentions (joining all mentions would
        # shuffle the whole set with every non-file row on a null key —
        # one hot partition); the untouched remainder unions back
        file_m = mentions.filter(F.col("pred") == "file")
        rest = mentions.filter(F.col("pred") != "file")
        patched = (
            file_m
            .withColumn("_fsha", F.get_json_object("obj", "$.sha256"))
            .join(payloads, "_fsha", "left")
            .withColumn(
                "obj",
                F.when(
                    F.col("_b64").isNotNull(),
                    F.regexp_replace(
                        "obj", '"data":null',
                        F.concat(F.lit('"data":"'), F.col("_b64"),
                                 F.lit('"'))),
                ).otherwise(F.col("obj")),
            )
            .drop("_fsha", "_b64")
        )
        mentions = rest.unionByName(patched)
    # '{"a":1}' -> '{"type":"<pred>","a":1}'
    entry = F.concat(
        F.lit('{"type":"'), F.col("pred"), F.lit('",'),
        F.expr("substring(obj, 2)"),
    )
    grouped = (
        mentions
        .select("root_sha256", entry.alias("entry"))
        .groupBy("root_sha256")
        .agg(F.array_sort(F.collect_set("entry")).alias("entries"))
    )
    # per-root log + error lists (reference report model fields
    # mwcp/metadata.py:2941-2942; logs include errors, reference
    # get_logs()/errors split).  Sorted for run determinism — the
    # reference compares reports order-insensitively anyway.  One pass:
    # conditional collect_lists (they skip nulls) instead of two filtered
    # groupBys + two joins.
    # identical content under N (repo,path,commit) rows runs the engine
    # N times, emitting N identical log sets: keep ONE run's logs — the
    # min-provenance row, the same pick the input_file block makes — so
    # report content is independent of how many provenance copies exist
    # (within-run duplicate messages are preserved, unlike a blanket
    # collect_set dedupe)
    per_prov = (
        records.filter(F.col("kind").isin("log", "error"))
        .groupBy("root_sha256", "repo", "path", "commit")
        .agg(
            F.array_sort(F.collect_list(
                F.when(F.col("kind") == "log", F.col("error")))).alias("logs"),
            F.array_sort(F.collect_list(
                F.when(F.col("kind") == "error", F.col("error")))).alias("errors"),
        )
    )
    logs_errors = (
        per_prov.groupBy("root_sha256")
        .agg(F.min(F.struct("repo", "path", "commit",
                            "logs", "errors")).alias("sel"))
        .select("root_sha256",
                F.col("sel.logs").alias("logs"),
                F.col("sel.errors").alias("errors"))
    )
    # identical content can arrive under several (repo, path, commit) rows;
    # pick provenance deterministically (min over the provenance struct)
    # instead of dropDuplicates' arbitrary first-seen row, so report_json
    # is stable across runs and partitionings.
    roots = (
        files_of(records)
        .filter(F.col("depth") == 0)
        .groupBy(F.col("sha256").alias("root_sha256"))
        .agg(
            F.min(
                F.struct(
                    "repo", "path", "commit", "parser",
                    F.col("md5").alias("input_md5"),
                    F.col("name").alias("input_name"),
                    F.col("description").alias("input_description"),
                )
            ).alias("prov")
        )
        .select(
            "root_sha256",
            F.col("prov.input_md5").alias("input_md5"),
            F.col("prov.input_name").alias("input_name"),
            F.col("prov.input_description").alias("input_description"),
            F.col("prov.repo").alias("repo"),
            F.col("prov.path").alias("path"),
            F.col("prov.commit").alias("commit"),
            F.col("prov.parser").alias("parser"),
        )
    )
    joined = (
        roots.join(grouped, "root_sha256", "left")
        .join(logs_errors, "root_sha256", "left")
    )
    entries = F.coalesce(F.col("entries"), F.array().cast("array<string>"))
    empty = F.array().cast("array<string>")
    logs_json = F.to_json(F.coalesce(F.col("logs"), empty))
    errors_json = F.to_json(F.coalesce(F.col("errors"), empty))
    input_file = F.to_json(
        F.struct(
            F.lit("file").alias("type"),
            F.col("input_name").alias("name"),
            F.col("input_description").alias("description"),
            F.col("input_md5").alias("md5"),
            F.col("root_sha256").alias("sha256"),
            F.col("repo").alias("repo"),
            F.col("path").alias("file_path"),
            F.col("commit").alias("commit"),
        ),
        {"ignoreNullFields": "false"},
    )
    # to_json handles escaping — a parser string with quotes or
    # backslashes must not corrupt the document
    parser_json = F.to_json(
        F.struct(F.coalesce(F.lit(parser), F.col("parser")).alias("parser")),
        {"ignoreNullFields": "false"},
    )
    report_json = F.concat(
        F.lit('{"type":"report","input_file":'), input_file,
        F.lit(","),
        parser_json.substr(F.lit(2), F.length(parser_json) - 2),
        F.lit(',"recursive":true,"external_knowledge":'),
        F.lit(_json.dumps(external_knowledge or {}, sort_keys=True,
                          separators=(",", ":"), default=_json_bytes)),
        F.lit(',"errors":'), errors_json,
        F.lit(',"logs":'), logs_json,
        F.lit(',"metadata":['), F.concat_ws(",", entries), F.lit("]}"),
    )
    return joined.select(
        "root_sha256",
        F.size(entries).alias("n_elements"),
        report_json.alias("report_json"),
    )
