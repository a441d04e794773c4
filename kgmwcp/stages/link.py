"""Stages 4-6 — dedupe, entity linking/canonicalization, graph materialize.

All JVM-side Column expressions (whole-stage codegen); the only shuffles are
the ones the semantics require: one distinct for triples (R1), one aggregate
for nodes (R5), one distinct for edges.  Hot-key skew (common mutexes,
127.0.0.1-class sockets) is absorbed by map-side partial aggregation plus an
explicit salted two-phase aggregate for the mention counts (SURVEY.md R17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "mentions_of", "files_of", "triples_of", "entities_of", "nodes_of",
    "edges_of", "canonical_value_expr",
]

# entity-bearing value per pred, extracted from the canonical obj JSON.
# get_json_object is JVM-side; no Python touches this path.
_VALUE_PATH = {
    "url": "$.url",
    "email_address": "$.value",
    "mutex": "$.value",
    "pipe": "$.value",
    "event": "$.value",
    "mission_id": "$.value",
    "user_agent": "$.value",
    "decoded_string": "$.value",
    "other": "$.value",
    "path": "$.path",
    "registry": "$.key",
    "file": "$.sha256",
}


def canonical_value_expr(pred_col, obj_col):
    """Entity canonical value: pred-specific field + IOC normalization.

    Normalization (entity linking, not triple identity): refang common
    defang patterns — bracketed separators [.] (.) {.} [:] [@] and the
    hxxp/hxxps scheme — then case-fold.  Real IOC corpora mix these
    freely; without refang one C2 splits into several entities.  The
    socket entity key is address:port like the reference's
    network-traffic uuid5 seed f"{address}//{port}//..."
    (mwcp/metadata.py:1010-1016).  Twin: kgmwcp/goldens.py
    canonical_value — keep the two regexes identical.
    """
    value = F.when(
        pred_col == "socket",
        F.concat_ws(
            ":",
            F.get_json_object(obj_col, "$.address"),
            F.coalesce(F.get_json_object(obj_col, "$.port"), F.lit("")),
        ),
    ).when(
        pred_col == "network",
        F.get_json_object(obj_col, "$.url.url"),
    )
    for pred, path in _VALUE_PATH.items():
        value = value.when(pred_col == pred, F.get_json_object(obj_col, path))
    value = value.otherwise(obj_col)
    refanged = F.regexp_replace(
        F.regexp_replace(value, r"[\[({]([.:@])[\])}]", "$1"),
        "(?i)^hxxp", "http",
    )
    return F.lower(refanged)


def mentions_of(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "mention")


def files_of(records: DataFrame) -> DataFrame:
    return (
        records.filter(F.col("kind") == "file_node")
        .select(
            "root_sha256",
            F.col("file_sha256").alias("sha256"),
            F.col("file_md5").alias("md5"),
            F.col("file_name").alias("name"),
            F.col("file_description").alias("description"),
            F.col("file_derivation").alias("derivation"),
            "parent_sha256", "depth", "repo", "path", "commit", "parser",
        )
    )


def triples_of(records: DataFrame) -> DataFrame:
    """(subj, pred, obj) with cross-sample dedupe (SURVEY.md R1).

    The engine already dedupes per source; identical content appearing in
    several repos yields identical triples which this distinct collapses.
    """
    return mentions_of(records).select("subj", "pred", "obj").dropDuplicates(
        ["subj", "pred", "obj"]
    )


def entities_of(records: DataFrame) -> DataFrame:
    """Per-mention entity key columns (no shuffle yet).

    nodes_of and edges_of each re-derive this from the records cache
    rather than sharing a second persist: measured at replication=600 on
    local[32], link with an entities cache is ~1.5x SLOWER (4.9s vs
    3.2s) — materializing + scanning a second wide string cache costs
    more than re-running the codegen'd get_json_object battery over the
    already-cached records."""
    m = mentions_of(records)
    canonical = canonical_value_expr(F.col("pred"), F.col("obj"))
    return (
        m.select("subj", "pred", "obj", "repo")
        .withColumn("canonical_value", canonical)
        .withColumn(
            "entity_id",
            F.sha2(F.concat_ws("//", F.col("pred"), F.col("canonical_value")), 256),
        )
    )


def nodes_of(records: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Canonical entity table (SURVEY.md R5 + R17).

    Two-phase aggregation keyed (entity_id, subj) then entity_id —
    the minimal-shuffle plan for these semantics (r7, guide §2.4): the
    former shape (salted partial + merge + a separate dedupe/count/join
    branch for n_samples) spent 4 exchanges and a sort-merge join; this
    one spends exactly 2 exchanges and no join.  Skew: phase 1's key
    carries ``subj``, which spreads a hot entity (one mutex mentioned by
    millions of samples) over the full reducer space — strictly wider
    than the old crc32(subj)%%16 salt — and phase 2 receives the hot
    entity as a GROUP key, which map-side partial aggregation reduces to
    one row per map task before the exchange (a hot aggregate key is not
    a hot join key).  ``salt_buckets`` is kept for config compatibility;
    subj itself now plays the salt role.  max_by(payload, length) keeps
    the richest serialization, mirroring the STIX writer's
    longest-serialization dedupe (mwcp/stix/report_writer.py:142-150);
    ties on payload length break lexicographically (max (length, value)
    struct) so the picked payload is deterministic across partitionings —
    required for the golden-parquet oracle compare (kgmwcp/goldens.py).
    n_mentions (sum of per-subj counts) and n_samples (count of
    (entity_id, subj) groups) are exact; max/first are associative /
    constant per entity, so the output rows are bit-identical to the
    old plan's.
    """
    ent = entities_of(records)

    def _richest(col: str):
        return F.max_by(
            col, F.struct(F.length(col).alias("l"), F.col(col).alias("v")))

    per_subj = (
        ent.groupBy("entity_id", "subj")
        .agg(
            F.first("pred").alias("entity_kind"),
            F.first("canonical_value").alias("canonical_value"),
            _richest("obj").alias("payload"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return per_subj.groupBy("entity_id").agg(
        F.first("entity_kind").alias("entity_kind"),
        F.first("canonical_value").alias("canonical_value"),
        _richest("payload").alias("payload"),
        F.sum("cnt").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_samples"),
    ).select(
        "entity_id", "entity_kind", "canonical_value", "payload",
        "n_mentions", "n_samples",
    )


def edges_of(records: DataFrame) -> DataFrame:
    """(sample)-[pred]->(entity) mention edges + (parent)-[dispatched]->(child)
    file-derivation edges (mwcp/dispatcher.py:160-170)."""
    # min(repo) instead of dropDuplicates + carried repo: identical
    # content in two repos yields equal (src, rel, dst) rows whose
    # surviving repo would otherwise be partitioning-dependent —
    # edges must be byte-deterministic like every other table
    ent = entities_of(records)
    mention_edges = (
        ent.select(
            F.col("subj").alias("src"),
            F.col("pred").alias("rel"),
            F.col("entity_id").alias("dst"),
            "repo",
        )
        .groupBy("src", "rel", "dst")
        .agg(F.min("repo").alias("repo"))
    )
    file_edges = (
        files_of(records)
        .filter(F.col("parent_sha256").isNotNull())
        .select(
            F.col("parent_sha256").alias("src"),
            F.lit("dispatched").alias("rel"),
            F.col("sha256").alias("dst"),
            "repo",
        )
        .groupBy("src", "rel", "dst")
        .agg(F.min("repo").alias("repo"))
    )
    return mention_edges.unionByName(file_edges)
