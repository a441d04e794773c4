"""Pipeline orchestration: documents -> samples -> records -> KG tables.

Spark lifecycle (SURVEY.md §3.3): stage0 hash+norm (Columns) -> stage2
extract+recurse (single mapInPandas) -> stage4 dedup -> stage5
canonicalize/link (salted) -> stage6 nodes/edges/triples/reports ->
lineage manifests + metrics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgmwcp.lineage import CheckpointedRun
from kgmwcp.stages.extract import extract_records
from kgmwcp.stages.ingest import prepare_samples
from kgmwcp.stages.router import route_samples
from kgmwcp.stages.link import (
    edges_of,
    files_of,
    mentions_of,
    nodes_of,
    triples_of,
)
from kgmwcp.stages.report import reports_of
from kgmwcp.stages.stix import stix_bundles_of

__all__ = ["Pipeline", "PipelineConfig"]


@dataclass
class PipelineConfig:
    n_buckets: int = 64
    salt_buckets: int = 16
    group_order: Optional[List[str]] = None
    knowledge_base: dict = field(default_factory=dict)
    # repartition the python stage's input so blob work spreads evenly and
    # decorrelates repo skew (one giant repo must not pin one task).
    extract_partitions: Optional[int] = None
    # signature router (stages/router.py, P10): JVM-side byte signatures
    # fill NULL routes so the python identify cascade first-tries the
    # right group; input-supplied routes still win.
    use_router: bool = False
    # YARA rule-repo routing (stages/yara_router.py, P10 full form —
    # reference runner.py:158-209): .yara files with mwcp= meta compiled
    # into Column predicates.  Takes the router slot when set; rules
    # outside the supported subset warn-and-skip (rows fall back to auto
    # dispatch, never silently misroute).
    yara_repo: Optional[str] = None
    # residual-file sink (reference report.py:861-885 writes output_file
    # children to disk): when on, file_node records carry the child's
    # payload bytes and a content-addressed `residuals` table is emitted.
    # Off by default — payload bytes through the records cache/shuffle is
    # a real cost you opt into, not a default at 100 TB.
    emit_file_data: bool = False
    # greedy dispatch (reference dispatcher.py:61-98): run EVERY matching
    # rule per file instead of first-match.
    greedy: bool = False
    # reference report.py:112,536-541: keep base64 payload bytes in File
    # report elements. Requires emit_file_data (bytes must be present).
    include_file_data: bool = False
    # external parser sources (reference mwcp/registry.py:171-198, CLI
    # --parser-dir): directories of out-of-tree Rule modules, re-imported
    # inside every extract worker (engine/registry.py).  Paths must be
    # visible on executors (shared FS or spark-submit --files).
    rule_dirs: tuple = ()
    # installed parser-collection packages (reference register_parser_
    # package / mwcp.parsers entry points): importable dotted names,
    # re-imported inside every extract worker.  Must be pip-installed on
    # executors (the reference's own discoverability requirement).
    rule_packages: tuple = ()


class Pipeline:
    def __init__(self, config: Optional[PipelineConfig] = None):
        self.config = config or PipelineConfig()

    # -- stages ----------------------------------------------------------
    def _yara_rules(self):
        """Compile the YARA repo once per Pipeline (driver-side only —
        the compiled Columns serialize into the plan, executors never
        need the rule files)."""
        if not hasattr(self, "_yara_cache"):
            from kgmwcp.stages.yara_router import compile_yara_repo

            self._yara_cache = compile_yara_repo(self.config.yara_repo)
        return self._yara_cache[0]

    @property
    def _routed(self) -> bool:
        return bool(self.config.use_router or self.config.yara_repo)

    def samples(self, docs: DataFrame) -> DataFrame:
        samples = prepare_samples(docs, n_buckets=self.config.n_buckets)
        if self.config.yara_repo:
            from kgmwcp.stages.yara_router import route_samples_yara

            samples = route_samples_yara(samples, self._yara_rules())
        elif self.config.use_router:
            samples = route_samples(samples)
        return samples

    def records(self, docs: DataFrame) -> DataFrame:
        samples = self.samples(docs)
        if self.config.extract_partitions:
            # spread by content hash, not by repo/path file layout
            samples = samples.repartition(self.config.extract_partitions, "sha256")
        return extract_records(
            samples,
            group_order=self.config.group_order,
            knowledge_base=self.config.knowledge_base,
            route_scope="root" if self._routed else "all",
            emit_file_data=self.config.emit_file_data,
            greedy=self.config.greedy,
            rule_dirs=self.config.rule_dirs,
            rule_packages=self.config.rule_packages,
        )

    # -- full run ----------------------------------------------------------
    def run(self, docs: DataFrame) -> Dict[str, DataFrame]:
        # Persist the extract-stage output: every KG table branches off it
        # (triples, nodes twice, edges twice) and without a barrier each
        # branch would re-run the Python extraction — verified via
        # executedPlan (2x MapInArrow). The checkpointed path gets the same
        # barrier for free from its parquet round-trip.
        from pyspark.storagelevel import StorageLevel

        records = self.records(docs).persist(StorageLevel.MEMORY_AND_DISK)
        return self.tables_from_records(records)

    def tables_from_records(self, records: DataFrame) -> Dict[str, DataFrame]:
        # Link-stage map-task sizing (r7, guide §2.2): the extract stage
        # fans out to extract_partitions (cpus*3 in the bench) so python
        # blob work balances, but carrying that fan-out into every
        # downstream shuffle multiplies the M x R block count — with M=96
        # map tasks each link aggregate measured ~3x the CPU of M=32 on
        # identical rows (fixed per-task + per-block shuffle-write cost).
        # coalesce() is a narrow op (no shuffle, reads N cached partitions
        # per task) and never increases the partition count, so small
        # inputs collapse to one task per core and real clusters keep
        # their scan parallelism.
        k = records.sparkSession.sparkContext.defaultParallelism
        linked = records.coalesce(k)
        tables = {
            "records": records,
            "mentions": mentions_of(records),
            "files": files_of(records),
            "triples": triples_of(linked),
            "nodes": nodes_of(linked, salt_buckets=self.config.salt_buckets),
            "edges": edges_of(linked),
            "reports": reports_of(
                linked, external_knowledge=self.config.knowledge_base,
                include_file_data=self.config.include_file_data),
            "stix": stix_bundles_of(linked),
        }
        if self.config.emit_file_data:
            tables["residuals"] = self.residuals_of(linked)
        return tables

    @staticmethod
    def residuals_of(records: DataFrame) -> DataFrame:
        """Content-addressed residual-file table: one row per distinct
        child payload (sha256-keyed — identical children extracted from
        many roots collapse to one row; a single shuffle on the
        high-cardinality hash).  Provenance picks min (name, description,
        derivation) so the row is deterministic across partitionings;
        bytes are identical for a given sha256 by construction."""
        residual = records.filter(
            (F.col("kind") == "file_node") & F.col("file_data").isNotNull())
        return (
            residual.groupBy(F.col("file_sha256").alias("sha256"))
            .agg(
                F.first("file_md5").alias("md5"),
                F.min(F.struct("file_name", "file_description",
                               "file_derivation")).alias("prov"),
                F.first("file_data").alias("data"),
                F.count(F.lit(1)).alias("n_sources"),
            )
            .select(
                "sha256", "md5",
                F.col("prov.file_name").alias("name"),
                F.col("prov.file_description").alias("description"),
                F.col("prov.file_derivation").alias("derivation"),
                "data", "n_sources",
            )
        )

    # -- checkpointed run ---------------------------------------------------
    def run_checkpointed(self, spark: SparkSession, docs: DataFrame,
                         out_dir: str,
                         fail_after_buckets: Optional[int] = None) -> Dict[str, DataFrame]:
        """Resumable run: skips committed buckets, heals partial writes."""
        ckpt = CheckpointedRun(spark, out_dir)
        samples = self.samples(docs)
        frontier = ckpt.frontier(samples)
        if self.config.extract_partitions:
            frontier = frontier.repartition(self.config.extract_partitions, "sha256")
        records = extract_records(
            frontier,
            group_order=self.config.group_order,
            knowledge_base=self.config.knowledge_base,
            route_scope="root" if self._routed else "all",
            emit_file_data=self.config.emit_file_data,
            greedy=self.config.greedy,
            rule_dirs=self.config.rule_dirs,
            rule_packages=self.config.rule_packages,
        )
        ckpt.write_records(records, fail_after_buckets=fail_after_buckets)
        committed = ckpt.read_records()
        return self.tables_from_records(committed)

    # -- metrics -------------------------------------------------------------
    @staticmethod
    def metrics(records: DataFrame) -> DataFrame:
        """Counters table (SURVEY.md R13): rows per kind/pred per bucket."""
        return (
            records.groupBy("bucket", "kind", "pred")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("bucket", "kind", "pred")
        )
