"""Stage 2 — mention detect + row-local recursive unpack (mapInPandas).

This is the single Python stage of the pipeline.  Each Arrow batch of
sample blobs is run through the row-local ExtractionEngine (identify ->
run -> residual-file recursion, SURVEY.md §3.1 step 5); everything that
leaves this stage is plain columnar data, so all downstream stages stay
JVM-side.

Memory stays bounded: the iterator-of-DataFrames form never materializes a
whole partition of blobs, and the engine bounds per-root recursion
(MAX_DEPTH / MAX_FILES_PER_ROOT).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame

from kgmwcp.schema import EXTRACT_SCHEMA

__all__ = ["extract_records"]

_EXTRACT_COLUMNS = [f.name for f in EXTRACT_SCHEMA.fields]


def _record(**kwargs) -> dict:
    rec = dict.fromkeys(_EXTRACT_COLUMNS)
    rec.update(kwargs)
    return rec


def _process_batch(pdf: pd.DataFrame, group_order: Optional[List[str]],
                   knowledge_base: dict) -> pd.DataFrame:
    # Engine import stays inside the worker function so the kgmwcp package
    # resolves on executors shipped via --py-files (the analogue of the
    # reference's multiprocessing initializer, mwcp/utils/multi_proc.py:15-18).
    from kgmwcp.engine.dispatcher import ExtractionEngine

    engine = ExtractionEngine(group_order=group_order)
    out: List[dict] = []
    for row in pdf.itertuples(index=False):
        data = bytes(row.content_bin) if row.content_bin is not None else b""
        name = row.path.rsplit("/", 1)[-1] if row.path else None
        route = getattr(row, "route", None)
        result = engine.run(data, name=name, route=route or None,
                            knowledge_base=knowledge_base)
        root_sha = result.root.sha256
        common = dict(root_sha256=root_sha, repo=row.repo, path=row.path,
                      commit=row.commit, bucket=int(row.bucket))
        for source, pred, obj in result.triples:
            out.append(_record(
                kind="mention", subj=source.sha256, pred=pred, obj=obj,
                parser=source.rule.name() if source.rule else None, **common))
        for f in result.files:
            out.append(_record(
                kind="file_node", subj=f.sha256,
                file_sha256=f.sha256, file_md5=f.md5, file_name=f.name,
                file_description=f.description, file_derivation=f.derivation,
                parent_sha256=f.parent.sha256 if f.parent else None,
                depth=int(f.depth),
                parser=f.rule.name() if f.rule else None, **common))
        for err in result.errors:
            out.append(_record(kind="error", error=err, **common))
    return pd.DataFrame(out, columns=_EXTRACT_COLUMNS)


def extract_records(samples: DataFrame, group_order: Optional[List[str]] = None,
                    knowledge_base: Optional[dict] = None) -> DataFrame:
    """samples -> unified record stream (mentions + file tree + errors)."""
    kb = dict(knowledge_base or {})
    needed = ["repo", "path", "commit", "route", "content_bin", "bucket"]

    def mapper(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _process_batch(pdf, group_order, kb)

    # Column-prune before the Python stage so Arrow only ships what the
    # engine reads (content + provenance), never derived identity columns.
    return samples.select(*needed).mapInPandas(mapper, schema=EXTRACT_SCHEMA)
