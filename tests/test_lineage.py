"""Checkpoint/lineage: idempotent resume after simulated mid-run failure."""

import pytest
from pyspark.sql import functions as F

from kgmwcp import fixtures
from kgmwcp.lineage import completed_buckets, read_manifest
from kgmwcp.pipeline import Pipeline, PipelineConfig


@pytest.fixture()
def corpus(spark):
    return fixtures.corpus_df(spark, replication=2, hot_rows=4)


def _triples_set(tables):
    return {
        (r["subj"], r["pred"], r["obj"])
        for r in tables["triples"].collect()
    }


def test_resume_after_partial_commit(spark, corpus, tmp_path):
    out = str(tmp_path / "run")
    pipe = Pipeline(PipelineConfig(n_buckets=8))

    # direct (non-checkpointed) run = ground truth
    expected = _triples_set(pipe.run(corpus))

    # crash mid-run: only 3 buckets committed to the manifest even though
    # the data write may have landed more
    pipe.run_checkpointed(spark, corpus, out, fail_after_buckets=3)
    assert len(completed_buckets(out)) == 3

    # resume: processes only the missing buckets, heals partial writes
    tables = pipe.run_checkpointed(spark, corpus, out)
    assert _triples_set(tables) == expected

    # every sample bucket committed exactly once — no duplicate manifest rows
    manifest = read_manifest(out)
    buckets = [e["bucket"] for e in manifest]
    assert len(buckets) == len(set(buckets))

    # re-running once more is a no-op (frontier empty) and stays identical
    tables2 = pipe.run_checkpointed(spark, corpus, out)
    assert _triples_set(tables2) == expected


def test_no_duplicate_records_after_resume(spark, corpus, tmp_path):
    out = str(tmp_path / "run2")
    pipe = Pipeline(PipelineConfig(n_buckets=8))
    pipe.run_checkpointed(spark, corpus, out, fail_after_buckets=2)
    tables = pipe.run_checkpointed(spark, corpus, out)
    records = tables["records"]
    dup = (
        records.filter(F.col("kind") == "mention")
        .groupBy("root_sha256", "subj", "pred", "obj", "repo", "path")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_torn_manifest_line_skipped(tmp_path):
    """A crash mid-manifest-write leaves a truncated trailing line; the
    resume path must skip it (the bucket just re-runs) instead of
    crashing every subsequent resume."""
    from kgmwcp import lineage

    p = tmp_path / "manifest.jsonl"
    p.write_text('{"bucket": 3, "status": "done"}\n{"bucket": 7, "n_ro')
    assert lineage.completed_buckets(str(tmp_path)) == {3}
