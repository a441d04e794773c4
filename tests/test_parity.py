"""Golden-triple parity gate: P/R == 1.0 on the full fixture corpus.

The golden set comes from kgmwcp/goldens.py — raw payloads + hashlib +
the reference's documented semantics, independent of the engine code
(FIXTURES.md §B golden_triples; the same derivation feeds the committed
golden/*.parquet DuckDB oracles).  The pipeline's triples table must
match it exactly (multiset, order-insensitive — the reference's own
compare semantics, mwcp/tests/test_parsers.py:308-312,364).
"""

import pytest

from kgmwcp import fixtures, goldens, parity
from kgmwcp.pipeline import Pipeline, PipelineConfig


def test_pipeline_triples_match_golden(spark):
    corpus = fixtures.corpus_df(spark, replication=1, hot_rows=1)
    pipe = Pipeline(PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"}))
    tables = pipe.run(corpus)
    produced = {(r["subj"], r["pred"], r["obj"]) for r in tables["triples"].collect()}
    golden = set(goldens.golden_triples(replication=1, hot_rows=1))

    precision, recall = parity.precision_recall_local(produced, golden)
    if (precision, recall) != (1.0, 1.0):
        only_p = sorted(produced - golden)[:5]
        only_g = sorted(golden - produced)[:5]
        pytest.fail(
            f"P={precision:.3f} R={recall:.3f}\n"
            f"only produced: {only_p}\nonly golden: {only_g}"
        )
    # the BASELINE.md bar is 0.95; we hold exact equality
    assert precision >= 0.95 and recall >= 0.95


def test_pipeline_nodes_match_golden(spark):
    """The salted two-phase nodes aggregate matches the python twin,
    including the deterministic (length, value) payload tie-break and the
    exact n_mentions / n_samples multiplicities."""
    corpus = fixtures.corpus_df(spark, replication=2, hot_rows=4)
    pipe = Pipeline(PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"}))
    produced = sorted(tuple(r) for r in pipe.run(corpus)["nodes"].collect())
    assert produced == goldens.golden_nodes(replication=2, hot_rows=4)


def test_distributed_precision_recall(spark):
    """The Spark-side P/R implementation agrees with the local one."""
    a = spark.createDataFrame(
        [("s1", "url", "x"), ("s1", "url", "y"), ("s2", "file", "z")],
        "subj string, pred string, obj string")
    b = spark.createDataFrame(
        [("s1", "url", "x"), ("s2", "file", "z"), ("s3", "other", "w")],
        "subj string, pred string, obj string")
    p, r = parity.precision_recall(a, b)
    assert (round(p, 4), round(r, 4)) == (round(2 / 3, 4), round(2 / 3, 4))
    assert parity.symmetric_diff(a, b).count() == 2
