"""Structured Streaming ingest: stream output == batch output, and new
file drops are picked up incrementally with exactly-once progress."""

from pyspark.sql import functions as F

from kgmwcp import fixtures
from kgmwcp.pipeline import Pipeline, PipelineConfig
from kgmwcp.streaming.ingest import run_available_now


def _triples_set(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    config = PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"})

    corpus1 = fixtures.corpus_df(spark, replication=1, hot_rows=2)
    corpus1.write.mode("append").parquet(src)

    tables = run_available_now(spark, src, out, config)
    expected1 = _triples_set(Pipeline(config).run(corpus1)["triples"])
    assert _triples_set(tables["triples"]) == expected1

    # drop more files; availableNow drains only the new ones (checkpointed)
    corpus2 = fixtures.corpus_df(spark, replication=2, hot_rows=4).join(
        corpus1, ["repo", "path", "commit"], "left_anti"
    )
    corpus2.write.mode("append").parquet(src)
    tables2 = run_available_now(spark, src, out, config)

    expected_all = _triples_set(
        Pipeline(config).run(corpus1.unionByName(corpus2))["triples"]
    )
    assert _triples_set(tables2["triples"]) == expected_all

    # no duplicated records despite the two incremental drains
    records = spark.read.parquet(f"{out}/records")
    dup = (
        records.filter(F.col("kind") == "mention")
        .groupBy("root_sha256", "subj", "pred", "obj", "repo", "path")
        .count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
