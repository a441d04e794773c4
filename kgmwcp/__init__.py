"""kgmwcp — PySpark-native knowledge-graph construction with DC3-MWCP semantics.

A from-scratch Spark-first engine (NOT a port): MWCP-style malware-config
extraction re-expressed as vectorized Arrow/pandas UDF stages over a DataFrame
of source blobs ``(repo, path, commit, lang, content)``, emitting
``(subj=sample_sha256, pred=metadata_type, obj=canonical_value)`` triples,
entity linking / canonicalization, and nodes/edges materialization.

Reference semantics surveyed in SURVEY.md with file:line citations into
/root/reference (dod-cyber-crime-center/DC3-MWCP).
"""

__version__ = "0.1.0"

from kgmwcp.pipeline import Pipeline, PipelineConfig  # noqa: F401


def run(spark, docs, parser=None, knowledge_base=None, n_buckets=256,
        extract_partitions=None, router=False):
    """Library entry point mirroring the reference's ``mwcp.run``
    (mwcp/core.py:16-84): documents DataFrame in, KG tables out.

    ``parser`` restricts routing to one group (None = auto registry
    routing); ``router=True`` enables the JVM signature router stage
    (the YARA-routing analogue, stages/router.py).  Returns {"records",
    "mentions", "files", "triples", "nodes", "edges", "reports",
    "stix"} DataFrames (SURVEY.md §3.2).
    """
    from pyspark.sql import functions as F

    config = PipelineConfig(
        n_buckets=n_buckets,
        extract_partitions=extract_partitions,
        knowledge_base=dict(knowledge_base or {}),
        use_router=router,
    )
    if parser:
        docs = docs.withColumn("route", F.lit(parser))
    return Pipeline(config).run(docs)
