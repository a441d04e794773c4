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
