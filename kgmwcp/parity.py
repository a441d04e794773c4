"""Triple parity metrics — the P/R ≥ 0.95 gate (BASELINE.md).

Order-insensitive multiset comparison of (subj, pred, obj) triples,
re-expressing the reference's golden-test compare
(mwcp/tests/test_parsers.py:308-312,364):
  precision = |produced ∩ golden| / |produced|
  recall    = |produced ∩ golden| / |golden|
Distributed form: full outer join on the triple key with per-side
multiplicities (``except_all`` in both directions being empty ⟺ P=R=1).
"""

from __future__ import annotations

from typing import Iterable, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["precision_recall", "precision_recall_local", "symmetric_diff"]


def precision_recall(produced: DataFrame, golden: DataFrame) -> Tuple[float, float]:
    """Multiset P/R over two (subj, pred, obj) DataFrames."""
    keys = ["subj", "pred", "obj"]
    p = produced.groupBy(keys).agg(F.count(F.lit(1)).alias("n_p"))
    g = golden.groupBy(keys).agg(F.count(F.lit(1)).alias("n_g"))
    joined = p.join(g, keys, "full_outer").select(
        F.coalesce("n_p", F.lit(0)).alias("n_p"),
        F.coalesce("n_g", F.lit(0)).alias("n_g"),
    )
    row = joined.agg(
        F.sum(F.least("n_p", "n_g")).alias("inter"),
        F.sum("n_p").alias("total_p"),
        F.sum("n_g").alias("total_g"),
    ).collect()[0]
    inter, total_p, total_g = row["inter"] or 0, row["total_p"] or 0, row["total_g"] or 0
    precision = inter / total_p if total_p else 1.0
    recall = inter / total_g if total_g else 1.0
    return precision, recall


def precision_recall_local(produced: Iterable[tuple], golden: Iterable[tuple]) -> Tuple[float, float]:
    """Same metric over plain triple iterables (test-side helper)."""
    from collections import Counter

    c_p, c_g = Counter(produced), Counter(golden)
    inter = sum((c_p & c_g).values())
    precision = inter / sum(c_p.values()) if c_p else 1.0
    recall = inter / sum(c_g.values()) if c_g else 1.0
    return precision, recall


def symmetric_diff(produced: DataFrame, golden: DataFrame) -> DataFrame:
    """Triples on exactly one side (diagnostics for parity misses)."""
    only_p = produced.exceptAll(golden).withColumn("side", F.lit("produced"))
    only_g = golden.exceptAll(produced).withColumn("side", F.lit("golden"))
    return only_p.unionByName(only_g)
