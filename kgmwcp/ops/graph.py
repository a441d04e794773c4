"""Graph analytics over the constructed knowledge graph — PageRank on the
doc↔entity mention graph (the KG analogue of ranking hot IOC entities the
way the reference's report consumers rank common C2 infrastructure across
samples; cf. /root/reference/mwcp/report.py aggregation semantics).

Scale shape: each power-iteration round is one join (ranks → edges on
``src``) plus one sum-aggregate on ``dst`` — the canonical shuffle-per-
iteration PageRank plan.  Edge lists partition by src/dst hash; hot
entities (a token mentioned by every doc) are *receivers* of a sum
aggregate, which Spark computes with map-side partial aggregation, so a
high-in-degree node is NOT a skew problem (unlike a hot join key).  The
iteration count is fixed (``_PR_ITERS``) so the DuckDB oracle can unroll
the exact same rounds as chained CTEs — no recursive-CTE aggregation
restrictions, bit-comparable at 4 dp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

__all__ = ["QUERIES", "ORACLES", "pagerank"]

_PR_ITERS = 5
_PR_DAMPING = 0.85

_KEYWORDS_RX = r"\b(spark|join|merge|hash|scan|window|stream)\b"


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pagerank(edges: DataFrame, iters: int = _PR_ITERS,
             damping: float = _PR_DAMPING,
             weight: str | None = None) -> DataFrame:
    """PageRank over an (src, dst[, w]) edge list, optionally weighted.

    Returns (node, rank, n_nodes) over the nodes that appear in
    ``edges``, initialized uniformly at 1/N.  Ranks sum to 1 only on
    graphs with no dangling nodes (sinks leak their mass each round —
    there is NO renormalization step; the dangling-node test pins the
    leak).  Every iteration: contribution = rank/outdeg flowing along
    each edge, summed per dst, damped; nodes with no in-edges keep the
    teleport term.  Generic over any edge table — the queries below feed
    it the doc↔entity mention graph and the real pipeline's triples; the
    production KG feeds it nodes/edges from stages/link.py.  ``n_nodes``
    rides along so callers can normalize without re-aggregating the edge
    lineage.

    ``weight`` names an integer edge-weight column: contributions become
    rank·w/Σw(out-edges).  The unweighted path is the same arithmetic
    with w=1 (rank·1/Σ1 is bit-identical to rank/outdeg), so one code
    path serves both and the unweighted oracles stay valid.
    """
    if weight is None:
        edges = edges.select("src", "dst", F.lit(1).alias("w"))
    else:
        edges = edges.select("src", "dst", F.col(weight).alias("w"))
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    # carry the scalar as a column (broadcast 1-row cross join, no collect)
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for i in range(iters):
        contrib = (
            ranks.join(edges, ranks.node == edges.src)
            .join(F.broadcast(outdeg), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("outdeg"))
                 .alias("contrib"))
        )
        ranks = (
            ranks.select("node", "n_nodes")
            .join(contrib, "node", "left")
            .select(
                "node",
                "n_nodes",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % 4 == 0:
            # truncate the join-per-round lineage like dedup_cluster does
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank", "n_nodes")


def _mentions(docs):
    """Distinct (doc_id, token) keyword mentions (T1-shape extract)."""
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(_KEYWORDS_RX), 1)
            ).alias("token"),
        )
        .filter(F.col("token") != "scan")
        .dropDuplicates(["doc_id", "token"])
    )


def q_kg_pagerank(spark, sf_dir):
    """PageRank over the bipartite doc↔entity mention graph: nodes are
    ``d:<doc_id>`` and ``t:<token>``, one edge each way per distinct
    mention.  Output rank is scaled by N (mean-normalized) and rounded
    to 4 dp for engine-portable hashing."""
    docs = _docs(spark, sf_dir)
    mentions = _mentions(docs)
    fwd = mentions.select(
        F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), "token").alias("dst"),
    )
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"),
                                       F.col("src").alias("dst")))
    return pagerank(edges).select(
        "node",
        F.round(F.col("rank") * F.col("n_nodes"), 4).alias("rank_norm"),
    )


def _pr_unrolled(with_edges_head: str, weighted: bool = False) -> str:
    """Unrolled power-iteration CTE chain mirroring pagerank() exactly.

    ``with_edges_head`` must open a WITH clause whose last CTE is
    ``edges(src, dst)`` — or ``edges(src, dst, w)`` with ``weighted`` —
    and the generator appends the degree/teleport machinery plus
    _PR_ITERS identical rounds."""
    d = _PR_DAMPING
    if weighted:
        deg = "outdeg AS (SELECT src, sum(w) AS outdeg FROM edges GROUP BY src)"
        num = "p.rank * e.w"
    else:
        deg = "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)"
        num = "p.rank"
    core = f""",
{deg},
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
pr0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for i in range(_PR_ITERS):
        steps.append(f""",
pr{i + 1} AS (
  SELECT nodes.node,
         (1.0::DOUBLE - {d}) / (SELECT n FROM nn)
         + {d} * coalesce(c.contrib, 0.0::DOUBLE) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, sum({num} / o.outdeg) AS contrib
    FROM pr{i} p JOIN edges e ON e.src = p.node
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nodes.node
)""")
    tail = f"""
SELECT node, round(rank * (SELECT n FROM nn), 4) AS rank_norm FROM pr{_PR_ITERS}
"""
    return with_edges_head + core + "".join(steps) + tail


SQL_KG_PAGERANK = _pr_unrolled(r"""
WITH mentions AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text),
                  '\b(spark|join|merge|hash|scan|window|stream)\b')) AS token
    FROM documents
  ) WHERE token <> 'scan'
),
edges AS (
  SELECT 'd:' || CAST(doc_id AS VARCHAR) AS src, 't:' || token AS dst FROM mentions
  UNION ALL
  SELECT 't:' || token, 'd:' || CAST(doc_id AS VARCHAR) FROM mentions
)""")


# -- PageRank over the ACTUAL constructed knowledge graph ---------------------
# The flagship composition: run the real extract+link pipeline on the
# fixture corpus, take its (subj, pred, obj) triples as a bipartite
# sample↔entity graph, and rank with the same pagerank().  The oracle is
# fully engine-independent: the identical unrolled-CTE power iteration
# over the committed golden triples parquet (kgmwcp/goldens.py derives it
# from raw payloads with no engine code; pipeline==golden is separately
# hash-pinned by the pipeline_fixture_triples row) — so this row proves
# extraction AND graph analytics compose end-to-end.

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def q_kg_pagerank_pipeline(spark, sf_dir):
    from kgmwcp import fixtures

    triples = fixtures.golden_pipeline_tables(spark)["triples"]
    fwd = triples.select(
        F.concat(F.lit("s:"), "subj").alias("src"),
        F.concat(F.lit("e:"), "pred", F.lit("//"), "obj").alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges).select(
        "node",
        F.round(F.col("rank") * F.col("n_nodes"), 4).alias("rank_norm"),
    )


def _sql_kg_pagerank_pipeline() -> str:
    g = os.path.join(_REPO_ROOT, "golden")
    return _pr_unrolled(f"""
WITH triples AS (
  SELECT subj, pred, obj FROM read_parquet('{g}/pipeline_triples.parquet')
),
fwd AS (
  SELECT 's:' || subj AS src, 'e:' || pred || '//' || obj AS dst FROM triples
),
edges AS (
  SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd
)""")


SQL_KG_PAGERANK_PIPELINE = _sql_kg_pagerank_pipeline()


# -- weighted PageRank (term-frequency edges) ---------------------------------
# Same machinery, weighted: the doc↔token edge carries the token's
# occurrence count in the doc (not just distinct presence), so a doc
# that mentions an entity 40 times routes proportionally more rank to
# it — the shape entity-importance ranking actually uses on a KG whose
# mention edges carry counts (stages/link.py's n_mentions).

def q_kg_pagerank_weighted(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    mentions_w = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(_KEYWORDS_RX), 1)
            ).alias("token"),
        )
        .filter(F.col("token") != "scan")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    fwd = mentions_w.select(
        F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), "token").alias("dst"),
        "w",
    )
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"),
                                       F.col("src").alias("dst"), "w"))
    return pagerank(edges, weight="w").select(
        "node",
        F.round(F.col("rank") * F.col("n_nodes"), 4).alias("rank_norm"),
    )


SQL_KG_PAGERANK_WEIGHTED = _pr_unrolled(r"""
WITH mentions_w AS (
  SELECT doc_id, token, count(*) AS w FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text),
                  '\b(spark|join|merge|hash|scan|window|stream)\b')) AS token
    FROM documents
  ) WHERE token <> 'scan' GROUP BY doc_id, token
),
edges AS (
  SELECT 'd:' || CAST(doc_id AS VARCHAR) AS src, 't:' || token AS dst, w
  FROM mentions_w
  UNION ALL
  SELECT 't:' || token, 'd:' || CAST(doc_id AS VARCHAR), w FROM mentions_w
)""", weighted=True)


# -- KG snapshot diff ---------------------------------------------------------
# The daily KG-update shape: two snapshots of the mention-triple table
# (yesterday = docs with doc_id % 10 != 0, today = docs with doc_id % 10
# != 9 — each side has exclusive docs, so both 'added' and 'removed'
# rows exist) diffed into a change feed.  Two anti-joins on the full
# triple key — at 100 TB both snapshots would be bucketed by subj so the
# anti-joins are co-located merge joins with no shuffle of the big side.

def q_kg_triples_diff(spark, sf_dir):
    m = _mentions(_docs(spark, sf_dir))
    old = m.filter(F.col("doc_id") % 10 != 0)
    new = m.filter(F.col("doc_id") % 10 != 9)
    key = ["doc_id", "token"]
    added = new.join(old, key, "left_anti").select(
        F.lit("added").alias("change"), *key)
    removed = old.join(new, key, "left_anti").select(
        F.lit("removed").alias("change"), *key)
    return added.unionByName(removed)


SQL_KG_TRIPLES_DIFF = r"""
WITH m AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text),
                  '\b(spark|join|merge|hash|scan|window|stream)\b')) AS token
    FROM documents
  ) WHERE token <> 'scan'
),
old AS (SELECT * FROM m WHERE doc_id % 10 <> 0),
new AS (SELECT * FROM m WHERE doc_id % 10 <> 9)
SELECT 'added' AS change, doc_id, token
FROM new WHERE NOT EXISTS (SELECT 1 FROM old
                           WHERE old.doc_id = new.doc_id
                             AND old.token = new.token)
UNION ALL
SELECT 'removed', doc_id, token
FROM old WHERE NOT EXISTS (SELECT 1 FROM new
                           WHERE new.doc_id = old.doc_id
                             AND new.token = old.token)
"""


QUERIES = {
    "kg_pagerank": q_kg_pagerank,
    "kg_pagerank_weighted": q_kg_pagerank_weighted,
    "kg_pagerank_pipeline": q_kg_pagerank_pipeline,
    "kg_triples_diff": q_kg_triples_diff,
}

ORACLES = {
    "kg_pagerank": SQL_KG_PAGERANK,
    "kg_pagerank_weighted": SQL_KG_PAGERANK_WEIGHTED,
    "kg_pagerank_pipeline": SQL_KG_PAGERANK_PIPELINE,
    "kg_triples_diff": SQL_KG_TRIPLES_DIFF,
}
