"""Similarity search over the ``embeddings`` table (array<float> column).

* brute-force cosine top-k — the correctness baseline, pure Column math
  (zip_with + aggregate, JVM-side, no UDF),
* IVF-style coarse quantization (label-bucketed two-stage search) — the
  scale path: centroid ranking prunes the candidate set before the
  exact pass,
* embedding near-dup pairs (cosine threshold within probe set).

Cosines are computed in double and rounded to 4 dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["QUERIES", "ORACLES", "cosine_expr"]


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def cosine_expr(a: str, b: str):
    """cos(a, b) as a Column over two array<float> columns (double math)."""
    da = f"transform({a}, x -> CAST(x AS DOUBLE))"
    db = f"transform({b}, x -> CAST(x AS DOUBLE))"
    dot = f"aggregate(zip_with({da}, {db}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({da}, 0D, (acc, v) -> acc + v * v))"
    nb = f"sqrt(aggregate({db}, 0D, (acc, v) -> acc + v * v))"
    return F.expr(f"({dot}) / (({na}) * ({nb}))")


def _query_vec(emb: DataFrame, vec_id: int = 0) -> DataFrame:
    return emb.filter(F.col("vec_id") == vec_id).select(
        F.col("embedding").alias("q_embedding")
    )


# -- brute-force cosine top-k -----------------------------------------------------

def q_ann_topk_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    query = _query_vec(emb)
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .withColumn("cos", F.round(cosine_expr("embedding", "q_embedding"), 4))
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", "cos")
    )


SQL_ANN_TOPK_BRUTEFORCE = """
SELECT e.vec_id, e.label,
       round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cos
FROM embeddings e,
     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE e.vec_id <> 0
ORDER BY cos DESC, e.vec_id ASC
LIMIT 10
"""


# -- IVF-style two-stage search (scale path) -----------------------------------------
# coarse: rank label-centroids by query similarity, keep top-3 labels;
# fine: exact cosine within the surviving labels only.  At 100 TB the fine
# pass touches ~3/n_labels of the corpus instead of all of it.

def q_ann_ivf(spark, sf_dir, n_probe: int = 3, k: int = 10):
    emb = _emb(spark, sf_dir)
    query = _query_vec(emb)
    dims = (
        emb.select("vec_id", "label", F.posexplode("embedding").alias("pos", "val"))
    )
    centroids = (
        dims.groupBy("label", "pos")
        .agg(F.avg("val").alias("cval"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pairs"))
        .select(
            "label",
            F.expr("transform(pairs, p -> p.cval)").alias("centroid"),
        )
    )
    coarse = (
        centroids.crossJoin(F.broadcast(query))
        .withColumn("ccos", cosine_expr("centroid", "q_embedding"))
        .orderBy(F.col("ccos").desc(), F.col("label").asc())
        .limit(n_probe)
        .select("label")
    )
    fine = (
        emb.join(F.broadcast(coarse), "label")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .withColumn("cos", F.round(cosine_expr("embedding", "q_embedding"), 4))
    )
    return (
        fine.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", "label", "cos")
    )


SQL_ANN_IVF = """
WITH q AS (
  SELECT embedding FROM embeddings WHERE vec_id = 0
), dims AS (
  SELECT label, u.pos, u.val
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS val,
                       generate_subscripts(embedding, 1) AS pos) u
), centroids AS (
  SELECT label, list(avg_val ORDER BY pos) AS centroid
  FROM (
    SELECT label, pos, avg(val) AS avg_val FROM dims GROUP BY label, pos
  ) GROUP BY label
), coarse AS (
  SELECT label
  FROM centroids, q
  ORDER BY list_cosine_similarity(centroid, q.embedding) DESC, label ASC
  LIMIT 3
)
SELECT e.vec_id, e.label,
       round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cos
FROM embeddings e JOIN coarse USING (label), q
WHERE e.vec_id <> 0
ORDER BY cos DESC, e.vec_id ASC
LIMIT 10
"""


# -- embedding near-dup pairs ---------------------------------------------------------

def q_dedup_embedding_cosine(spark, sf_dir, threshold: float = 0.8):
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").alias("probe_embedding"),
    )
    pairs = (
        emb.join(
            F.broadcast(probes),
            (F.col("label") == F.col("probe_label"))
            & (F.col("vec_id") > F.col("probe_id")),
        )
        .withColumn("cos", F.round(cosine_expr("embedding", "probe_embedding"), 4))
        .filter(F.col("cos") >= threshold)
        .select("probe_id", "vec_id", "cos")
    )
    return pairs


SQL_DEDUP_EMBEDDING_COSINE = """
SELECT p.vec_id AS probe_id, e.vec_id,
       round(list_cosine_similarity(e.embedding, p.embedding), 4) AS cos
FROM embeddings e
JOIN embeddings p
  ON e.label = p.label AND e.vec_id > p.vec_id AND p.vec_id % 50 = 0
WHERE round(list_cosine_similarity(e.embedding, p.embedding), 4) >= 0.8
"""


QUERIES = {
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    "ann_ivf": q_ann_ivf,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
}

ORACLES = {
    "ann_topk_bruteforce": SQL_ANN_TOPK_BRUTEFORCE,
    "ann_ivf": SQL_ANN_IVF,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING_COSINE,
}
