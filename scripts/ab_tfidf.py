"""A/B harness for the text_tfidf_topk join strategy (round-4 VERDICT #2).

Variants, interleaved rounds (CLAUDE.md persist rule — measure, don't
guess), evaluated with .count() like bench.py:

  base       — r4 shape: tf shuffle-joins df on the raw token key
  bc         — broadcast(df) small side, tf subtree still recomputed 3x
  bc_persist — persist tf, then broadcast(df)
  persist    — persist tf, shuffle join (isolates the persist effect)
"""
import sys
import time

from pyspark import StorageLevel
from pyspark.sql import SparkSession, Window, functions as F

sys.path.insert(0, "/root/repo")
from kgmwcp.ops.textops import _docs, _ws_tokens, _TFIDF_TOPK  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def tfidf(spark, sf_dir, broadcast_df: bool, persist_tf: bool):
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(_ws_tokens()).alias("raw_tok")
    ).select("doc_id", F.lower("raw_tok").alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    handle = None
    if persist_tf:
        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
        handle = tf
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n_docs"))
    right = F.broadcast(df) if broadcast_df else df
    scored = (
        tf.join(right, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 4),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    out = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_TOPK)
        .select("doc_id", "rnk", "tok", "tf", "df",
                F.col("score").alias("tfidf"))
    )
    return out, handle


VARIANTS = {
    "base": dict(broadcast_df=False, persist_tf=False),
    "bc": dict(broadcast_df=True, persist_tf=False),
    "bc_persist": dict(broadcast_df=True, persist_tf=True),
    "persist": dict(broadcast_df=False, persist_tf=True),
}


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("ab_tfidf")
        .getOrCreate()
    )
    spark.range(1000).select(F.sum("id")).collect()  # warm
    times = {k: [] for k in VARIANTS}
    for r in range(ROUNDS):
        for name, kw in VARIANTS.items():
            t0 = time.monotonic()
            out, handle = tfidf(spark, SF, **kw)
            n = out.count()
            dt = time.monotonic() - t0
            if handle is not None:
                handle.unpersist()
            times[name].append(dt)
            print(f"round {r} {name:11s} {dt:6.2f}s rows={n}", flush=True)
    print("---")
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name:11s} median {ts[len(ts) // 2]:6.2f}s  all {[round(t, 2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
