"""Paired A/B: round-4 pagerank (per-iteration F.broadcast(outdeg), lazy)
vs round-5 pagerank (pre-normalized persisted edges_norm, eager final
checkpoint).  Interleaved rounds in ONE session so host-noise windows hit
both; evaluated with .count() like bench.py."""
import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, "/root/repo")
from kgmwcp.ops import graph  # noqa: E402
from kgmwcp.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def pagerank_r4(edges: DataFrame, iters=graph._PR_ITERS,
                damping=graph._PR_DAMPING) -> DataFrame:
    edges = edges.select("src", "dst", F.lit(1).alias("w"))
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("outdeg"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node"))).distinct())
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
    for i in range(iters):
        contrib = (
            ranks.join(edges, ranks.node == edges.src)
            .join(F.broadcast(outdeg), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("outdeg"))
                 .alias("contrib")))
        ranks = (
            ranks.select("node", "n_nodes")
            .join(contrib, "node", "left")
            .select("node", "n_nodes",
                    ((1.0 - damping) / F.col("n_nodes")
                     + damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                     ).alias("rank")))
        if (i + 1) % 4 == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank", "n_nodes")


def edges_of(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m = graph._mentions(docs)
    fwd = m.select(
        F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), "token").alias("dst"))
    return fwd.unionByName(fwd.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))


def main():
    spark = get_spark("ab_pagerank", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.range(1000).select(F.sum("id")).collect()
    times = {"r4_broadcast": [], "r5_norm": []}
    for r in range(ROUNDS):
        for name, fn in (("r4_broadcast", pagerank_r4),
                         ("r5_norm", graph.pagerank)):
            t0 = time.monotonic()
            n = fn(edges_of(spark)).count()
            dt = time.monotonic() - t0
            times[name].append(dt)
            print(f"round {r} {name:13s} {dt:6.2f}s rows={n}", flush=True)
    print("---")
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name:13s} median {ts[len(ts) // 2]:6.2f}s "
              f"all {[round(t, 2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
