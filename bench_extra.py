"""Extra measurement harness for the optimization rounds (guide §1).

bench.py is FROZEN (driver contract); everything exploratory lives here.

Modes:
  plans [out_dir] [op ...]   capture .explain("formatted") for bench ops
                             (default: all headline+extended) into out_dir
  time  [op ...]             per-op wall time with a noop sink, 2 passes
                             (cold then warm) so run-order effects are visible
  phases                     sub-phase breakdown of the heavy ops
                             (minhash, link, components)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def _spark():
    from kgmwcp.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("kgmwcp-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    return spark


def _bench_ops():
    import bench

    return bench.HEADLINE_OPS + bench.EXTENDED_OPS


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_plans(out_dir: str, ops: list[str]) -> None:
    import __spark_entry__ as entry_mod

    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    queries = entry_mod.queries()
    for name in ops or _bench_ops():
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {exc}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: plan captured ({time.time() - t0:.1f}s)", flush=True)


def cmd_time(ops: list[str]) -> None:
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    queries = entry_mod.queries()
    spark.range(1000).select(F.sum("id")).collect()
    names = ops or _bench_ops()
    results = {}
    for rnd in (0, 1):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} r{rnd}")
            t0 = time.time()
            queries[name](spark, sf_dir).count()
            results.setdefault(name, []).append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    for name in names:
        print(f"{name}: {results[name]}", flush=True)


def cmd_phases() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    spark.range(1000).select(F.sum("id")).collect()

    from kgmwcp.ops import dedup as _dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def t(label, thunk):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        thunk()
        dt = time.time() - t0
        print(f"  {label}: {dt:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        return dt

    print("== dedup_minhash_lsh phases ==", flush=True)
    t("shingles", lambda: _noop(_dedup._shingles_exploded(docs)))
    t("bands(sig)", lambda: _noop(_dedup._minhash_bands(docs)))
    t("full op", lambda: _dedup.q_dedup_minhash_lsh(spark, sf_dir).count())
    t("full op warm", lambda: _dedup.q_dedup_minhash_lsh(spark, sf_dir).count())

    print("== pipeline link phases ==", flush=True)
    import bench

    bench.release_cached_state(spark)
    from kgmwcp.pipeline import Pipeline, PipelineConfig
    from pyspark.storagelevel import StorageLevel

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pipe = Pipeline(PipelineConfig(
        n_buckets=256, extract_partitions=cpus * 3,
        knowledge_base={"secret": "hello"}))
    corpus = bench.bench_corpus(spark, 120).cache()
    t("corpus count", lambda: corpus.count())
    t("warm sample", lambda: pipe.records(corpus.sample(0.02, seed=7)).count())
    records = pipe.records(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    t("extract", lambda: records.count())
    tables = pipe.tables_from_records(records)
    t("triples count", lambda: tables["triples"].count())
    t("nodes count", lambda: tables["nodes"].count())
    t("edges count", lambda: tables["edges"].count())
    records.unpersist()
    corpus.unpersist()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "plans":
        out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r07/_scratch"
        cmd_plans(out_dir, sys.argv[3:])
    elif mode == "time":
        cmd_time(sys.argv[2:])
    elif mode == "phases":
        cmd_phases()
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
