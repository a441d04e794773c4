"""Paired extract-rate A/B across code versions (round-4 VERDICT item 9).

The r3->r4 pipeline extract regression signal (2.34 s -> 2.95 s) needed a
controlled check: same host window, alternating child processes running
the IDENTICAL extract benchmark from two checkouts (r3 = f74e290 in a
/tmp worktree, r5 = this repo).  Each child is a fresh Spark session
(fresh JVM, fresh python workers) timing exactly the bench.py extract
phase: cached+counted corpus, 2% warmup, then records.count().

Usage: python scripts/ab_extract_r3.py [r3_dir] [replicas] [rounds]
"""
import json
import subprocess
import sys

R3_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kgmwcp_r3"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 120
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
replicas = int(sys.argv[2])
from kgmwcp.session import get_spark
from kgmwcp.pipeline import Pipeline, PipelineConfig
from bench import bench_corpus
spark = get_spark("ab-extract", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "32")
pipe = Pipeline(PipelineConfig(n_buckets=256, extract_partitions=96,
                               knowledge_base={"secret": "hello"}))
corpus = bench_corpus(spark, replicas).cache()
n = corpus.count()
pipe.records(corpus.sample(0.02, seed=7)).count()
t0 = time.time()
pipe.records(corpus).count()
dt = time.time() - t0
print(json.dumps({"n": n, "extract_sec": round(dt, 3),
                  "samples_per_sec": round(n / dt, 1)}))
spark.stop()
"""


def run_child(repo_dir: str) -> dict:
    # PYTHONPATH + cwd must BOTH point at the checkout under test: the
    # driver-side sys.path.insert alone does not reach Spark's python
    # WORKERS (they resolve kgmwcp from their own sys.path — env + cwd —
    # so without this the hot extract path runs the same code in both
    # arms and the A/B measures nothing; review finding on the first
    # committed run of this script)
    import os

    env = dict(os.environ, PYTHONPATH=repo_dir)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, repo_dir, str(REPLICAS)],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo_dir)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    repos = {"r3": R3_DIR, "r5": "/root/repo"}
    res = {k: [] for k in repos}
    for rnd in range(ROUNDS):
        for name, d in repos.items():
            r = run_child(d)
            res[name].append(r)
            print(f"round {rnd} {name} {r}", flush=True)
    print("---")
    for name, rs in res.items():
        best = max(r["samples_per_sec"] for r in rs)
        med = sorted(r["extract_sec"] for r in rs)[len(rs) // 2]
        print(f"{name}: best {best} samples/s, median extract {med}s")


if __name__ == "__main__":
    main()
