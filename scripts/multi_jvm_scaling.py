"""Multi-JVM scaling evidence — the topology a real cluster has.

The paired-level bench (scaling_bench.py) runs 8 -> 32 cores inside ONE
JVM; in clean host windows it measures ~0.65-0.75 extract-stage
efficiency while the pure-python control scales ~1.0 — i.e. the limiter
is the single local-mode JVM (all 32 tasks' Arrow feeds and GC share one
process), not the engine or the machine.  A 1000-executor cluster never
runs one 32-thread JVM: it runs many ~5-8-core executor JVMs.  This
script measures that topology directly on one box:

  level A: one   local[8] JVM pinned to cores 0-7          -> rate R1
  level B: four  local[8] JVMs pinned to disjoint 8-core    -> sum(R_i)
           sets (0-7 / 8-15 / 16-23 / 24-31), run concurrently,
           each on its own (equal) corpus

  efficiency(8 -> 32 cores, executor topology) = sum(R_i) / (4 * R1)

Levels alternate A,B,A,B (same hygiene as scaling_bench.py) and each
level's rate is the best round.  Driver memory is capped per JVM so four
instances fit the box.

Usage: python scripts/multi_jvm_scaling.py [replicas] [rounds]
Writes BENCH/multi_jvm_last.md and appends BENCH/runs.jsonl.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
replicas = int(sys.argv[1])
from pyspark.sql import SparkSession
from kgmwcp.session import tune
builder = (SparkSession.builder.appName("kgmwcp-mjvm")
           .master("local[8]")
           .config("spark.driver.memory", "12g")
           .config("spark.driver.maxResultSize", "2g"))
spark = tune(builder).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
from kgmwcp.pipeline import Pipeline, PipelineConfig
from kgmwcp.stages.extract import extract_records
from bench import heavy_corpus
pipe = Pipeline(PipelineConfig(n_buckets=64, extract_partitions=24,
                               knowledge_base={{"secret": "hello"}}))
corpus = heavy_corpus(spark, replicas)
samples = (
    pipe.samples(corpus)
    .repartition(24, "sha256")
    .select("repo", "path", "commit", "route", "content_bin", "bucket")
    .cache()
)
n = samples.count()
extract_records(samples.sample(0.05, seed=7),
                knowledge_base={{"secret": "hello"}}).count()
best = None
for trial in range(2):
    t0 = time.time()
    extract_records(samples, knowledge_base={{"secret": "hello"}}).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print("RESULT " + json.dumps(dict(
    n_samples=n, extract_sec=round(best, 2),
    samples_per_sec=round(n / best, 1),
)))
"""


def _cmd(core_range: str, replicas: int):
    script = _CHILD.format(repo=str(REPO))
    cmd = [sys.executable, "-c", script, str(replicas)]
    if pathlib.Path("/usr/bin/taskset").exists():
        cmd = ["taskset", "-c", core_range] + cmd
    return cmd


def _parse(out: subprocess.CompletedProcess) -> dict:
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT:\n{out.stdout[-1200:]}\n{out.stderr[-1200:]}")


def run_single(replicas: int) -> float:
    out = subprocess.run(_cmd("0-7", replicas), capture_output=True,
                         text=True, cwd=str(REPO), timeout=1800)
    return _parse(out)["samples_per_sec"]


def run_quad(replicas: int) -> float:
    ranges = ["0-7", "8-15", "16-23", "24-31"]
    procs = [subprocess.Popen(_cmd(r, replicas), stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True,
                              cwd=str(REPO)) for r in ranges]
    total = 0.0
    for p in procs:
        stdout, stderr = p.communicate(timeout=1800)
        total += _parse(subprocess.CompletedProcess(
            p.args, p.returncode, stdout, stderr))["samples_per_sec"]
    return total


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    singles, quads, round_effs = [], [], []
    for rnd in range(rounds):
        r1 = run_single(replicas)
        rq = run_quad(replicas)
        singles.append(r1)
        quads.append(rq)
        round_effs.append(round(rq / (4 * r1), 3))
        print(f"round {rnd}: single8={r1:.1f}/s quad8x4={rq:.1f}/s "
              f"eff={round_effs[-1]}", flush=True)
    best1, bestq = max(singles), max(quads)
    eff = round(bestq / (4 * best1), 3)
    result = dict(kind="multi_jvm", efficiency=eff, round_effs=round_effs,
                  best_single8=best1, best_quad8x4=bestq,
                  replicas=replicas)
    print(json.dumps(result))
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    with open(bench_dir / "runs.jsonl", "a") as fh:
        fh.write(json.dumps(result) + "\n")
    (bench_dir / "multi_jvm_last.md").write_text(
        f"""# Multi-JVM scaling (executor topology), last run

| level | topology | best samples/s |
|---|---|---|
| 8 cores | 1x local[8] JVM (cores 0-7) | {best1:.1f} |
| 32 cores | 4x local[8] JVMs (disjoint 8-core sets) | {bestq:.1f} |

efficiency(8 -> 32, executor topology) = {eff}
per-round: {round_effs}
(replicas={replicas}; decrypt-heavy corpus; alternating rounds)
""")


if __name__ == "__main__":
    main()
