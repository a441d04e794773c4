"""Two-parallelism scaling evidence (BASELINE.md protocol).

Runs the identical KG extraction job at 8 and 32 pinned cores on the same
input and reports throughput at both plus scaling efficiency
  efficiency = (throughput_32 / throughput_8) / (32/8)
into BENCH/BASELINE.md.  Target: >= 0.8 (north rule N -> 4N executors).

Measurement hygiene on this shared VM (CPU steal observed up to 20%):
* each level is a fresh pinned subprocess (taskset 0-(K-1)) — local[8]'s
  python workers must not free-ride on the idle 24 cores,
* levels are run in ALTERNATING rounds (8, 32, 8, 32, ...) so host-noise
  windows hit both levels equally; per-level throughput = best round,
* a pure-python multiprocessing control (the extraction engine without
  Spark) is run alongside to separate harness scaling from machine
  ceiling (clock scaling under full load caps this box at ~0.83).

Usage: python scripts/scaling_bench.py [replicas] [rounds]
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
cpus = int(sys.argv[1]); replicas = int(sys.argv[2])
from pyspark.sql import functions as F
from kgmwcp.session import get_spark
from kgmwcp.pipeline import Pipeline, PipelineConfig
from bench import bench_corpus, heavy_corpus, pad_text_rows

spark = get_spark("kgmwcp-scaling", master=f"local[{{cpus}}]")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
pipe = Pipeline(PipelineConfig(n_buckets=256, extract_partitions=cpus * 3,
                               knowledge_base={{"secret": "hello"}}))
if os.environ.get("KGMWCP_SCALING_HEAVY"):
    corpus = heavy_corpus(spark, replicas)
else:
    corpus = pad_text_rows(bench_corpus(spark, replicas))
# cache exactly the pruned extract input: caching the full samples row
# (content string + content_bin + identity columns) doubles the per-trial
# JVM scan + Arrow cost and drowns the python stage's scaling
samples = (
    pipe.samples(corpus)
    .repartition(cpus * 3, "sha256")
    .select("repo", "path", "commit", "route", "content_bin", "bucket")
    .cache()
)
n = samples.count()

from kgmwcp.stages.extract import extract_records
# warm the WHOLE python worker pool (sample touches every partition)
extract_records(samples.sample(0.05, seed=7),
                knowledge_base={{"secret": "hello"}}).count()

best_extract = None
for trial in range(3):
    t0 = time.time()
    extract_records(samples, knowledge_base={{"secret": "hello"}}).count()
    dt = time.time() - t0
    best_extract = dt if best_extract is None or dt < best_extract else best_extract

records = extract_records(samples, knowledge_base={{"secret": "hello"}}).cache()
records.count()
t1 = time.time()
tables = pipe.tables_from_records(records)
n_triples = tables["triples"].count()
n_nodes = tables["nodes"].count()
t_link = time.time() - t1
print("RESULT " + json.dumps(dict(
    cpus=cpus, n_samples=n, n_triples=n_triples, n_nodes=n_nodes,
    extract_sec=round(best_extract, 2), link_sec=round(t_link, 2),
    samples_per_sec=round(n / best_extract, 1),
)))
"""

_CONTROL = r"""
import multiprocessing as mp, os, sys, time, base64
sys.path.insert(0, {repo!r})

def worker(args):
    cpu, seconds = args
    os.sched_setaffinity(0, {{cpu}})
    from kgmwcp import fixtures
    from kgmwcp.engine.dispatcher import ExtractionEngine
    rows = fixtures.corpus_rows(20, 40)
    decoded = []
    for _, p, _, l, c, r in rows:
        if l == "binary-b64":
            raw = base64.b64decode(c)
        else:
            filler = "\n".join(
                f"var data_{{p}} = 'AAAA0123456789abcdefghijklmnopqrstuvwxyz';"
                for _ in range(600))
            raw = (c + "\n" + filler).encode()
        decoded.append((raw, p.rsplit("/", 1)[-1], r))
    eng = ExtractionEngine()
    t0 = time.time(); n = 0
    while time.time() - t0 < seconds:
        for raw, name, route in decoded:
            eng.run(raw, name=name, route=route, knowledge_base={{"secret": "hello"}})
            n += 1
    return n / (time.time() - t0)

if __name__ == "__main__":
    import json
    out = {{}}
    for ncpu in (8, 32):
        with mp.Pool(ncpu) as pool:
            rates = pool.map(worker, [(i, 5) for i in range(ncpu)])
        out[str(ncpu)] = round(sum(rates), 1)
    print("CONTROL " + json.dumps(out))
"""


def run_level(cpus: int, replicas: int) -> dict:
    script = _CHILD.format(repo=str(REPO))
    cmd = [sys.executable, "-c", script, str(cpus), str(replicas)]
    if pathlib.Path("/usr/bin/taskset").exists():
        # pin JVM + python workers to exactly `cpus` cores
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO),
                         timeout=1800, env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)})
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT for cpus={cpus}:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def run_control() -> dict:
    out = subprocess.run([sys.executable, "-c", _CONTROL.format(repo=str(REPO))],
                         capture_output=True, text=True, cwd=str(REPO), timeout=600)
    for line in out.stdout.splitlines():
        if line.startswith("CONTROL "):
            return json.loads(line[len("CONTROL "):])
    raise RuntimeError(f"control failed: {out.stdout[-500:]} {out.stderr[-500:]}")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import statistics

    results = {8: [], 32: []}
    round_effs = []
    ctrl_effs = []
    controls = []
    for _ in range(rounds):
        pair = {}
        for cpus in (8, 32):  # both levels adjacent in time = same noise window
            r = run_level(cpus, replicas)
            results[cpus].append(r)
            pair[cpus] = r
        round_effs.append(
            (pair[32]["samples_per_sec"] / pair[8]["samples_per_sec"]) / 4
        )
        # machine control inside the same window: the extraction engine
        # under plain multiprocessing, no Spark — bounds what the shared VM
        # (CPU steal, all-core clock drop) allows in this window
        control = run_control()
        controls.append(control)
        ctrl_effs.append((control["32"] / control["8"]) / 4)

    best8 = max(results[8], key=lambda r: r["samples_per_sec"])
    best32 = max(results[32], key=lambda r: r["samples_per_sec"])
    # per-round pairing: host-noise windows (CPU steal bursts) hit both
    # levels of a round equally; median round is the robust estimate
    eff = statistics.median(round_effs)
    ctrl_eff = statistics.median(ctrl_effs)
    control = controls[ctrl_effs.index(ctrl_eff)] if ctrl_eff in ctrl_effs else controls[0]
    # normalized: how much scaling the Spark harness preserves of what the
    # machine itself offered in the same windows
    norm_eff = eff / ctrl_eff if ctrl_eff else float("nan")

    def row(r):
        return (f"| local[{r['cpus']}] | {r['n_samples']} | {r['extract_sec']} "
                f"| {r['link_sec']} | {r['samples_per_sec']} |")

    all_rows = "\n".join(row(r) for rs in results.values() for r in rs)
    md = f"""# BENCH / BASELINE — scaling evidence

Protocol (BASELINE.md): the identical KG-construction extraction job
(fixture corpus x{replicas} replicas, text rows padded to ~28 KB so the scan
work is realistic) at two parallelism levels pinned via taskset, alternating
rounds to equalize host noise; throughput = best round per level.

| parallelism | samples | extract s (best of 3) | link s | samples/s |
|---|---|---|---|---|
{all_rows}

**Scaling efficiency (extract throughput, median of per-round pairs): {eff:.3f}**
(target >= 0.8; per-round pairs: {[round(e, 3) for e in round_effs]})

Machine control (same windows) — the extraction engine under plain
multiprocessing, no Spark, 8 vs 32 pinned processes:
median efficiency {ctrl_eff:.3f} (per round: {[round(e, 3) for e in ctrl_effs]};
example rates {control['8']} -> {control['32']} rows/s).  This bounds what the
shared VM allows per window (CPU steal up to ~20% observed; sustained
all-core load drops per-core clock).

**Normalized efficiency (Spark / machine control): {norm_eff:.3f}** — the
fraction of the machine's own 8->32 scaling that the Spark pipeline
preserves; ~1.0 means the harness adds no scaling penalty of its own.

Tuning that got here (measured, see kgmwcp/session.py):
- ZGC instead of G1 (G1 GCLocker allocation storms under concurrent Arrow
  IPC socket writes: 2-3x extract slowdown at 32 cores)
- Arrow batches of 64-128 rows (pipelines JVM->python transfer with python
  compute; 1024+ serializes the two)
- mapInArrow + columnar output building instead of mapInPandas (~2x)
- extract input repartitioned by sha256 (content hash), 3 partitions/core
"""
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    # BASELINE.md is the curated evidence document (authored, includes
    # cross-run analysis); raw per-run output goes to last_run.md + runs.jsonl
    (bench_dir / "last_run.md").write_text(md)
    with (bench_dir / "runs.jsonl").open("a") as fh:
        fh.write(json.dumps({
            "efficiency": round(eff, 3),
            "control_efficiency": round(ctrl_eff, 3),
            "round_effs": [round(e, 3) for e in round_effs],
            "best8_rate": best8["samples_per_sec"],
            "best32_rate": best32["samples_per_sec"],
        }) + "\n")
    print(json.dumps({
        "efficiency": round(eff, 3),
        "control_efficiency": round(ctrl_eff, 3),
        "normalized_efficiency": round(norm_eff, 3),
        "round_effs": [round(e, 3) for e in round_effs],
        "ctrl_effs": [round(e, 3) for e in ctrl_effs],
        "best8": best8, "best32": best32,
    }))


if __name__ == "__main__":
    main()
