"""Paired per-op A/B across code versions (round-5 VERDICT #3).

The r5 driver bench sample inflated three ops 2-6x vs their own clean
band (curate_corpus 6.9->21.9 s, dedup_substring_spans 1.8->6.0 s,
kg_pagerank_pipeline 19.6->36.6 s) while untouched mapper ops in the
same run got FASTER — the window-noise adjudication needs per-op paired
evidence that current code is at parity with the r4 code for exactly
these ops.

Protocol (CLAUDE.md bench hygiene): alternating child processes, one
per (revision, round) — fresh JVM + fresh python workers each — timing
the SAME queries() entries at sf0.1 on local[32].  Each child times
every op twice (cold includes codegen/worker warmup; warm is the
comparable number) after a worker-pool warm.  Revisions interleave
WITHIN each round so a host-steal window hits both arms equally.

Usage:
  git worktree add /tmp/kgmwcp_r4 ee17b38   # r4 driver-wrap commit
  python scripts/ab_perfweak.py [r4_dir] [rounds] [sf_dir]

Output: per-round table + per-op medians; append the conclusion to
BENCH/runs.jsonl by hand (this script does NOT write it — one writer).
"""
import json
import os
import statistics
import subprocess
import sys

R4_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kgmwcp_r4"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

OPS = ["curate_corpus", "dedup_substring_spans", "kg_pagerank_pipeline"]

_CHILD = r"""
import json, sys, time
repo = sys.argv[1]
sf = sys.argv[2]
ops = sys.argv[3].split(",")
sys.path.insert(0, repo)
from kgmwcp.session import get_spark
spark = get_spark("ab-perfweak", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "32")
import __spark_entry__ as em
from pyspark.sql import functions as F
spark.range(1000).select(F.sum("id")).collect()  # bench.py's JVM warm
out = {}
for name in ops:
    fn = em.queries()[name]
    t0 = time.time(); fn(spark, sf).count(); cold = time.time() - t0
    t0 = time.time(); fn(spark, sf).count(); warm = time.time() - t0
    out[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
print(json.dumps(out))
spark.stop()
"""


def run_child(repo_dir: str) -> dict:
    # PYTHONPATH + cwd both point at the checkout under test — the
    # python WORKERS resolve kgmwcp from env + cwd, not the driver's
    # sys.path (the ab_extract_r3 review finding)
    env = dict(os.environ, PYTHONPATH=repo_dir)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, repo_dir, SF, ",".join(OPS)],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo_dir)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed in {repo_dir}:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    if not os.path.isdir(R4_DIR):
        raise SystemExit(
            f"{R4_DIR} missing — git worktree add /tmp/kgmwcp_r4 <r4-commit>")
    repos = {"r4": R4_DIR, "now": "/root/repo"}
    res = {k: {op: [] for op in OPS} for k in repos}
    for rnd in range(ROUNDS):
        # alternate which arm goes first so order-cold bias cancels
        order = ["r4", "now"] if rnd % 2 == 0 else ["now", "r4"]
        for name in order:
            r = run_child(repos[name])
            for op, t in r.items():
                res[name][op].append(t)
            print(f"round {rnd} {name} {json.dumps(r)}", flush=True)
    print("---")
    summary = {}
    for op in OPS:
        row = {}
        for name in repos:
            warms = [t["warm"] for t in res[name][op]]
            colds = [t["cold"] for t in res[name][op]]
            row[name] = {"warm_med": round(statistics.median(warms), 3),
                         "cold_med": round(statistics.median(colds), 3),
                         "warms": warms}
        ratio = (row["now"]["warm_med"] / row["r4"]["warm_med"]
                 if row["r4"]["warm_med"] else float("nan"))
        row["now_over_r4_warm"] = round(ratio, 3)
        summary[op] = row
        print(op, json.dumps(row))
    print(json.dumps({"ab_perfweak": summary, "rounds": ROUNDS, "sf": SF}))


if __name__ == "__main__":
    main()
