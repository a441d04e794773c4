"""Interleaved A/B of the bench PIPELINE block (extract+link) across two
checkouts — the focused probe for "is the link-phase inflation a code
regression or a host window?".  Same hygiene as ab_perfweak.py: fresh
JVM per (revision, round) child, alternating order within rounds.

Usage: python scripts/ab_linkphase.py [other_dir] [rounds] [replicas]
"""
import json
import os
import statistics
import subprocess
import sys

OTHER = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kgmwcp_r5clean"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 120

_CHILD = r"""
import json, sys
repo = sys.argv[1]
replicas = int(sys.argv[2])
sys.path.insert(0, repo)
from kgmwcp.session import get_spark
spark = get_spark("ab-link", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "32")
import importlib.util
spec = importlib.util.spec_from_file_location("bench", repo + "/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
out = bench.run_pipeline_bench(spark, replicas)
print("PIPE " + json.dumps(out))
spark.stop()
"""


def run_child(repo_dir: str) -> dict:
    env = dict(os.environ, PYTHONPATH=repo_dir)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, repo_dir, str(REPLICAS)],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo_dir)
    for line in out.stdout.splitlines():
        if line.startswith("PIPE "):
            return json.loads(line[len("PIPE "):])
    raise RuntimeError(f"child failed in {repo_dir}:\n{out.stderr[-2000:]}")


def main():
    repos = {"other": OTHER, "now": "/root/repo"}
    res = {k: [] for k in repos}
    for rnd in range(ROUNDS):
        order = ["other", "now"] if rnd % 2 == 0 else ["now", "other"]
        for name in order:
            r = run_child(repos[name])
            res[name].append(r)
            print(f"round {rnd} {name} extract={r['extract_sec']} "
                  f"link={r['link_sec']}", flush=True)
    print("---")
    summary = {}
    for name in repos:
        summary[name] = {
            "link_med": round(statistics.median(
                [r["link_sec"] for r in res[name]]), 3),
            "extract_med": round(statistics.median(
                [r["extract_sec"] for r in res[name]]), 3),
            "links": [r["link_sec"] for r in res[name]],
        }
    print(json.dumps({"ab_linkphase": summary, "rounds": ROUNDS,
                      "replicas": REPLICAS}))


if __name__ == "__main__":
    main()
