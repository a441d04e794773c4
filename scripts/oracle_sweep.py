"""Full-sweep correctness artifact (round-4 VERDICT item 2).

Runs EVERY `__spark_entry__.queries()` entry against its
`oracle_sql()` DuckDB twin at the driver's correctness scale (sf0.01 by
default) using the same compare the test suite replicates from the
driver: row count + case-insensitive column names + order-insensitive
4dp-normalized values (value hash).  Rows-only entries (no oracle) get
the driver's weaker rows>=0 check.  Writes one JSON artifact with a
per-query row so rounds where the driver samples a subset still leave a
committed 77/77 record.

Usage: python scripts/oracle_sweep.py [sf_dir] [out_json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

# reuse the suite's normalize/rowset so the sweep can never drift from
# what the tests (and the driver semantics they replicate) assert
from tests.test_ops import TABLES, _rowset  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from kgmwcp.session import get_spark  # noqa: E402


def _hash(rowset) -> str:
    h = hashlib.sha256()
    for row in rowset:
        h.update(repr(row).encode("utf-8"))
    return h.hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "ORACLE_SWEEP.json")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    spark = get_spark("oracle-sweep", master="local[16]")
    results: dict = {}
    n_fail = 0
    for name in sorted(queries):
        t0 = time.monotonic()
        row: dict = {}
        try:
            df = queries[name](spark, sf)
            spark_set, spark_cols = _rowset(
                [tuple(r) for r in df.collect()], df.columns)
            if name in oracles:
                res = con.execute(oracles[name])
                duck_set, duck_cols = _rowset(
                    res.fetchall(), [d[0] for d in res.description])
                row = {
                    "mode": "oracle",
                    "n_rows": len(spark_set),
                    "rows_match": len(spark_set) == len(duck_set),
                    "schema_match": [c.lower() for c in spark_cols]
                    == [c.lower() for c in duck_cols],
                    "hash_match": spark_set == duck_set,
                    "value_hash": _hash(spark_set),
                }
                ok = (row["rows_match"] and row["schema_match"]
                      and row["hash_match"])
            else:
                row = {
                    "mode": "rows_only",
                    "n_rows": len(spark_set),
                    "rows_match": len(spark_set) >= 0,
                    "value_hash": _hash(spark_set),
                }
                ok = True
        except Exception as exc:  # a crash is a failure row, not a crash
            row = {"mode": "error", "error": f"{type(exc).__name__}: {exc}"}
            ok = False
        row["sec"] = round(time.monotonic() - t0, 2)
        row["ok"] = ok
        n_fail += not ok
        results[name] = row
        print(f"{'PASS' if ok else 'FAIL'} {name:28s} "
              f"{row.get('n_rows', '-'):>6} rows {row['sec']:6.1f}s",
              flush=True)
    artifact = {
        "sf_dir": sf,
        "n_queries": len(results),
        "n_oracle": sum(1 for r in results.values() if r.get("mode") == "oracle"),
        "n_fail": n_fail,
        "queries": results,
    }
    with open(out_path, "w") as fp:
        json.dump(artifact, fp, indent=1, sort_keys=True)
        fp.write("\n")
    print(f"{len(results) - n_fail}/{len(results)} ok -> {out_path}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
