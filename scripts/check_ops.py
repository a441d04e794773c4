"""Targeted oracle check: run only the named queries() ops against their
DuckDB twins (fast iteration loop; full sweep = scripts/oracle_sweep.py).

Usage: [SF=/root/testdata/sfX] python scripts/check_ops.py op1 op2 ...
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tests.test_ops import TABLES, _rowset  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from kgmwcp.session import get_spark  # noqa: E402


def _hash(rowset):
    h = hashlib.sha256()
    for row in rowset:
        h.update(repr(row).encode("utf-8"))
    return h.hexdigest()


def main():
    sf = os.environ.get("SF", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    spark = get_spark("check-new", master="local[16]")
    bad = 0
    for name in names:
        df = queries[name](spark, sf)
        spark_set, spark_cols = _rowset(
            [tuple(r) for r in df.collect()], df.columns)
        if name not in oracles:
            print(f"{name}: rows={len(spark_set)} (rows-only)")
            continue
        rel = con.execute(oracles[name])
        o_set, o_cols = _rowset(rel.fetchall(),
                                [d[0] for d in rel.description])
        ok = (len(spark_set) == len(o_set) and spark_cols == o_cols
              and _hash(spark_set) == _hash(o_set))
        print(f"{name}: rows {len(spark_set)}/{len(o_set)} cols_ok="
              f"{spark_cols == o_cols} hash_ok={_hash(spark_set) == _hash(o_set)}"
              f" -> {'OK' if ok else 'FAIL'}")
        if not ok:
            bad += 1
            if spark_cols != o_cols:
                print(f"  spark cols: {spark_cols}\n  oracle cols: {o_cols}")
            # _rowset returns sorted lists, not sets
            only_s = [r for r in spark_set if r not in set(o_set)][:3]
            only_o = [r for r in o_set if r not in set(spark_set)][:3]
            if only_s:
                print(f"  only spark: {only_s}")
            if only_o:
                print(f"  only oracle: {only_o}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
