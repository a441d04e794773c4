#!/usr/bin/env python
"""Serialize the engine-independent golden tables (kgmwcp/goldens.py) to
``golden/*.parquet`` at the driver's fixture scale (replication=4,
hot_rows=16 — the parameters __spark_entry__'s pipeline_fixture_* queries
use).  The committed parquet is what oracle_sql() points DuckDB at;
tests/test_goldens.py pins the committed bytes against a fresh rebuild so
the data can never drift from the golden code.

Run from the repo root:  python scripts/make_goldens.py
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgmwcp import goldens  # noqa: E402

REPLICATION, HOT_ROWS = 4, 16
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "golden")


def _table(rows, names, types):
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    arrays = [pa.array(col, type=t) for col, t in zip(cols, types)]
    return pa.Table.from_arrays(arrays, names=names)


def build_tables():
    s, i32, i64 = pa.string(), pa.int32(), pa.int64()
    return {
        "pipeline_triples": _table(
            goldens.golden_triples(REPLICATION, HOT_ROWS),
            ["subj", "pred", "obj"], [s, s, s]),
        "pipeline_nodes": _table(
            goldens.golden_nodes(REPLICATION, HOT_ROWS),
            ["entity_id", "entity_kind", "canonical_value", "payload",
             "n_mentions", "n_samples"], [s, s, s, s, i64, i64]),
        "router_routes": _table(
            goldens.golden_routes(REPLICATION, HOT_ROWS),
            ["path", "route", "n_sigs", "sigs"], [s, s, i32, s]),
        "stix_bundles": _table(
            goldens.golden_stix(REPLICATION, HOT_ROWS),
            ["root_sha256", "n_objects", "bundle_json"], [s, i32, s]),
    }


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, table in build_tables().items():
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="snappy")
        print(f"wrote {path}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
