#!/usr/bin/env python
"""Golden-promotion workflow — the rebuild's analogue of the reference's
test-case management (``mwcp test --add/-u``, mwcp/testing.py:294-355,
TestCase.update :28-82): run the REAL pipeline on the fixture corpus,
diff it against the committed ``golden/*.parquet``, and regenerate the
goldens only on explicit promote.

    python scripts/update_goldens.py --diff      # show drift, exit 1 if any
    python scripts/update_goldens.py --promote   # regenerate golden/*.parquet

Two independent derivations feed the comparison:

* the pipeline output (Spark, the code under test) via the same
  ``__spark_entry__`` fixture queries the driver's CORRECTNESS gate runs;
* the committed parquet, built by ``kgmwcp/goldens.py`` — the
  engine-independent hashlib/uuid/json restatement of reference
  semantics (via scripts/make_goldens.py).

``--promote`` regenerates the parquet FROM goldens.py (never from the
pipeline output — a pipeline bug must not be promotable into the
oracle), then re-diffs so you immediately see whether the pipeline
agrees with the new goldens.  After promoting, commit golden/*.parquet
together with the goldens.py change that motivated it;
tests/test_goldens.py pins the committed bytes to a fresh rebuild, and
tests/test_goldens.py::test_update_goldens_diff_clean_on_head pins this
script's --diff to empty on HEAD.
"""

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")

# golden file name -> __spark_entry__ queries() key
TABLES = {
    "pipeline_triples": "pipeline_fixture_triples",
    "pipeline_nodes": "pipeline_fixture_nodes",
    "router_routes": "kg_router_routes",
    "stix_bundles": "kg_stix_bundles",
}


def _golden_rows(name: str):
    import pyarrow.parquet as pq

    table = pq.read_table(os.path.join(GOLDEN_DIR, f"{name}.parquet"))
    cols = table.column_names
    return cols, [tuple(row[c] for c in cols) for row in table.to_pylist()]


def compute_diffs(spark):
    """For each golden table: (columns, rows only in the pipeline output,
    rows only in the committed golden) as multiset differences."""
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    diffs = {}
    for name, qkey in TABLES.items():
        cols, golden = _golden_rows(name)
        df = queries[qkey](spark, GOLDEN_DIR).select(*cols)
        pipeline = [tuple(row[c] for c in cols) for row in df.collect()]
        p_count, g_count = Counter(pipeline), Counter(golden)
        only_pipeline = list((p_count - g_count).elements())
        only_golden = list((g_count - p_count).elements())
        diffs[name] = (cols, only_pipeline, only_golden)
    return diffs


def print_diffs(diffs, limit: int = 5) -> bool:
    clean = True
    for name, (cols, only_p, only_g) in sorted(diffs.items()):
        if not only_p and not only_g:
            print(f"{name}: OK (pipeline matches committed golden)")
            continue
        clean = False
        print(f"{name}: DRIFT — {len(only_p)} rows only in pipeline, "
              f"{len(only_g)} rows only in golden  (columns: {cols})")
        for label, rows in (("pipeline-only", only_p), ("golden-only", only_g)):
            for row in rows[:limit]:
                print(f"  {label}: {row}")
            if len(rows) > limit:
                print(f"  {label}: ... {len(rows) - limit} more")
    return clean


def promote():
    import importlib.util

    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "make_goldens",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "make_goldens.py"))
    make_goldens = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(make_goldens)

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, table in make_goldens.build_tables().items():
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="snappy")
        print(f"promoted {path}: {table.num_rows} rows (from goldens.py)")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    mode = parser.add_mutually_exclusive_group()
    mode.add_argument("--diff", action="store_true",
                      help="diff pipeline output vs committed goldens "
                           "(default); exit 1 on drift")
    mode.add_argument("--promote", action="store_true",
                      help="regenerate golden/*.parquet from goldens.py, "
                           "then re-diff")
    args = parser.parse_args(argv)

    if args.promote:
        promote()

    from kgmwcp.session import get_spark

    spark = get_spark("update-goldens", master="local[8]")
    try:
        clean = print_diffs(compute_diffs(spark))
    finally:
        spark.stop()
    if clean:
        print("goldens are in sync with the pipeline")
        return 0
    if args.promote:
        print("NOTE: pipeline still differs from the regenerated goldens — "
              "either the pipeline or goldens.py needs the matching change")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
