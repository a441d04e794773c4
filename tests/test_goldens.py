"""Pin the committed golden parquet (golden/*.parquet, written by
scripts/make_goldens.py) to a fresh rebuild of kgmwcp/goldens.py — the
DuckDB oracle data for the four pipeline entries can never drift from the
golden derivation code."""

import os

import pyarrow.parquet as pq
import pytest

from kgmwcp import goldens

GOLD_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "golden")
R, H = 4, 16  # the driver fixture scale (scripts/make_goldens.py)

CASES = {
    "pipeline_triples": lambda: goldens.golden_triples(R, H),
    "pipeline_nodes": lambda: goldens.golden_nodes(R, H),
    "router_routes": lambda: goldens.golden_routes(R, H),
    "stix_bundles": lambda: goldens.golden_stix(R, H),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_committed_parquet_matches_rebuild(name):
    path = os.path.join(GOLD_DIR, f"{name}.parquet")
    assert os.path.exists(path), (
        f"{path} missing — run scripts/make_goldens.py and commit the output")
    committed = [tuple(row) for row in
                 zip(*(c.to_pylist() for c in pq.read_table(path).columns))]
    rebuilt = [tuple(r) for r in CASES[name]()]
    assert committed == rebuilt, (
        f"{name}: committed golden parquet is stale — rerun scripts/make_goldens.py")


def test_golden_counts():
    assert len(goldens.golden_triples(R, H)) == 218
    assert len(goldens.golden_nodes(R, H)) == 61
    assert len(goldens.golden_routes(R, H)) == 100
    assert len(goldens.golden_stix(R, H)) == 93


def test_update_goldens_diff_clean_on_head(spark):
    """The golden-promotion workflow's --diff (scripts/update_goldens.py,
    the reference's `mwcp test -u` analogue) must be empty on HEAD: the
    real pipeline agrees with the committed golden parquet."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "update_goldens",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "update_goldens.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    diffs = mod.compute_diffs(spark)
    assert set(diffs) == set(mod.TABLES)
    for name, (_, only_p, only_g) in diffs.items():
        assert not only_p and not only_g, (
            f"{name}: pipeline drifted from committed goldens "
            f"({len(only_p)} pipeline-only, {len(only_g)} golden-only)")


def test_update_goldens_promote_is_idempotent_on_head(tmp_path, monkeypatch):
    """--promote regenerates golden/*.parquet from goldens.py; on HEAD
    that must reproduce the committed bytes exactly (same check as the
    rebuild pin, exercised through the promote code path)."""
    import importlib.util
    import pathlib
    import shutil

    spec = importlib.util.spec_from_file_location(
        "update_goldens",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "update_goldens.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    committed = pathlib.Path(mod.GOLDEN_DIR)
    staging = tmp_path / "golden"
    shutil.copytree(committed, staging)
    monkeypatch.setattr(mod, "GOLDEN_DIR", str(staging))
    mod.promote()
    for name in mod.TABLES:
        a = (committed / f"{name}.parquet").read_bytes()
        b = (staging / f"{name}.parquet").read_bytes()
        assert a == b, f"{name}: promote produced different bytes on HEAD"
