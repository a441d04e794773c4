"""External parser-source registration (engine/registry.py) — the
reference's `--parser-dir` one-off parser flow (mwcp/registry.py:171-198,
mwcp/cli.py:108-113) carried through registry -> routing -> the full
Spark extract pipeline."""

import json
import os

import pytest

from kgmwcp.engine import registry
from kgmwcp.engine.parsers import DEFAULT_GROUP_ORDER, RULE_GROUPS

TOY_RULE = '''
GROUP = "ToyVendor"

from kgmwcp import canonical as md
from kgmwcp.engine.fileobj import SampleFile
from kgmwcp.engine.parsers import Rule


class ToyConfig(Rule):
    DESCRIPTION = "Toy vendor config"

    @classmethod
    def identify(cls, f):
        return f.data.startswith(b"TOYCFG")

    def run(self, f, ctx, *run_args):
        for line in f.data[6:].decode("utf-8", "replace").splitlines():
            if line.startswith("c2="):
                ctx.add(md.URL(line[3:]))
            elif line.startswith("mutex="):
                ctx.add(md.Mutex(line[6:]))
        ctx.dispatch(SampleFile(b"residual payload",
                                name="toy_residual.bin",
                                description="toy residual"))
'''


@pytest.fixture()
def toy_dir(tmp_path):
    d = tmp_path / "toyrules"
    d.mkdir()
    (d / "toy_vendor.py").write_text(TOY_RULE)
    (d / "_helper.py").write_text("IGNORED = True\n")  # _-prefixed: skipped
    (d / "notes.txt").write_text("not python\n")
    yield str(d)
    # undo the DRIVER-side registration so the shared-session test suite
    # stays clean.  Spark's reused python WORKERS keep ToyVendor
    # registered (and first in their auto order) for the session — out of
    # teardown's reach by design (per-process idempotent registration).
    # Safe here because ToyConfig.identify is gated on the b"TOYCFG"
    # magic prefix, which no other fixture carries; keep any future toy
    # rule equally prefix-gated.
    if "ToyVendor" in RULE_GROUPS:
        del RULE_GROUPS["ToyVendor"]
    if "ToyVendor" in DEFAULT_GROUP_ORDER:
        DEFAULT_GROUP_ORDER.remove("ToyVendor")
    registry._LOADED.pop(os.path.realpath(str(d)), None)


def test_register_directory_updates_registry_and_order(toy_dir):
    contributed = registry.register_rule_directory(toy_dir, source_name="toy")
    assert contributed == ["ToyVendor"]
    assert [r.name() for r in RULE_GROUPS["ToyVendor"]] == ["ToyConfig"]
    # new groups are PREPENDED: user rules are tried before generic
    # built-ins (Decoy ext-rename, Archive unpack)
    assert DEFAULT_GROUP_ORDER[0] == "ToyVendor"
    # idempotent per realpath — no duplicate rules, no duplicate order slot
    assert registry.register_rule_directory(toy_dir) == ["ToyVendor"]
    assert len(RULE_GROUPS["ToyVendor"]) == 1
    assert DEFAULT_GROUP_ORDER.count("ToyVendor") == 1
    assert registry.registered_sources() == {"toy": ["ToyVendor"]}


def test_register_missing_directory_raises(tmp_path):
    with pytest.raises(ValueError, match="Parser directory not found"):
        registry.register_rule_directory(str(tmp_path / "nope"))


def test_toy_rule_routes_and_extracts_end_to_end(spark, toy_dir):
    """An out-of-tree rule must flow through the REAL pipeline: auto
    routing picks it up (prepended group), the extract worker re-imports
    the directory via config.rule_dirs, mentions land in triples, and
    the dispatched residual becomes a file_node child."""
    from kgmwcp.pipeline import Pipeline, PipelineConfig
    from kgmwcp.stages.ingest import single_sample_docs

    payload = b"TOYCFGc2=http://evil.example/gate.php\nmutex=TOYMUTEX\n"
    docs = single_sample_docs(spark, payload, "sample.toy")
    pipe = Pipeline(PipelineConfig(n_buckets=4, rule_dirs=(toy_dir,)))
    tables = pipe.run(docs)
    try:
        triples = {(r.pred, r.obj) for r in tables["triples"].collect()}
        preds = {p for p, _ in triples}
        assert "url" in preds and "mutex" in preds
        assert any("evil.example" in o for _, o in triples)
        assert any("TOYMUTEX" in o for p, o in triples if p == "mutex")
        files = tables["files"].collect()
        assert any(f.name == "toy_residual.bin" for f in files)
        parsers = {r.parser for r in tables["records"]
                   .filter("kind = 'file_node' and depth = 0").collect()}
        assert parsers == {"ToyConfig"}
    finally:
        tables["records"].unpersist()


def test_cli_list_includes_external_group(toy_dir, capsys):
    from kgmwcp.cli import main

    summary = main(["--list", "--parser-dir", toy_dir])
    assert summary == {}
    listing = json.loads(capsys.readouterr().out)
    groups = {g["group"]: g["rules"] for g in listing}
    assert [r["name"] for r in groups["ToyVendor"]] == ["ToyConfig"]
    # external rules carry their source (the registered directory), not
    # the built-in "kgmwcp" tag
    assert groups["ToyVendor"][0]["source"].endswith("toyrules")


# -- installed-package sources (S15 full form) --------------------------------
# The reference's primary distribution channel: a pip-installable package
# of parser modules (mwcp/registry.py:199-227 register_parser_package)
# optionally advertised via the "mwcp.parsers" entry-point group
# (:131-141 register_entry_points; ours is "kgmwcp.parsers").

PKG_RULE = '''
GROUP = "PkgVendor"

from kgmwcp import canonical as md
from kgmwcp.engine.parsers import Rule


class PkgConfig(Rule):
    DESCRIPTION = "Packaged vendor config"

    @classmethod
    def identify(cls, f):
        return f.data.startswith(b"PKGCFG")

    def run(self, f, ctx, *run_args):
        for line in f.data[6:].decode("utf-8", "replace").splitlines():
            if line.startswith("c2="):
                ctx.add(md.URL(line[3:]))
            elif line.startswith("mutex="):
                ctx.add(md.Mutex(line[6:]))
'''

PKG_NAME = "kgmwcp_toypkg"


@pytest.fixture()
def toy_pkg(tmp_path, monkeypatch):
    """An importable (sys.path, not pip) parser-collection package —
    import-by-dotted-name is exactly what pip install provides, so the
    registration path under test is identical."""
    import sys as _sys

    pkg = tmp_path / PKG_NAME
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "vendor_rules.py").write_text(PKG_RULE)
    (pkg / "_private.py").write_text("IGNORED = True\n")  # skipped
    monkeypatch.syspath_prepend(str(tmp_path))
    yield PKG_NAME, str(tmp_path)
    # same teardown contract as toy_dir: driver registries restored,
    # reused Spark workers keep the (PKGCFG-gated) rule by design
    if "PkgVendor" in RULE_GROUPS:
        del RULE_GROUPS["PkgVendor"]
    if "PkgVendor" in DEFAULT_GROUP_ORDER:
        DEFAULT_GROUP_ORDER.remove("PkgVendor")
    registry._LOADED.pop(f"pkg:{PKG_NAME}", None)
    for mod in [m for m in _sys.modules
                if m == PKG_NAME or m.startswith(PKG_NAME + ".")]:
        _sys.modules.pop(mod, None)


def test_register_package_by_name(toy_pkg):
    name, _ = toy_pkg
    contributed = registry.register_rule_package(name, source_name="pkgsrc")
    assert contributed == ["PkgVendor"]
    assert [r.name() for r in RULE_GROUPS["PkgVendor"]] == ["PkgConfig"]
    assert DEFAULT_GROUP_ORDER[0] == "PkgVendor"
    # idempotent per package name
    assert registry.register_rule_package(name) == ["PkgVendor"]
    assert len(RULE_GROUPS["PkgVendor"]) == 1
    assert DEFAULT_GROUP_ORDER.count("PkgVendor") == 1
    assert registry.registered_sources()["pkgsrc"] == ["PkgVendor"]
    # the rule keeps its REAL module name (no namespacing needed for
    # installed packages) and is attributed to the external source
    assert registry.rule_source(RULE_GROUPS["PkgVendor"][0],
                                "PkgVendor") == "pkgsrc"


def test_register_package_rejects_plain_module(toy_pkg):
    name, _ = toy_pkg
    with pytest.raises(ValueError, match="is not a Python package"):
        registry.register_rule_package(f"{name}.vendor_rules")


def test_pkg_rule_extracts_end_to_end(spark, toy_pkg, tmp_path):
    """config.rule_packages flows to the extract workers, which import
    the collection BY NAME (the reference's discoverable-in-subprocesses
    requirement, mwcp/registry.py:205-208) — shipped here via addPyFile,
    the test analogue of pip-installing on executors."""
    import shutil

    from kgmwcp.pipeline import Pipeline, PipelineConfig
    from kgmwcp.stages.ingest import single_sample_docs

    name, base = toy_pkg
    zip_path = shutil.make_archive(
        str(tmp_path / "toypkg_ship"), "zip", root_dir=base, base_dir=name)
    spark.sparkContext.addPyFile(zip_path)

    payload = b"PKGCFGc2=http://pkg.example/p.php\nmutex=PKGMUTEX\n"
    docs = single_sample_docs(spark, payload, "sample.pkg")
    pipe = Pipeline(PipelineConfig(n_buckets=4, rule_packages=(name,)))
    tables = pipe.run(docs)
    try:
        triples = {(r.pred, r.obj) for r in tables["triples"].collect()}
        assert any("pkg.example" in o for p, o in triples if p == "url")
        assert any("PKGMUTEX" in o for p, o in triples if p == "mutex")
        parsers = {r.parser for r in tables["records"]
                   .filter("kind = 'file_node' and depth = 0").collect()}
        assert parsers == {"PkgConfig"}
    finally:
        tables["records"].unpersist()


def test_entry_point_discovery(toy_pkg, capsys):
    """A dist advertising the kgmwcp.parsers entry-point group is found
    without any flag: entry_point_packages() names it, the CLI folds it
    into --list / config.rule_packages automatically."""
    import pathlib

    name, base = toy_pkg
    di = pathlib.Path(base) / f"{name}-0.1.dist-info"
    di.mkdir()
    (di / "METADATA").write_text(
        f"Metadata-Version: 2.1\nName: {name}\nVersion: 0.1\n")
    (di / "entry_points.txt").write_text(
        f"[{registry.ENTRY_POINT_GROUP}]\ntoyvendor = {name}\n")

    assert name in registry.entry_point_packages()
    assert registry.register_entry_points() == ["PkgVendor"]
    assert registry.registered_sources()["toyvendor"] == ["PkgVendor"]

    from kgmwcp.cli import main

    summary = main(["--list"])
    assert summary == {}
    listing = json.loads(capsys.readouterr().out)
    groups = {g["group"]: g["rules"] for g in listing}
    assert [r["name"] for r in groups["PkgVendor"]] == ["PkgConfig"]
    assert groups["PkgVendor"][0]["source"] == "toyvendor"
