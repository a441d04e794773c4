"""CLI launch path: batch run with resume, streaming drain, packaging."""

import json
import zipfile

from kgmwcp import fixtures
from kgmwcp.cli import main, package_pyfiles


def test_cli_batch_run(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "kg")
    fixtures.corpus_df(spark, replication=1, hot_rows=2).write.parquet(src)

    summary = main([
        "--input", src, "--output", out, "--buckets", "8",
        "--knowledge-base", json.dumps({"secret": "hello"}),
    ], spark=spark)
    assert summary["triples"] > 0
    assert summary["nodes"] > 0
    assert summary["edges"] > 0
    assert summary["reports"] > 0

    # second run resumes (no frontier) and produces identical counts
    summary2 = main(["--input", src, "--output", out, "--buckets", "8",
                     "--knowledge-base", json.dumps({"secret": "hello"})],
                    spark=spark)
    assert summary2 == summary


def test_package_pyfiles(tmp_path):
    out = package_pyfiles(str(tmp_path / "kgmwcp.zip"))
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "kgmwcp/pipeline.py" in names
    assert "kgmwcp/engine/dispatcher.py" in names


def test_library_run_facade(spark):
    """kgmwcp.run mirrors the reference's mwcp.run surface."""
    import kgmwcp

    docs = fixtures.corpus_df(spark, replication=1, hot_rows=1).drop("route")
    tables = kgmwcp.run(spark, docs, parser="foo",
                        knowledge_base={"secret": "hello"}, n_buckets=8)
    others = [r for r in tables["triples"].collect() if r["pred"] == "other"]
    assert any("secret_using_external_knowledge" in r["obj"] for r in others)


def test_cli_missing_input_exit_code(spark, capsys):
    import pytest as _pytest

    with _pytest.raises(SystemExit) as exc:
        main(["--input", "/nonexistent/path", "--output", "/tmp/x"], spark=spark)
    assert exc.value.code == 1
