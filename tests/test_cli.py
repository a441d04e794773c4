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


FOO_TEXT_RENDER = """\
----- File: anything.txt -----
Field         Value
------------  ----------------------------------------------------------------
Parser        Foo
File Path     f0/anything.txt
Description   Foo
Architecture
MD5           736b19dc395cbae813df608f53d485f3
SHA1
SHA256        75bd9a77c715d35e7f7f9e051fbe8d460a38c08808299241546676ca470432f5
Compile Time
Repo          repo-000
Commit        74d8b345d671b9fb4bd9cbd9f6952d94dc4c6a91

---- External Knowledge ----
Field   Value
------  -----
secret  hello

---- Network ----
Socket / Address  Url / Protocol  Url / Url
----------------  --------------  ----------------
127.0.0.1         http            http://127.0.0.1

---- Socket ----
Address
---------
127.0.0.1

---- URL ----
Protocol  Url
--------  ----------------
http      http://127.0.0.1

---- Miscellaneous ----
Secret Using External Knowledge
-------------------------------
hello!

---- Residual Files ----
Filename           Description          Derivation                  MD5                               Arch  Compile Time
-----------------  -------------------  --------------------------  --------------------------------  ----  ------------
fooconfigtest.txt  example output file  extracted and decompressed  5eb63bbbe01eeed093cb22bb8f5acdc3

---- Logs ----
[I] operating on inputfile anything.txt
[I] size of inputfile is 49 bytes

"""


def test_render_text_golden(spark):
    """Golden-text render (reference report_writers.py SimpleTextWriter
    layout): input-file pivot, per-type tables in class order,
    Miscellaneous, Residual Files columns, Logs block."""
    import hashlib

    from kgmwcp.pipeline import Pipeline, PipelineConfig
    from kgmwcp.render import render_report

    tabs = Pipeline(PipelineConfig(
        n_buckets=8, knowledge_base={"secret": "hello"})).run(
        fixtures.corpus_df(spark, replication=1, hot_rows=2))
    foo_sha = hashlib.sha256(
        (fixtures.FOO_TEXT + "\n# variant 0\n").encode()).hexdigest()
    row = tabs["reports"].filter(f"root_sha256 = '{foo_sha}'").collect()[0]
    report = json.loads(row["report_json"])

    assert render_report(report, "text") == FOO_TEXT_RENDER

    md = render_report(report, "md")
    assert "# File: anything.txt\n" in md
    assert "## Residual Files\n" in md
    assert "| fooconfigtest.txt | example output file |" in md
    assert "```\n[I] operating on inputfile anything.txt" in md

    html_out = render_report(report, "html")
    assert "<h1>File: anything.txt</h1>" in html_out
    assert "<h2>Residual Files</h2>" in html_out
    assert "<td>fooconfigtest.txt</td>" in html_out
    assert "<pre>\n[I] operating on inputfile anything.txt" in html_out

    # values are escaped (reference HTMLWriter escapes every cell)
    hostile = dict(report)
    hostile["metadata"] = [{"type": "mutex", "tags": [],
                            "value": "<script>alert(1)</script>"}]
    rendered = render_report(hostile, "html")
    assert "<script>" not in rendered
    assert "&lt;script&gt;alert(1)&lt;/script&gt;" in rendered


FOO_LEGACY_CSV = """\
MD5,MetaIndex,Category,Field,Value
736b19dc395cbae813df608f53d485f3,0,Input File,parser,Foo
736b19dc395cbae813df608f53d485f3,0,Input File,filename,anything.txt
736b19dc395cbae813df608f53d485f3,0,Input File,description,Foo
736b19dc395cbae813df608f53d485f3,0,Input File,architecture,
736b19dc395cbae813df608f53d485f3,0,Input File,compile_time,
736b19dc395cbae813df608f53d485f3,0,Input File,derivation,
736b19dc395cbae813df608f53d485f3,1,File,architecture,
736b19dc395cbae813df608f53d485f3,1,File,compile_time,
736b19dc395cbae813df608f53d485f3,1,File,data,
736b19dc395cbae813df608f53d485f3,1,File,derivation,extracted and decompressed
736b19dc395cbae813df608f53d485f3,1,File,description,example output file
736b19dc395cbae813df608f53d485f3,1,File,file_path,
736b19dc395cbae813df608f53d485f3,1,File,md5,5eb63bbbe01eeed093cb22bb8f5acdc3
736b19dc395cbae813df608f53d485f3,1,File,name,fooconfigtest.txt
736b19dc395cbae813df608f53d485f3,1,File,sha1,2aae6c35c94fcfb415dbe95f408b9ce91ee846ed
736b19dc395cbae813df608f53d485f3,1,File,sha256,b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9
736b19dc395cbae813df608f53d485f3,2,Network,credential,
736b19dc395cbae813df608f53d485f3,2,Network,address,127.0.0.1
736b19dc395cbae813df608f53d485f3,2,Network,listen,
736b19dc395cbae813df608f53d485f3,2,Network,network_protocol,
736b19dc395cbae813df608f53d485f3,2,Network,port,
736b19dc395cbae813df608f53d485f3,2,Network,path,
736b19dc395cbae813df608f53d485f3,2,Network,protocol,http
736b19dc395cbae813df608f53d485f3,2,Network,query,
736b19dc395cbae813df608f53d485f3,2,Network,url.url,http://127.0.0.1
736b19dc395cbae813df608f53d485f3,3,Other,value_format,string
736b19dc395cbae813df608f53d485f3,3,Other,secret_using_external_knowledge,hello!
736b19dc395cbae813df608f53d485f3,4,Socket,address,127.0.0.1
736b19dc395cbae813df608f53d485f3,4,Socket,listen,
736b19dc395cbae813df608f53d485f3,4,Socket,network_protocol,
736b19dc395cbae813df608f53d485f3,4,Socket,port,
736b19dc395cbae813df608f53d485f3,5,URL,path,
736b19dc395cbae813df608f53d485f3,5,URL,protocol,http
736b19dc395cbae813df608f53d485f3,5,URL,query,
736b19dc395cbae813df608f53d485f3,5,URL,url,http://127.0.0.1
"""


def test_legacy_csv_golden(spark):
    """Legacy long CSV (reference report_writers.py:43-89 DataFrameWriter
    (MD5, MetaIndex, Category, Field, Value) shape): hand-pinned block
    for the foo fixture report — Input File block at index 0, nested
    Network url.url collision-dotting, Other key promoted to Field,
    None -> empty cell."""
    import csv as _csv
    import hashlib
    import io

    from kgmwcp.pipeline import Pipeline, PipelineConfig
    from kgmwcp.render import legacy_csv_rows

    tabs = Pipeline(PipelineConfig(
        n_buckets=8, knowledge_base={"secret": "hello"})).run(
        fixtures.corpus_df(spark, replication=1, hot_rows=2))
    foo_sha = hashlib.sha256(
        (fixtures.FOO_TEXT + "\n# variant 0\n").encode()).hexdigest()
    row = tabs["reports"].filter(f"root_sha256 = '{foo_sha}'").collect()[0]
    report = json.loads(row["report_json"])

    buf = io.StringIO()
    w = _csv.writer(buf, lineterminator="\n")
    w.writerow(["MD5", "MetaIndex", "Category", "Field", "Value"])
    for r in legacy_csv_rows(report):
        w.writerow(["" if v is None else v for v in r])
    assert buf.getvalue() == FOO_LEGACY_CSV


def test_legacy_csv_other_key_collisions_bug_for_bug():
    """Degenerate Other keys mirror the reference exactly
    (report_writers.py:73-76): key == 'key' self-deletes (the element
    vanishes from the CSV), key == 'tags' routes the value through the
    sorted tag emitter."""
    from kgmwcp.render import legacy_csv_rows

    report = {
        "input_file": {"md5": "m", "name": "f", "tags": []},
        "parser": "P",
        "metadata": [
            {"type": "other", "tags": [], "key": "key",
             "value": "ghost", "value_format": "string"},
            {"type": "other", "tags": [], "key": "tags",
             "value": ["b", "a"], "value_format": "string"},
        ],
    }
    rows = [r for r in legacy_csv_rows(report) if r[1] > 0]
    # element 1: only value_format survives; the 'ghost' value is gone
    elem1 = [r for r in rows if r[1] == 1]
    assert elem1 == [("m", 1, "Other", "value_format", "string")]
    # element 2: the list value became sorted tag rows
    elem2 = [r for r in rows if r[1] == 2]
    assert ("m", 2, "Other", "tag", "a") in elem2
    assert ("m", 2, "Other", "tag", "b") in elem2


def test_cli_legacy_csv_format(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "kg")
    fixtures.corpus_df(spark, replication=1, hot_rows=2).write.parquet(src)
    summary = main([
        "--input", src, "--output", out, "--buckets", "8",
        "--knowledge-base", json.dumps({"secret": "hello"}),
        "--format", "csv",
    ], spark=spark)
    import pathlib

    csv_path = pathlib.Path(out, "reports_legacy.csv")
    assert csv_path.exists()
    assert summary["reports_csv"] == summary["reports"]
    lines = csv_path.read_text().splitlines()
    assert lines[0] == "MD5,MetaIndex,Category,Field,Value"
    # every report contributes its Input File block
    assert sum(1 for ln in lines if ",0,Input File,parser," in ln) == \
        summary["reports"]
    # the pinned foo block appears verbatim inside the combined file
    assert FOO_LEGACY_CSV.splitlines()[1:] == [
        ln for ln in lines if ln.startswith("736b19dc395cbae813df608f53d485f3,")]


def test_cli_render_format(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "kg")
    fixtures.corpus_df(spark, replication=1, hot_rows=2).write.parquet(src)
    summary = main([
        "--input", src, "--output", out, "--buckets", "8",
        "--knowledge-base", json.dumps({"secret": "hello"}),
        "--format", "md",
    ], spark=spark)
    import pathlib

    files = sorted(pathlib.Path(out, "reports_md").glob("*.md"))
    assert len(files) == summary["reports"] == summary["reports_md"]
    assert files[0].read_text().startswith("# File: ")


def test_report_json_schema_validates(spark):
    """JSON-Schema export (reference mwcp/core.py:87-110 + `mwcp schema`):
    every fixture report and every triples obj validates; a corrupted
    document fails."""
    import jsonschema

    from kgmwcp.pipeline import Pipeline, PipelineConfig
    from kgmwcp.schema import report_json_schema, triples_obj_schema

    tabs = Pipeline(PipelineConfig(
        n_buckets=8, knowledge_base={"secret": "hello"})).run(
        fixtures.corpus_df(spark, replication=1, hot_rows=2))

    schema = report_json_schema()
    jsonschema.Draft201909Validator.check_schema(schema)
    validator = jsonschema.Draft201909Validator(schema)
    reports = [json.loads(r["report_json"])
               for r in tabs["reports"].collect()]
    assert len(reports) > 0
    for report in reports:
        validator.validate(report)

    obj_schema = triples_obj_schema()
    jsonschema.Draft201909Validator.check_schema(obj_schema)
    obj_validator = jsonschema.Draft201909Validator(obj_schema)
    for row in tabs["triples"].collect():
        obj_validator.validate(json.loads(row["obj"]))

    import pytest as _pytest

    bad = dict(reports[0], metadata=[{"type": "url", "tags": [],
                                      "bogus_field": 1}])
    with _pytest.raises(jsonschema.ValidationError):
        validator.validate(bad)


def test_cli_schema_flag(capsys):
    summary = main(["--schema"])
    assert summary == {}
    printed = json.loads(capsys.readouterr().out)
    assert printed["properties"]["type"]["const"] == "report"
    assert "url" in printed["$defs"]


def test_cli_schema_not_hijacked_as_option_value(capsys):
    """'--schema' appearing as another option's (mistyped) value must NOT
    print the schema and exit 0 — argparse rejects the malformed
    invocation instead (ADVICE: the old raw argv pre-scan fired on any
    token equal to '--schema')."""
    import pytest as _pytest

    with _pytest.raises(SystemExit) as exc:
        main(["--parser", "--schema"])
    assert exc.value.code == 2
    assert capsys.readouterr().out == ""


def test_cli_missing_input_output_rejected(capsys):
    import pytest as _pytest

    with _pytest.raises(SystemExit) as exc:
        main(["--input", "/tmp/x"])
    assert exc.value.code == 2
    assert "--output" in capsys.readouterr().err


def test_cli_streaming_iceberg_rejected(capsys):
    """--streaming drains a parquet drop-folder; an iceberg catalog
    identifier must be rejected up front, not mistaken for a local
    path (ADVICE item)."""
    import pytest as _pytest

    with _pytest.raises(SystemExit) as exc:
        main(["--input", "db.tbl", "--output", "/tmp/out",
              "--streaming", "--input-format", "iceberg"])
    assert exc.value.code == 2
    assert "parquet drop-folder" in capsys.readouterr().err


def test_render_html_escapes_external_knowledge_keys():
    """User-supplied knowledge-base KEYS are table cells too — they must
    escape like every other cell (code-review finding)."""
    from kgmwcp.render import render_report

    report = {"input_file": {"name": "x"}, "parser": None,
              "external_knowledge": {"<img src=x onerror=y>": "v"},
              "errors": [], "logs": [], "metadata": []}
    html_out = render_report(report, "html")
    assert "<img" not in html_out
    assert "&lt;img src=x onerror=y&gt;" in html_out


def test_cli_iceberg_input_routing(spark, tmp_path, monkeypatch):
    """--input-format iceberg routes through spark.read.format('iceberg')
    (the runtime isn't in this container — assert the reader call, run
    the rest of the pipeline on the substituted frame)."""
    docs = fixtures.corpus_df(spark, replication=1, hot_rows=1)
    calls = {}
    real_read = type(spark).read

    class FakeReader:
        def format(self, fmt):
            calls["format"] = fmt
            return self

        def load(self, path):
            calls["load"] = path
            return docs

        def parquet(self, path):
            # checkpoint read-back still needs the real parquet reader
            return real_read.fget(spark).parquet(path)

    monkeypatch.setattr(type(spark), "read", property(lambda self: FakeReader()))
    out = str(tmp_path / "kg")
    summary = main([
        "--input", "warehouse.db.documents", "--input-format", "iceberg",
        "--output", out, "--buckets", "4", "--no-resume",
    ], spark=spark)
    assert calls == {"format": "iceberg", "load": "warehouse.db.documents"}
    assert summary["triples"] > 0


def test_cli_export_iceberg(spark, tmp_path, monkeypatch):
    """--export-iceberg routes every final table through
    DataFrame.writeTo(<prefix>_<table>).createOrReplace() (the Iceberg
    runtime isn't in this container — assert the catalog calls; parquet
    outputs and counts are unchanged)."""
    calls = []

    class FakeWriter:
        def __init__(self, ident):
            self.ident = ident

        def createOrReplace(self):
            calls.append(self.ident)

    src = str(tmp_path / "docs")
    out = str(tmp_path / "kg")
    docs = fixtures.corpus_df(spark, replication=1, hot_rows=1)
    # patch the CONCRETE DataFrame class (Spark 4's classic.DataFrame
    # shadows the abstract base's writeTo)
    monkeypatch.setattr(type(docs), "writeTo",
                        lambda self, ident: FakeWriter(ident))
    docs.write.parquet(src)
    summary = main([
        "--input", src, "--output", out, "--buckets", "4",
        "--export-iceberg", "warehouse.db.kg",
    ], spark=spark)
    assert sorted(calls) == [
        "warehouse.db.kg_edges", "warehouse.db.kg_nodes",
        "warehouse.db.kg_reports", "warehouse.db.kg_triples",
    ]
    assert summary["triples"] > 0


def test_cli_list_parsers(capsys):
    """--list (reference `mwcp list`, cli.py:148-177): JSON listing of
    every routing group and its rules, no Spark session needed."""
    summary = main(["--list"])
    assert summary == {}
    listing = json.loads(capsys.readouterr().out)
    groups = {g["group"]: g["rules"] for g in listing}
    assert len(groups["Quarantined"]) == 6
    names = {r["name"] for r in groups["Quarantined"]}
    assert "SymantecSubSDK" in names
    assert all(r["description"] for g in listing for r in g["rules"])
