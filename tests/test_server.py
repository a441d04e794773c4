"""REST serving layer (S14) + stdin ingest (S3): the same Pipeline the
batch run uses, served per-request / per-blob."""

import hashlib
import io
import json
import threading
import urllib.request

import pytest

from kgmwcp import fixtures


@pytest.fixture(scope="module")
def http_server(spark):
    from kgmwcp.server import make_server

    httpd = make_server(spark, port=0, knowledge_base={"secret": "hello"})
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    host, port = httpd.server_address[:2]
    yield f"http://{host}:{port}"
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url) as resp:
        return resp.status, json.loads(resp.read())


def _post(url, body, content_type):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": content_type})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def _multipart(data: bytes, filename: str, fields=None):
    boundary = "kgmwcpboundary123"
    buf = io.BytesIO()
    for name, value in (fields or {}).items():
        buf.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                  f'name="{name}"\r\n\r\n{value}\r\n'.encode())
    buf.write(f"--{boundary}\r\nContent-Disposition: form-data; "
              f'name="data"; filename="{filename}"\r\n'
              f"Content-Type: application/octet-stream\r\n\r\n".encode())
    buf.write(data)
    buf.write(f"\r\n--{boundary}--\r\n".encode())
    return buf.getvalue(), f"multipart/form-data; boundary={boundary}"


def test_banner_and_parsers(http_server):
    status, banner = _get(http_server + "/")
    assert status == 200 and banner["service"] == "kgmwcp"
    status, parsers = _get(http_server + "/parsers")
    assert status == 200
    assert "Quarantined" in parsers["parsers"]


def test_run_parser_multipart(http_server):
    payload = (fixtures.FOO_TEXT + "\n# variant 9\n").encode()
    # parser passed as a multipart form field (reference-compatible)
    body, ctype = _multipart(payload, "anything.txt",
                             fields={"parser": "foo"})
    status, report = _post(http_server + "/run_parser", body, ctype)
    assert status == 200
    assert report["parser"] == "Foo"
    assert report["input_file"]["name"] == "anything.txt"
    assert report["input_file"]["sha256"] == hashlib.sha256(payload).hexdigest()
    # the knowledge base reached the parser (foo secret element)
    assert any(m.get("key") == "secret_using_external_knowledge"
               for m in report["metadata"] if m["type"] == "other")


def test_run_parser_raw_body(http_server):
    payload = b"%PDF-1.4 stream http://served.example.com/a end"
    status, report = _post(http_server + "/run_parser", payload,
                           "application/octet-stream")
    assert status == 200
    assert report["input_file"]["description"] == "PDF Document"
    assert any(m["type"] == "url" for m in report["metadata"])


def test_run_parser_routed_group(http_server):
    payload = (fixtures.FOO_TEXT + "\n# variant 9\n").encode()
    body, ctype = _multipart(payload, "x.txt")
    status, report = _post(http_server + "/run_parser/foo", body, ctype)
    assert status == 200 and report["parser"] == "Foo"
    status, err = _post(http_server + "/run_parser/NoSuchGroup", body, ctype)
    assert status == 400 and "unknown parser group" in err["errors"][0]


def test_concurrent_requests(http_server):
    """ThreadingHTTPServer + one shared SparkSession: simultaneous
    uploads must each get their own correct report (per-request
    DataFrames are independent; Spark schedules concurrent jobs)."""
    import concurrent.futures

    def upload(i):
        payload = (fixtures.FOO_TEXT + f"\n# concurrent {i}\n").encode()
        body, ctype = _multipart(payload, f"c{i}.txt",
                                 fields={"parser": "foo"})
        status, report = _post(http_server + "/run_parser", body, ctype)
        return status, report, hashlib.sha256(payload).hexdigest()

    with concurrent.futures.ThreadPoolExecutor(max_workers=3) as pool:
        results = list(pool.map(upload, range(3)))
    for i, (status, report, digest) in enumerate(results):
        assert status == 200
        assert report["input_file"]["name"] == f"c{i}.txt"
        assert report["input_file"]["sha256"] == digest


def test_run_parser_no_data(http_server):
    body, ctype = _multipart(b"", "empty.txt")
    status, err = _post(http_server + "/run_parser", body, ctype)
    assert status == 400
    assert err["errors"] == ["No input file provided"]


def test_not_found(http_server):
    status, err = _post(http_server + "/nope", b"x", "application/octet-stream")
    assert status == 404


def test_descriptions(http_server):
    """GET /descriptions (reference server.py:134-146): bare JSON array
    of [name, author, description] triples."""
    status, listing = _get(http_server + "/descriptions")
    assert status == 200
    assert all(len(entry) == 3 for entry in listing)
    assert ["Foo", "kgmwcp", "Foo"] in listing
    assert ["VBE", "kgmwcp", "Encoded VBScript"] in listing


def test_schema_json(http_server):
    """GET /schema.json (reference server.py:149-154) == the CLI
    --schema document."""
    from kgmwcp.schema import report_json_schema

    status, schema = _get(http_server + "/schema.json")
    assert status == 200
    assert schema == report_json_schema()


def test_logs_endpoint(http_server):
    """GET /logs: reference-parity stub strings (server.py:157-173)."""
    status, body = _get(http_server + "/logs")
    assert status == 200
    assert body == {"errors": ["Logs endpoint is no longer supported."]}


def test_upload_page(http_server):
    status_html = urllib.request.urlopen(http_server + "/upload")
    html = status_html.read().decode()
    assert status_html.status == 200
    assert 'enctype="multipart/form-data"' in html
    assert '<option value="Quarantined">' in html


def test_run_parsers_multi(http_server):
    """POST /run_parsers/<p1>/<p2> (reference server.py:63-97): one
    report per named group plus the deprecation-warning errors entry;
    unknown groups get a per-parser errors document (documented
    deviation from the reference's empty report)."""
    payload = (fixtures.FOO_TEXT + "\n# variant 9\n").encode()
    body, ctype = _multipart(payload, "multi.txt")
    status, out = _post(http_server + "/run_parsers/foo/PDF/NoSuchGroup",
                        body, ctype)
    assert status == 200
    assert out["errors"] == ["Running multiple parsers in a single request "
                             "will be changed future version."]
    assert out["foo"]["parser"] == "Foo"
    assert out["PDF"]["input_file"]["sha256"] == \
        hashlib.sha256(payload).hexdigest()
    assert out["NoSuchGroup"] == {
        "errors": ["unknown parser group: NoSuchGroup"]}


def test_run_parsers_no_data(http_server):
    body, ctype = _multipart(b"", "empty.txt")
    status, err = _post(http_server + "/run_parsers/foo", body, ctype)
    assert status == 400
    assert err["errors"] == ["No input file provided"]


def _post_raw(url, body, content_type):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": content_type})
    with urllib.request.urlopen(req) as resp:
        return resp.status, dict(resp.headers), resp.read()


def test_output_text(http_server):
    """output= via URL param (reference server.py:304-310): rendered
    text report instead of JSON."""
    payload = b"%PDF-1.4 stream http://text-out.example.com/a end"
    status, headers, raw = _post_raw(
        http_server + "/run_parser?output=text", payload,
        "application/octet-stream")
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")
    text = raw.decode()
    assert "PDF Document" in text and "text-out.example.com" in text


def test_output_zip(http_server):
    """output=zip (reference server.py:341-345, _build_zip:270-301):
    files/ residual payloads + results.json + results.txt, download
    filename <upload>_mwcp_output.zip."""
    import io
    import zipfile

    inner = b"inner payload http://zipres.example/x\n"
    payload = fixtures.defender_payload(inner, variant="0bad")
    body, ctype = _multipart(payload, "quarantine.bin",
                             fields={"output": "zip"})  # form-field spelling
    status, headers, raw = _post_raw(http_server + "/run_parser", body, ctype)
    assert status == 200
    assert headers["Content-Type"] == "application/zip"
    assert "quarantine.bin_mwcp_output.zip" in headers["Content-Disposition"]
    zf = zipfile.ZipFile(io.BytesIO(raw))
    names = zf.namelist()
    assert "results.json" in names and "results.txt" in names
    report = json.loads(zf.read("results.json"))
    assert report["input_file"]["name"] == "quarantine.bin"
    residuals = [n for n in names if n.startswith("files/")]
    assert residuals, names
    # the residual's bytes round-trip exactly (decrypted quarantine body)
    assert any(zf.read(n) == inner for n in residuals)


def test_output_stix(http_server):
    payload = b"%PDF-1.4 stream http://stix-out.example.com/a end"
    status, bundle = _post(http_server + "/run_parser?output=stix", payload,
                           "application/octet-stream")
    assert status == 200
    assert bundle["type"] == "bundle"
    types = {o["type"] for o in bundle["objects"]}
    assert "file" in types and "url" in types


def test_output_unknown_falls_back_to_json(http_server):
    payload = (fixtures.FOO_TEXT + "\n# variant 9\n").encode()
    body, ctype = _multipart(payload, "x.txt", fields={"parser": "foo"})
    status, report = _post(http_server + "/run_parser?output=nonsense",
                           body, ctype)
    assert status == 200 and report["parser"] == "Foo"


def test_body_too_large(spark):
    """Content-Length beyond max_body -> 413 before the body is read
    (one oversized upload must not exhaust driver memory)."""
    from kgmwcp.server import make_server

    httpd = make_server(spark, port=0, max_body=128)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    host, port = httpd.server_address[:2]
    try:
        status, err = _post(f"http://{host}:{port}/run_parser",
                            b"x" * 1024, "application/octet-stream")
        assert status == 413
        assert "request body too large" in err["errors"][0]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_stdin_ingest_cli(spark, tmp_path, monkeypatch, capsys):
    """S3: `--input -` reads one raw sample from stdin, runs the pipeline,
    and prints the report inline (reference `mwcp parse <parser> -`)."""
    import sys
    import types

    from kgmwcp.cli import main

    payload = (fixtures.FOO_TEXT + "\n# variant 3\n").encode()
    monkeypatch.setattr(
        sys, "stdin", types.SimpleNamespace(buffer=io.BytesIO(payload)))
    out = str(tmp_path / "kg")
    summary = main([
        "--input", "-", "--name", "dropped.txt", "--output", out,
        "--buckets", "4", "--knowledge-base", json.dumps({"secret": "hello"}),
        "--parser", "foo",
    ], spark=spark)
    assert summary["reports"] == 1
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    report = printed["report"][0]
    assert report["parser"] == "Foo"
    assert report["input_file"]["name"] == "dropped.txt"
    assert report["input_file"]["sha256"] == hashlib.sha256(payload).hexdigest()


def test_stdin_reuse_output_dir_reports_only_current_sample(
        spark, tmp_path, monkeypatch, capsys):
    """Two stdin runs into the SAME output dir: the second run's printed
    report must contain only the second sample (stdin is one-shot, not
    checkpoint-resumed — code-review finding)."""
    import sys
    import types

    from kgmwcp.cli import main

    out = str(tmp_path / "kg")
    digests = []
    for variant in ("A", "B"):
        payload = (fixtures.FOO_TEXT + f"\n# run {variant}\n").encode()
        digests.append(hashlib.sha256(payload).hexdigest())
        monkeypatch.setattr(
            sys, "stdin", types.SimpleNamespace(buffer=io.BytesIO(payload)))
        summary = main([
            "--input", "-", "--name", f"{variant}.txt", "--output", out,
            "--buckets", "4", "--parser", "foo",
        ], spark=spark)
        assert summary["reports"] == 1
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(printed["report"]) == 1
    assert printed["report"][0]["input_file"]["sha256"] == digests[1]


def test_stdin_no_resume_wipes_stale_artifacts(spark, tmp_path, monkeypatch,
                                               capsys):
    """--no-resume applies to stdin runs too: stale artifacts from a
    previous run in the same output dir (e.g. residual_files) are wiped
    before the new sample runs (review finding)."""
    import pathlib
    import sys
    import types

    from kgmwcp.cli import main

    out = str(tmp_path / "kg")
    stale = pathlib.Path(out) / "residual_files"
    stale.mkdir(parents=True)
    (stale / "00000_stale.bin").write_bytes(b"old run")

    payload = (fixtures.FOO_TEXT + "\n# clean\n").encode()
    monkeypatch.setattr(
        sys, "stdin", types.SimpleNamespace(buffer=io.BytesIO(payload)))
    main(["--input", "-", "--output", out, "--buckets", "4",
          "--parser", "foo", "--no-resume"], spark=spark)
    assert not (stale / "00000_stale.bin").exists()


def test_stream_empty_committed_batch_returns_empty_tables(spark, tmp_path):
    """A drain whose only committed micro-batch is EMPTY (zero-row part
    file in the drop folder) must return empty tables, not crash on
    parquet schema inference (code-review finding)."""
    from kgmwcp.pipeline import PipelineConfig
    from kgmwcp.streaming.ingest import run_available_now

    src = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [],
        "repo string, path string, commit string, lang string, "
        "content string",
    ).coalesce(1).write.parquet(src)
    tables = run_available_now(spark, src, out, PipelineConfig(n_buckets=4))
    assert tables["triples"].count() == 0
    assert tables["reports"].count() == 0


def test_streaming_stdin_rejected(capsys):
    from kgmwcp.cli import main

    with pytest.raises(SystemExit) as exc:
        main(["--input", "-", "--output", "/tmp/x", "--streaming"])
    assert exc.value.code == 2
    assert "stdin" in capsys.readouterr().err
