"""REST serving layer — SURVEY §2 S14 (reference
mwcp/tools/server/server.py:39-97, the flask `mwcp serve` tool).

Stdlib-only (http.server + email-package multipart parsing — flask is
not in the container).  The server holds ONE SparkSession and serves
each request by running the SAME Pipeline a batch run uses on a
one-row corpus, so there is no second extraction code path to drift:

  GET  /                       -> service banner (endpoints)
  GET  /parsers                -> JSON list of parser groups
  GET  /descriptions           -> [name, author, description] triples
                                  (reference server.py:134-146)
  GET  /schema.json            -> report JSON Schema (server.py:149-154)
  GET  /logs                   -> reference-parity stub (server.py:157-173:
                                  "no longer supported" / 403 when disabled)
  GET  /upload                 -> minimal HTML upload form (the reference
                                  renders upload.html, server.py:123-131;
                                  ours is a static form — no pygments/
                                  jinja in the container)
  POST /run_parser             -> report document for the uploaded file
  POST /run_parser/<parser>    -> routed to one parser group
  POST /run_parsers/<parsers>  -> '/'-separated groups, one report each
                                  (reference server.py:63-97, incl. its
                                  deprecation-warning errors entry)

``/run_parser`` honors the reference's ``output=`` parameter (URL or
form field, server.py:304-355): ``json`` (default), ``text`` (rendered
report), ``zip`` (files/ residual payloads + results.json +
results.txt, reference download filename), ``stix`` (the sample's STIX
2.1 bundle); unknown values fall back to json like the reference.  The
one remaining parity hole is ``highlight=`` (pygments is not in the
container; documented exclusion in COVERAGE.md).

The upload rides the multipart/form-data field ``data``
(reference-compatible, server.py:44-46) or, as a convenience, the raw
request body.  Errors mirror the reference's strings ("No input file
provided", unknown-parser 4xx).  Deviation from the reference: an
unknown group inside /run_parsers yields a per-parser ``{"errors":
[...]}`` document instead of an empty report (more diagnosable, shape
pinned in tests); request bodies above ``max_body`` are rejected 413
before being read (the reference delegates this to its WSGI server).

Serving a distributed batch engine over HTTP is a dev/integration
surface, not the 100 TB path — per-request latency is one tiny Spark
job (~1-2 s warm); the scale story stays with the batch/streaming
pipeline.
"""

from __future__ import annotations

import html
import json
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

__all__ = ["KgServer", "make_server"]

_FILENAME_RE = re.compile(r'filename="([^"]*)"')


def _parse_multipart(content_type: str, body: bytes):
    """-> (data bytes | None, filename | None, fields dict) via the email
    package (the stdlib cgi module is gone in modern python)."""
    import email
    import email.policy

    msg = email.message_from_bytes(
        b"Content-Type: " + content_type.encode("latin-1") + b"\r\n\r\n" + body,
        policy=email.policy.default,
    )
    data, filename, fields = None, None, {}
    if not msg.is_multipart():
        return None, None, {}
    for part in msg.iter_parts():
        disposition = str(part.get("Content-Disposition", ""))
        name_m = re.search(r'name="([^"]*)"', disposition)
        if not name_m:
            continue
        name = name_m.group(1)
        payload = part.get_payload(decode=True)
        if name == "data":
            data = payload
            fn_m = _FILENAME_RE.search(disposition)
            filename = fn_m.group(1) if fn_m else None
        else:
            fields[name] = (payload or b"").decode("utf-8", "replace")
    return data, filename, fields


class KgServer:
    """Runs pipeline extractions for HTTP requests over one session."""

    def __init__(self, spark, config=None, knowledge_base: Optional[dict] = None):
        from kgmwcp.pipeline import Pipeline, PipelineConfig

        self.spark = spark
        # a full PipelineConfig rides through from the CLI so --serve
        # honors --greedy/--router/--buckets exactly like a batch run
        # (code-review finding: a hardcoded config silently ignored them)
        self.config = config or PipelineConfig(
            n_buckets=8, knowledge_base=knowledge_base or {})
        self.pipeline = Pipeline(self.config)

    def parser_groups(self) -> list:
        from kgmwcp.engine.parsers import RULE_GROUPS

        return sorted(RULE_GROUPS)

    def descriptions(self) -> list:
        """[name, author, description] per rule — the reference's
        backwards-compat listing (server.py:134-146, tuples jsonify as
        arrays).  Author is the rule's source: 'kgmwcp' for built-ins,
        the registered directory for --parser-dir rules."""
        from kgmwcp.engine.parsers import RULE_GROUPS
        from kgmwcp.engine.registry import rule_source

        return [
            [rule.name(), rule_source(rule, group), rule.DESCRIPTION]
            for group in sorted(RULE_GROUPS)
            for rule in RULE_GROUPS[group]
        ]

    def run(self, data: bytes, name: str, parser: Optional[str] = None,
            include_file_data: bool = False,
            want_stix: bool = False):
        """One uploaded blob -> its report document (the same report_json
        the batch pipeline writes).  ``parser`` must already be
        validated by the caller (the handler 400s unknown groups).

        ``include_file_data`` runs a config variant whose File elements
        carry base64 payloads (the zip output needs the residual bytes);
        ``want_stix`` returns (report, stix_bundle_dict) instead."""
        import dataclasses

        from kgmwcp.stages.ingest import single_sample_docs

        pipeline = self.pipeline
        if include_file_data and not self.config.include_file_data:
            if not hasattr(self, "_pipeline_filedata"):
                from kgmwcp.pipeline import Pipeline

                self._pipeline_filedata = Pipeline(dataclasses.replace(
                    self.config, emit_file_data=True,
                    include_file_data=True))
            pipeline = self._pipeline_filedata
        docs = single_sample_docs(self.spark, data, name, route=parser)
        tables = pipeline.run(docs)
        try:
            rows = tables["reports"].select("report_json").collect()
            stix = None
            if want_stix:
                stix_rows = tables["stix"].select("bundle_json").collect()
                assert len(stix_rows) == 1
                stix = json.loads(stix_rows[0]["bundle_json"])
        finally:
            # Pipeline.run persists the records barrier; a long-running
            # server must not leak one cached relation per request
            tables["records"].unpersist()
        assert len(rows) == 1, f"expected one report, got {len(rows)}"
        report = json.loads(rows[0]["report_json"])
        if want_stix:
            return report, stix
        return report


# reference server.py:74-76 (verbatim deprecation-warning errors entry)
_RUN_PARSERS_DEP_WARNING = (
    "Running multiple parsers in a single request will be changed "
    "future version.")

_UPLOAD_FORM = """<!DOCTYPE html>
<html><head><title>kgmwcp upload</title></head><body>
<h1>kgmwcp — run a parser</h1>
<form action="/run_parser" method="post" enctype="multipart/form-data">
  <label>File: <input type="file" name="data"></label><br>
  <label>Parser: <select name="parser">
    <option value="">(auto)</option>
    {options}
  </select></label><br>
  <input type="submit" value="Run">
</form></body></html>"""


def make_server(spark, host: str = "127.0.0.1", port: int = 0,
                config=None,
                knowledge_base: Optional[dict] = None,
                max_body: int = 64 << 20,
                disable_logs_endpoint: bool = False) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``.server_address`` has
    the bound port (port=0 picks an ephemeral one).  Call
    ``serve_forever()`` to run; ``shutdown()`` to stop.

    ``max_body`` caps Content-Length (413 before the body is read — one
    oversized upload must not exhaust driver memory);
    ``disable_logs_endpoint`` mirrors the reference's
    ``DISABLE_LOGS_ENDPOINT`` app-config key (server.py:167-171)."""
    kg = KgServer(spark, config=config, knowledge_base=knowledge_base)

    class Handler(BaseHTTPRequestHandler):
        def _send_json(self, obj, status: int = 200) -> None:
            payload = json.dumps(obj).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _send_html(self, html: str, status: int = 200) -> None:
            payload = html.encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *args):  # quiet: tests/CLI own stderr
            pass

        def do_GET(self):
            path = self.path.split("?", 1)[0].rstrip("/")
            if path == "":
                self._send_json({
                    "service": "kgmwcp",
                    "endpoints": ["GET /parsers", "GET /descriptions",
                                  "GET /schema.json", "GET /logs",
                                  "GET /upload", "POST /run_parser",
                                  "POST /run_parser/<parser>",
                                  "POST /run_parsers/<parsers>"],
                })
            elif path == "/parsers":
                self._send_json({"parsers": kg.parser_groups()})
            elif path == "/descriptions":
                # reference server.py:134-146: bare JSON array of
                # (name, author, description) tuples
                self._send_json(kg.descriptions())
            elif path == "/schema.json":
                from kgmwcp.schema import report_json_schema

                self._send_json(report_json_schema())
            elif path == "/logs":
                # reference strings verbatim, server.py:157-173
                if disable_logs_endpoint:
                    self._send_json({"errors": [
                        "Logs endpoint has been disabled by configuration"
                    ]}, 403)
                else:
                    self._send_json({"errors": [
                        "Logs endpoint is no longer supported."]})
            elif path == "/upload":
                # group names come from --parser-dir module globals —
                # escape both value and label (review finding)
                options = "\n    ".join(
                    '<option value="{0}">{0}</option>'.format(
                        html.escape(g, quote=True))
                    for g in kg.parser_groups())
                self._send_html(_UPLOAD_FORM.format(options=options))
            else:
                self._send_json({"errors": ["not found"]}, 404)

        def _read_upload(self):
            """-> (data, filename, fields) or None after sending an
            error response (oversized body / no file)."""
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                self._send_json(
                    {"errors": ["invalid Content-Length header"]}, 400)
                return None
            if length > max_body:
                self._send_json(
                    {"errors": [f"request body too large "
                                f"({length} > {max_body} bytes)"]}, 413)
                return None
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            data, filename, fields = (None, None, {})
            if ctype.startswith("multipart/form-data"):
                data, filename, fields = _parse_multipart(ctype, body)
            elif body:
                data = body  # raw-body convenience path
            if not data:
                # reference error string, server.py:95,423
                self._send_json({"errors": ["No input file provided"]}, 400)
                return None
            return data, filename, fields

        def _send_bytes(self, payload: bytes, ctype: str,
                        download_name: Optional[str] = None,
                        status: int = 200) -> None:
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            if download_name:
                # the name derives from the user-supplied upload
                # filename: quotes break the quoted-string and CR/LF
                # would inject headers — strip all three (review finding)
                safe = re.sub(r'["\r\n\\]', "_", download_name)
                self.send_header(
                    "Content-Disposition",
                    f'attachment; filename="{safe}"')
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        @staticmethod
        def _build_zip(report: dict, text: str) -> bytes:
            """The reference's zip response (server.py:270-301):
            files/ holds every residual File element's payload
            (collision-safe {md5:5}_{name}, the residual_files/ batch
            convention), plus results.json and results.txt."""
            import base64
            import io
            import zipfile

            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
                for el in report.get("metadata", []):
                    if el.get("type") == "file" and el.get("data"):
                        fname = "".join(
                            ch if (ch.isalnum() or ch in "._-") else "_"
                            for ch in (el.get("name") or "residual.bin"))
                        zf.writestr(
                            f"files/{(el.get('md5') or '')[:5]}_{fname}",
                            base64.b64decode(el["data"]))
                zf.writestr("results.json", json.dumps(report, indent=2))
                zf.writestr("results.txt",
                            text.encode("ascii", "backslashreplace"))
            return buf.getvalue()

        def do_POST(self):
            multi = re.fullmatch(r"/run_parsers/(.+?)/?", self.path.split("?", 1)[0])
            if multi:
                self._run_parsers(multi.group(1))
                return
            from urllib.parse import parse_qs, urlsplit

            split = urlsplit(self.path)
            query = {k: v[-1] for k, v in parse_qs(split.query).items()}
            match = re.fullmatch(r"/run_parser(?:/([^/]+))?/?", split.path)
            if not match:
                self._send_json({"errors": ["not found"]}, 404)
                return
            parser = match.group(1)
            upload = self._read_upload()
            if upload is None:
                return
            data, filename, fields = upload
            parser = parser or fields.get("parser") or None
            # reference server.py:304-310: output from URL params or form
            # fields, unknown values fall back to json
            output = (query.get("output") or fields.get("output")
                      or "json").lower()
            if output not in ("json", "text", "zip", "stix"):
                output = "json"
            # validate the group BEFORE running — an over-broad
            # `except KeyError` around kg.run would misreport internal
            # KeyErrors as client errors (code-review finding)
            if parser is not None and parser not in kg.parser_groups():
                self._send_json(
                    {"errors": [f"unknown parser group: {parser}"]}, 400)
                return
            try:
                result = kg.run(data, filename or "upload.bin", parser,
                                include_file_data=(output == "zip"),
                                want_stix=(output == "stix"))
            except Exception as exc:  # surface as a 500, don't kill the thread
                self._send_json({"errors": [f"extraction failed: {exc}"]}, 500)
                return
            if output == "stix":
                report, stix = result
                self._send_json(stix)
                return
            report = result
            if output == "json":
                self._send_json(report)
                return
            from kgmwcp.render import render_report

            text = render_report(report, "text")
            if output == "text":
                self._send_bytes(text.encode("utf-8"),
                                 "text/plain; charset=utf-8")
                return
            # output == "zip" — reference download name, server.py:341-345
            self._send_bytes(
                self._build_zip(report, text), "application/zip",
                download_name=f"{filename or 'upload.bin'}_mwcp_output.zip")

        def _run_parsers(self, parsers_path: str) -> None:
            """POST /run_parsers/<p1>/<p2>/... — same input through each
            named group (reference server.py:63-97): response maps each
            parser name to its report, plus the reference's deprecation
            warning under "errors"."""
            upload = self._read_upload()
            if upload is None:
                return
            data, filename, _ = upload
            output: dict = {"errors": [_RUN_PARSERS_DEP_WARNING]}
            for parser in parsers_path.split("/"):
                if not parser:
                    continue  # reference skips empty segments, :90-91
                if parser not in kg.parser_groups():
                    output[parser] = {
                        "errors": [f"unknown parser group: {parser}"]}
                    continue
                try:
                    output[parser] = kg.run(
                        data, filename or "upload.bin", parser)
                except Exception as exc:
                    output[parser] = {
                        "errors": [f"extraction failed: {exc}"]}
            self._send_json(output)

    return ThreadingHTTPServer((host, port), Handler)
