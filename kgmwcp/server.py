"""REST serving layer — SURVEY §2 S14 (reference
mwcp/tools/server/server.py:39-97, the flask `mwcp serve` tool).

Stdlib-only (http.server + email-package multipart parsing — flask is
not in the container).  The server holds ONE SparkSession and serves
each request by running the SAME Pipeline a batch run uses on a
one-row corpus, so there is no second extraction code path to drift:

  GET  /                     -> service banner (endpoints)
  GET  /parsers              -> JSON list of parser groups
  POST /run_parser           -> report document for the uploaded file
  POST /run_parser/<parser>  -> routed to one parser group

The upload rides the multipart/form-data field ``data``
(reference-compatible, server.py:44-46) or, as a convenience, the raw
request body.  Errors mirror the reference's strings ("No input file
provided", unknown-parser 4xx).

Serving a distributed batch engine over HTTP is a dev/integration
surface, not the 100 TB path — per-request latency is one tiny Spark
job (~1-2 s warm); the scale story stays with the batch/streaming
pipeline.
"""

from __future__ import annotations

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

    def run(self, data: bytes, name: str, parser: Optional[str] = None) -> dict:
        """One uploaded blob -> its report document (the same report_json
        the batch pipeline writes).  ``parser`` must already be
        validated by the caller (the handler 400s unknown groups)."""
        from kgmwcp.stages.ingest import single_sample_docs

        docs = single_sample_docs(self.spark, data, name, route=parser)
        tables = self.pipeline.run(docs)
        try:
            rows = tables["reports"].select("report_json").collect()
        finally:
            # Pipeline.run persists the records barrier; a long-running
            # server must not leak one cached relation per request
            tables["records"].unpersist()
        assert len(rows) == 1, f"expected one report, got {len(rows)}"
        return json.loads(rows[0]["report_json"])


def make_server(spark, host: str = "127.0.0.1", port: int = 0,
                config=None,
                knowledge_base: Optional[dict] = None) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``.server_address`` has
    the bound port (port=0 picks an ephemeral one).  Call
    ``serve_forever()`` to run; ``shutdown()`` to stop."""
    kg = KgServer(spark, config=config, knowledge_base=knowledge_base)

    class Handler(BaseHTTPRequestHandler):
        def _send_json(self, obj, status: int = 200) -> None:
            payload = json.dumps(obj).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *args):  # quiet: tests/CLI own stderr
            pass

        def do_GET(self):
            if self.path.rstrip("/") == "":
                self._send_json({
                    "service": "kgmwcp",
                    "endpoints": ["GET /parsers", "POST /run_parser",
                                  "POST /run_parser/<parser>"],
                })
            elif self.path.rstrip("/") == "/parsers":
                self._send_json({"parsers": kg.parser_groups()})
            else:
                self._send_json({"errors": ["not found"]}, 404)

        def do_POST(self):
            match = re.fullmatch(r"/run_parser(?:/([^/]+))?/?", self.path)
            if not match:
                self._send_json({"errors": ["not found"]}, 404)
                return
            parser = match.group(1)
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            data, filename, fields = (None, None, {})
            if ctype.startswith("multipart/form-data"):
                data, filename, fields = _parse_multipart(ctype, body)
            elif body:
                data = body  # raw-body convenience path
            parser = parser or fields.get("parser") or None
            if not data:
                # reference error string, server.py:...run_parsers
                self._send_json({"errors": ["No input file provided"]}, 400)
                return
            # validate the group BEFORE running — an over-broad
            # `except KeyError` around kg.run would misreport internal
            # KeyErrors as client errors (code-review finding)
            if parser is not None and parser not in kg.parser_groups():
                self._send_json(
                    {"errors": [f"unknown parser group: {parser}"]}, 400)
                return
            try:
                report = kg.run(data, filename or "upload.bin", parser)
            except Exception as exc:  # surface as a 500, don't kill the thread
                self._send_json({"errors": [f"extraction failed: {exc}"]}, 500)
                return
            self._send_json(report)

    return ThreadingHTTPServer((host, port), Handler)
