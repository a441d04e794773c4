"""Driver-side text / markdown report rendering (SURVEY.md S12).

Renders a collected report document (the ``report_json`` the pipeline
writes) the way the reference CLI's default writers do
(mwcp/report_writers.py:92-385): an input-file pivot table, one table
per metadata type in class-name order, ``Other`` as a trailing
Miscellaneous table, residual ``File`` entries with customized columns,
then Errors/Logs code blocks.  Formats: ``text`` (the reference's
"simple" tabulate style), ``md`` (pipe tables, newlines as <br>) and
``html`` (escaped table markup, multi-line cells wrapped in <pre> —
reference HTMLWriter, report_writers.py:338-365).

This is presentation, not a distributed stage — it runs on the driver
over collected rows, so there is no tabulate dependency (the container
doesn't ship it); the two table styles are formatted here.

Documented deviations from the reference writer:
* element-table columns are sorted key order with ``tags`` first (the
  canonical obj JSON is sorted; the reference keeps attrs declaration
  order);
* table rows keep the report's canonical entry order (the reference
  keeps parser emission order, which the distributed collect_set
  canonicalized away).
"""

from __future__ import annotations

import json
import textwrap
from typing import Dict, List, Optional, Tuple

__all__ = ["render_report", "render_reports_df", "legacy_csv_rows",
           "write_legacy_csv", "FORMATS"]

# per-report markup formats; the legacy long CSV (write_legacy_csv) is a
# separate single-file output wired as CLI --format csv
FORMATS = ("text", "md", "html")

_MAX_COL_WIDTH = 100
_MAX_COL_INT_WIDTH = 50

# pred -> reference metadata class name (mwcp/metadata.py element classes;
# the writer titles and ORDERS tables by __name__, report_writers.py:244)
_CLASS_NAME = {
    "alphabet": "Alphabet", "command": "Command", "credential": "Credential",
    "crypto_address": "CryptoAddress", "decoded_string": "DecodedString",
    "email_address": "EmailAddress", "encryption_key": "EncryptionKey",
    "event": "Event", "file": "File", "injection_process": "InjectionProcess",
    "interval": "Interval", "interval_legacy": "IntervalLegacy",
    "mission_id": "MissionID", "mutex": "Mutex", "network": "Network",
    "other": "Other", "path": "Path2", "pipe": "Pipe",
    "registry": "Registry2", "rsa_private_key": "RSAPrivateKey",
    "rsa_public_key": "RSAPublicKey", "scheduled_task": "ScheduledTask",
    "service": "Service", "socket": "Socket", "ssl_cert_sha1": "SSLCertSHA1",
    "url": "URL", "user_agent": "UserAgent", "uuid": "UUID",
    "uuid_legacy": "UUIDLegacy", "version": "Version",
}


def _camel_case_to_title(name: str) -> str:
    """mwcp/report_writers.py:14-26 — CamelCase -> spaced title, with the
    '2' transition suffix stripped."""
    import re

    name = name.rstrip("2")
    return re.sub(
        r"([a-z])([A-Z])", r"\g<1> \g<2>",
        re.sub(r"([A-Z][a-z])", r" \g<1>", name).strip(),
    )


def _flatten(payload: dict, prefix: str = "") -> Tuple[Dict[str, object], List[str]]:
    """Flat (dotted-key -> scalar) view of an element payload plus the
    merged tags of the element and any nested child elements — the shape
    of the reference's ``as_formatted_dict(flat=True)``."""
    flat: Dict[str, object] = {}
    tags: List[str] = []
    for key, value in payload.items():
        if key == "type":
            continue
        if key == "tags":
            tags.extend(value or [])
            continue
        dotted = f"{prefix}{key}"
        if isinstance(value, dict):
            child_flat, child_tags = _flatten(value, prefix=f"{dotted}.")
            flat.update(child_flat)
            tags.extend(child_tags)
        else:
            flat[dotted] = value
    return flat, tags


def _title_key(key: str) -> str:
    return key.replace("_", " ").replace(".", " / ").title()


def _format_cell(value, fmt: str) -> str:
    """report_writers.py:104-138 — lists join, long values wrap."""
    if value is None:
        return ""
    if isinstance(value, list):
        value = ", ".join(str(v) for v in value)
    max_width = _MAX_COL_INT_WIDTH if isinstance(value, int) and not isinstance(
        value, bool) else _MAX_COL_WIDTH
    text = str(value)
    col_width = max((len(line) for line in text.splitlines()), default=0)
    if col_width > max_width:
        text = textwrap.fill(
            text, width=max_width,
            subsequent_indent="  " if fmt == "text" else "",
            tabsize=4, replace_whitespace=False,
        )
    if fmt == "md":
        text = text.replace("\n", "<br>")
    elif fmt == "html":
        import html as _html

        text = _html.escape(text)
        if "\n" in text:
            # preserve whitespace (report_writers.py:346-351)
            text = f"<pre>{text}</pre>"
    return text


def _table(rows: List[List[str]], headers: List[str], fmt: str) -> str:
    """Minimal 'simple' / 'pipe' tabulate-style formatter.  Cells may be
    multi-line in text mode (wrapped values); each logical row expands to
    the needed physical lines."""
    cells = [[cell.splitlines() or [""] for cell in row] for row in rows]
    widths = [len(h) for h in headers]
    for row in cells:
        for i, lines in enumerate(row):
            widths[i] = max(widths[i], *(len(ln) for ln in lines))

    def pad(line_parts: List[str], sep: str) -> str:
        return sep.join(
            part.ljust(widths[i]) for i, part in enumerate(line_parts)
        ).rstrip()

    out: List[str] = []
    if fmt == "html":
        import html as _html

        out.append("<table>")
        out.append("<thead><tr>" + "".join(
            f"<th>{_html.escape(h)}</th>" for h in headers) + "</tr></thead>")
        out.append("<tbody>")
        for row in rows:
            # cells were already escaped (and <pre>-wrapped) by _format_cell
            out.append("<tr>" + "".join(
                f"<td>{cell}</td>" for cell in row) + "</tr>")
        out.append("</tbody>")
        out.append("</table>")
    elif fmt == "md":
        out.append("| " + " | ".join(
            h.ljust(widths[i]) for i, h in enumerate(headers)) + " |")
        out.append("|" + "|".join("-" * (w + 2) for w in widths) + "|")
        for row in cells:
            out.append("| " + " | ".join(
                lines[0].ljust(widths[i]) for i, lines in enumerate(row)) + " |")
    else:
        out.append(pad(headers, "  "))
        out.append("  ".join("-" * w for w in widths))
        for row in cells:
            height = max(len(lines) for lines in row)
            for ln in range(height):
                out.append(pad(
                    [lines[ln] if ln < len(lines) else "" for lines in row],
                    "  "))
    return "\n".join(out) + "\n\n"


def _h1(text: str, fmt: str) -> str:
    if fmt == "html":
        import html as _html

        return f"<h1>{_html.escape(text)}</h1>\n"
    return f"# {text}\n" if fmt == "md" else f"----- {text} -----\n"


def _h2(text: str, fmt: str) -> str:
    if fmt == "html":
        import html as _html

        return f"<h2>{_html.escape(text)}</h2>\n"
    return f"## {text}\n" if fmt == "md" else f"---- {text} ----\n"


def _code_block(text: str, fmt: str) -> str:
    if not text.endswith("\n"):
        text += "\n"
    if fmt == "html":
        import html as _html

        return f"<pre>\n{_html.escape(text)}</pre>\n\n"
    return f"```\n{text}```\n\n" if fmt == "md" else text + "\n"


def _element_table(elements: List[dict], fmt: str) -> str:
    """report_writers.py:166-199 — one table per type; tags first,
    empty values stripped, keys titled."""
    flats = []
    includes_tags = False
    all_keys: List[str] = []
    for payload in elements:
        flat, tags = _flatten(payload)
        tags = sorted(set(tags))
        if tags:
            includes_tags = True
        entry = {"tags": tags}
        for key in sorted(flat):
            value = flat[key]
            if value or value == 0:
                entry[key] = value
                if key not in all_keys:
                    all_keys.append(key)
        flats.append(entry)
    columns = (["tags"] if includes_tags else []) + all_keys
    headers = [_title_key(k) for k in columns]
    rows = [
        [_format_cell(entry.get(k), fmt) for k in columns]
        for entry in flats
    ]
    return _table(rows, headers, fmt)


def render_report(report: dict, fmt: str = "text") -> str:
    """One collected report document -> rendered text/markdown."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format: {fmt} (known: {FORMATS})")
    out: List[str] = []
    input_file = report.get("input_file") or {}

    out.append(_h1(f"File: {input_file.get('name')}", fmt))
    pivot = [
        ["Parser", report.get("parser")],
        ["File Path", input_file.get("file_path")],
        ["Description", input_file.get("description")],
        ["Architecture", input_file.get("architecture")],
        ["MD5", input_file.get("md5")],
        ["SHA1", input_file.get("sha1")],
        ["SHA256", input_file.get("sha256")],
        ["Compile Time", input_file.get("compile_time")],
    ]
    # provenance extension of this pipeline's report model
    if input_file.get("repo") is not None:
        pivot.append(["Repo", input_file.get("repo")])
    if input_file.get("commit") is not None:
        pivot.append(["Commit", input_file.get("commit")])
    if input_file.get("derivation"):
        pivot.append(["Derivation", input_file.get("derivation")])
    if input_file.get("tags"):
        pivot.append(["Tags", ", ".join(input_file["tags"])])
    out.append(_table(
        [[f, _format_cell(v, fmt)] for f, v in pivot],
        ["Field", "Value"], fmt))

    ek = report.get("external_knowledge") or {}
    if ek:
        out.append(_h2("External Knowledge", fmt))
        # keys are user-supplied too — escape them like every other cell
        out.append(_table(
            sorted([_format_cell(k, fmt), _format_cell(v, fmt)]
                   for k, v in ek.items()),
            ["Field", "Value"], fmt))

    by_class: Dict[str, List[dict]] = {}
    for element in report.get("metadata", []):
        cls = _CLASS_NAME.get(element.get("type"), element.get("type", ""))
        by_class.setdefault(cls, []).append(element)

    for cls in sorted(by_class):
        if cls in ("Other", "File"):
            continue
        table_name = _camel_case_to_title(cls)
        if table_name.endswith(" Legacy"):
            table_name = table_name[: -len(" Legacy")]
        out.append(_h2(table_name, fmt))
        out.append(_element_table(by_class[cls], fmt))

    misc = by_class.get("Other", [])
    if misc:
        out.append(_h2("Miscellaneous", fmt))
        # flatten key/value: the Other's key becomes the column
        # (report_writers.py:73-76)
        flattened = [
            {"type": "other", "tags": o.get("tags", []),
             o.get("key", "key"): o.get("value")}
            for o in misc
        ]
        out.append(_element_table(flattened, fmt))

    residual = by_class.get("File", [])
    if residual:
        out.append(_h2("Residual Files", fmt))
        include_tags = any(f.get("tags") for f in residual)
        headers = ["Filename", "Description", "Derivation", "MD5", "Arch",
                   "Compile Time"]
        rows = []
        for f in residual:
            row = [f.get("name"), f.get("description"), f.get("derivation"),
                   f.get("md5"), f.get("architecture"), f.get("compile_time")]
            if include_tags:
                row = [", ".join(f.get("tags", []))] + row
            rows.append([_format_cell(v, fmt) for v in row])
        if include_tags:
            headers = ["Tags"] + headers
        out.append(_table(rows, headers, fmt))

    if report.get("errors"):
        out.append(_h2("Errors", fmt))
        out.append(_code_block("\n".join(report["errors"]), fmt))
    if report.get("logs"):
        out.append(_h2("Logs", fmt))
        out.append(_code_block("\n".join(report["logs"]), fmt))
    return "".join(out)


def _flatten_legacy(payload: dict) -> Dict[str, object]:
    """The reference's ``metadata._flatten_dict`` (metadata.py:142-169):
    nested element dicts are inlined, child keys get a ``parent.`` prefix
    ONLY when they collide with a key of the enclosing dict, nested tags
    consolidate into the parent's ``tags``, and ``type`` discriminators
    are dropped.  The parent's own ``tags`` is processed first (attrs
    declaration order in the reference — with sorted-JSON payload order a
    later plain ``tags`` key would clobber already-consolidated child
    tags)."""
    keys = (["tags"] if "tags" in payload else []) + [
        k for k in payload if k != "tags"]
    flat: Dict[str, object] = {}
    for key in keys:
        value = payload[key]
        if isinstance(value, dict):
            child = dict(value)
            child.pop("type", None)
            child_tags = child.pop("tags", None)
            flat.update({
                f"{key}.{k}" if k in payload else k: v
                for k, v in _flatten_legacy(child).items()
            })
            if child_tags:
                flat.setdefault("tags", [])
                flat["tags"] = list(flat["tags"]) + list(child_tags)
        else:
            flat[key] = value
    flat.pop("type", None)
    return flat


def legacy_csv_rows(report: dict) -> List[tuple]:
    """One report document -> (MD5, MetaIndex, Category, Field, Value)
    rows — the reference's legacy long CSV shape
    (report_writers.py:43-89 DataFrameWriter): an Input File block at
    MetaIndex 0, then one block per element with the title-cased class
    name as Category, tags split into their own sorted rows, and
    ``Other`` elements flattened so the key becomes the Field.  Values
    are stringified (None stays null -> empty CSV cell), matching the
    pandas-to-csv rendering of the reference.  Documented deviation
    (same as render_report): element and field order follow the
    canonical report document, not parser emission / attrs declaration
    order."""
    rows: List[tuple] = []
    input_file = report.get("input_file") or {}
    md5 = input_file.get("md5")

    def emit(mi, category, field, value):
        if isinstance(value, bool):
            value = str(value)
        elif value is not None and not isinstance(value, str):
            value = str(value)
        rows.append((md5, mi, category, field, value))

    category = "Input File"
    emit(0, category, "parser", report.get("parser"))
    emit(0, category, "filename", input_file.get("name"))
    emit(0, category, "description", input_file.get("description"))
    emit(0, category, "architecture", input_file.get("architecture"))
    emit(0, category, "compile_time", input_file.get("compile_time"))
    emit(0, category, "derivation", input_file.get("derivation"))
    for tag in input_file.get("tags") or []:
        emit(0, category, "tag", tag)

    for meta_index, element in enumerate(report.get("metadata", []), start=1):
        cls = _CLASS_NAME.get(element.get("type"), element.get("type", ""))
        category = _camel_case_to_title(cls)
        flat = _flatten_legacy(element)
        if category == "Other" and "key" in flat:
            # report_writers.py:73-76 — the Other's key becomes the Field.
            # Deliberately bug-for-bug, including the degenerate cases:
            # an Other with key == 'key' assigns then deletes its own
            # field (the element vanishes from the CSV, exactly as the
            # reference's `row_dict[row_dict["key"]] = ...; del
            # row_dict["key"]` does), and key == 'tags' routes the value
            # through the tag emitter (pinned in test_cli.py).
            flat[flat["key"]] = flat.pop("value", None)
            del flat["key"]
        for key, value in flat.items():
            if key == "tags":
                for tag in sorted(value or []):
                    emit(meta_index, category, "tag", tag)
            else:
                emit(meta_index, category, key, value)
    return rows


def write_legacy_csv(reports, out_path: str) -> int:
    """Stream every report (ordered by root_sha256 for determinism) into
    one legacy-format CSV; returns the number of reports written.
    Driver-side presentation output, same as render_reports_df."""
    import csv
    import pathlib

    path = pathlib.Path(out_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with open(path, "w", newline="") as fh:
        writer = csv.writer(fh, lineterminator="\n")
        writer.writerow(["MD5", "MetaIndex", "Category", "Field", "Value"])
        it = (reports.select("root_sha256", "report_json")
              .orderBy("root_sha256").toLocalIterator())
        for row in it:
            for out in legacy_csv_rows(json.loads(row["report_json"])):
                writer.writerow(["" if v is None else v for v in out])
            n += 1
    return n


def render_reports_df(reports, out_dir: str, fmt: str = "text",
                      limit: Optional[int] = None) -> int:
    """Render every report in a (root_sha256, ..., report_json) DataFrame
    to ``{out_dir}/{root_sha256}.{txt|md}``.  Streams partitions through
    the driver (toLocalIterator) — presentation output, not a Spark sink."""
    import pathlib

    ext = {"md": "md", "html": "html"}.get(fmt, "txt")
    path = pathlib.Path(out_dir)
    path.mkdir(parents=True, exist_ok=True)
    n = 0
    for row in reports.select("root_sha256", "report_json").toLocalIterator():
        (path / f"{row['root_sha256']}.{ext}").write_text(
            render_report(json.loads(row["report_json"]), fmt))
        n += 1
        if limit is not None and n >= limit:
            break
    return n
