"""Spark schemas for every table the pipeline produces or consumes."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Input corpus — shape fixed by BASELINE.json input_hint.
DOCUMENTS_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("content", StringType()),
])

# Optional per-row routing column (YARA-routing analogue,
# mwcp/runner.py:158-209): restricts a row to one parser group.
ROUTE_COLUMN = "route"

# stage-0 output: documents + identity columns
SAMPLES_SCHEMA = StructType(list(DOCUMENTS_SCHEMA) + [
    StructField(ROUTE_COLUMN, StringType()),
    StructField("content_bin", BinaryType()),
    StructField("sha256", StringType()),
    StructField("md5", StringType()),
    StructField("size", LongType()),
    StructField("bucket", IntegerType()),
])

# extract-stage output: one unified record stream (mentions + file tree rows)
EXTRACT_SCHEMA = StructType([
    StructField("kind", StringType()),          # 'mention' | 'file_node'
    StructField("root_sha256", StringType()),
    StructField("subj", StringType()),          # attributed source sha256
    StructField("pred", StringType()),          # Element type name
    StructField("obj", StringType()),           # canonical JSON payload
    # file-tree columns (kind='file_node')
    StructField("file_sha256", StringType()),
    StructField("file_md5", StringType()),
    StructField("file_name", StringType()),
    StructField("file_description", StringType()),
    StructField("file_derivation", StringType()),
    StructField("parent_sha256", StringType()),
    StructField("depth", IntegerType()),
    # provenance
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("parser", StringType()),        # rule that parsed the subject
    StructField("error", StringType()),
    StructField("bucket", IntegerType()),
    # residual payload bytes (kind='file_node', output_file children only,
    # and ONLY when PipelineConfig.emit_file_data is on — all-null
    # otherwise, which costs a validity bitmap and nothing more)
    StructField("file_data", BinaryType()),
])

TRIPLES_SCHEMA = StructType([
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
])

NODES_SCHEMA = StructType([
    StructField("entity_id", StringType()),
    StructField("entity_kind", StringType()),
    StructField("canonical_value", StringType()),
    StructField("payload", StringType()),
    StructField("n_mentions", LongType()),
    StructField("n_samples", LongType()),
])

EDGES_SCHEMA = StructType([
    StructField("src", StringType()),    # sample sha256 or parent file sha256
    StructField("rel", StringType()),    # pred, or 'dispatched' for file tree
    StructField("dst", StringType()),    # entity_id or child sha256
    StructField("repo", StringType()),
])

MANIFEST_SCHEMA = StructType([
    StructField("bucket", IntegerType()),
    StructField("n_rows", LongType()),
    StructField("n_roots", LongType()),
    StructField("status", StringType()),
])


# ---------------------------------------------------------------------------
# JSON Schema export of the report document (reference mwcp/core.py:87-110
# exports metadata.Report.schema(); the CLI surfaces it as `mwcp schema`,
# cli.py:927-934).  Here the element field sets come straight from the
# canonical element model, so the schema can never drift from the emitters.
# ---------------------------------------------------------------------------

_SCHEMA_ID = "https://example.invalid/kgmwcp/report-schema.json"

# (pred, field) -> JSON types; default is ["string", "null"]
_FIELD_TYPES = {
    ("socket", "port"): ["integer", "null"],
    ("socket", "listen"): ["boolean", "null"],
    ("path", "is_dir"): ["boolean", "null"],
    ("path", "posix"): ["boolean", "null"],
    ("other", "value"): ["string", "integer", "boolean", "null"],
    ("alphabet", "base"): ["integer", "null"],
    ("interval", "value"): ["number", "null"],
    ("scheduled_task", "actions"): ["array", "null"],
    ("registry", "data"): ["string", "integer", "null"],
}
_INT_ELEMENTS = {"rsa_public_key", "rsa_private_key"}
# nested sub-element fields -> their element defs
_NESTED_REFS = {
    ("network", "url"): "url",
    ("network", "socket"): "socket",
    ("network", "credential"): "credential",
}


def _element_def(pred: str, fields: tuple) -> dict:
    props = {
        "type": {"const": pred},
        "tags": {"type": "array", "items": {"type": "string"}},
    }
    for field in fields:
        if (pred, field) in _NESTED_REFS:
            props[field] = {"anyOf": [
                {"$ref": f"#/$defs/{_NESTED_REFS[(pred, field)]}"},
                {"type": "null"},
            ]}
        elif pred in _INT_ELEMENTS:
            props[field] = {"type": ["integer", "null"]}
        else:
            props[field] = {"type": _FIELD_TYPES.get(
                (pred, field), ["string", "null"])}
    if pred == "other":
        props["value_format"] = {
            "enum": ["string", "integer", "boolean", "bytes", None]}
    return {
        "type": "object",
        "properties": props,
        "required": ["type", "tags"],
        "additionalProperties": False,
    }


def report_json_schema(schema_id: str = _SCHEMA_ID) -> dict:
    """JSON Schema (draft 2019-09) for one ``report_json`` document."""
    from kgmwcp.canonical import ELEMENT_CLASSES

    defs = {
        pred: _element_def(pred, cls.FIELDS)
        for pred, cls in sorted(ELEMENT_CLASSES.items())
    }
    input_file_props = {
        "type": {"const": "file"},
        **{f: {"type": ["string", "null"]}
           for f in ("name", "description", "md5", "sha256", "repo",
                     "file_path", "commit")},
    }
    return {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": schema_id,
        "type": "object",
        "properties": {
            "type": {"const": "report"},
            "input_file": {
                "type": "object",
                "properties": input_file_props,
                "required": ["type", "name", "md5", "sha256"],
                "additionalProperties": False,
            },
            "parser": {"type": ["string", "null"]},
            "recursive": {"type": "boolean"},
            "external_knowledge": {"type": "object"},
            "errors": {"type": "array", "items": {"type": "string"}},
            "logs": {"type": "array", "items": {"type": "string"}},
            "metadata": {
                "type": "array",
                "items": {"anyOf": [
                    {"$ref": f"#/$defs/{pred}"} for pred in sorted(defs)
                ]},
            },
        },
        "required": ["type", "input_file", "parser", "recursive",
                     "external_knowledge", "errors", "logs", "metadata"],
        "additionalProperties": False,
        "$defs": defs,
    }


def triples_obj_schema(schema_id: str = _SCHEMA_ID) -> dict:
    """JSON Schema for a triples-table ``obj`` payload (no injected type
    discriminator — keyed externally by ``pred``)."""
    from kgmwcp.canonical import ELEMENT_CLASSES

    defs = {}
    for pred, cls in sorted(ELEMENT_CLASSES.items()):
        d = _element_def(pred, cls.FIELDS)
        # top-level objs carry no discriminator (pred keys them externally)
        # but NESTED sub-elements do (payload(nested=True)) — keep ``type``
        # allowed, just not required
        d["required"] = ["tags"]
        defs[pred] = d
    return {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": schema_id,
        "anyOf": [{"$ref": f"#/$defs/{pred}"} for pred in sorted(defs)],
        "$defs": defs,
    }
