"""Stage 6c — STIX 2.1 SDO/SCO JSON view (SURVEY.md S13 full form).

The reference serializes each report into a STIX 2.1 bundle
(mwcp/stix/report_writer.py:14-151): one SCO per indicator (url,
email-addr, ipv4-addr/domain-name, file, directory, mutex,
windows-registry-key), an x509-certificate keyed by the reference's own
uuid5 namespace (mwcp/metadata.py:185,2459-2461), and a closing
``malware-analysis`` SDO whose ``analysis_sco_refs`` lists the linked
objects.

Spark-first re-expression: everything — including the deterministic
UUIDv5 ids — is pure Column work.  STIX 2.1 SCO ids are UUIDv5 over the
canonical JSON of the id-contributing properties in the spec's SCO
namespace; UUIDv5 is SHA-1 of (namespace bytes + name) with version and
variant nibbles patched, which maps onto ``sha1`` + string surgery
(``translate`` patches the variant nibble), so id generation stays
inside whole-stage codegen and matches Python's ``uuid.uuid5`` bit for
bit (pinned in tests).

Note handling follows the reference writer (report_writer.py:37-89,
107-132): one master Note per report carrying "Description: ..." plus
every element's free-text note content (integer/boolean/empty ``Other``
values, File compile-time/architecture lines, metadata.py:2018-2035,
2857-2858), per-SCO "MWCP Tags: ..." notes for tagged elements
(metadata.py:477-489), and string-valued ``Other`` elements as
``observed-string`` extension SCOs (metadata.py:2026-2035,
stix/extensions.py:36-74).  Consolidation — identical content+labels
notes merged with object_refs unioned — is a groupBy: note ids are
uuid5 over the same (content + " / ".join(labels)) key the reference's
serialize() dedupes on, so equal-key notes land on one id and the refs
union is ``collect_set``.

Documented divergences from the reference writer:
* SDO/bundle/note ids are uuid5 over deterministic seeds instead of
  random uuid4 — deterministic output is a feature in a distributed
  pipeline (same rationale as the reference's ``fixed_timestamp`` knob);
* ``created``/``modified`` default to a fixed timestamp;
* master-note element lines are sorted (the reference keeps report
  insertion order, which a distributed groupBy cannot reproduce);
* boolean ``Other`` note values render JSON-style (true/false) rather
  than Python-style (True/False).
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgmwcp.stages.link import files_of, mentions_of

__all__ = ["stix_objects_of", "stix_bundles_of", "uuid5_expr"]

# STIX 2.1 spec namespace for SCO deterministic ids (section 2.9).
NAMESPACE_SCO = uuid.UUID("00abedb4-aa42-466c-9c01-fed23315a9b7")
# The reference's own namespace for non-SCO deterministic ids
# (mwcp/metadata.py:185).
NAMESPACE_MWCP = uuid.UUID("27b16a6a-0f3e-44e2-af1f-4b1c590278f4")

FIXED_TIMESTAMP = "2020-01-01T00:00:00.000Z"

_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def uuid5_expr(namespace, name: Column) -> Column:
    """``uuid.uuid5(namespace, name)`` as a Column (codegen, no Python):
    sha1 over namespace bytes + utf-8 name, version nibble forced to 5,
    variant nibble mapped onto 8-b via translate.  ``namespace`` is a
    uuid.UUID or a binary Column of namespace bytes."""
    ns = F.lit(namespace.bytes) if isinstance(namespace, uuid.UUID) else namespace
    h = F.sha1(F.concat(ns, F.encode(name, "utf-8")))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(
            F.translate(F.substring(h, 17, 1),
                        "0123456789abcdef", "89ab89ab89ab89ab"),
            F.substring(h, 18, 3),
        ),
        F.substring(h, 21, 12),
    )


def _sco_id(stix_type: str, key: Column) -> Column:
    return F.concat(F.lit(stix_type + "--"), uuid5_expr(NAMESPACE_SCO, key))


def _entry(stix_type: str, id_col: Column, props: Column) -> Column:
    """struct(stix_type, stix_id, stix_json) for one branch.

    '{"a":1}' props -> '{"type":"T","id":"...","a":1}' — the same string
    surgery as reports_of; props struct fields must be alphabetical so the
    output matches sort_keys canonical JSON."""
    head = F.concat(F.lit('{"type":"' + stix_type + '","id":"'), id_col)
    body = F.when(
        props.isNotNull() & (F.length(props) > 2),
        # '",' + props minus its opening brace (keeps the closing one)
        F.concat(head, F.lit('",'), props.substr(F.lit(2), F.length(props))),
    ).otherwise(F.concat(head, F.lit('"}')))
    return F.struct(
        F.lit(stix_type).alias("stix_type"),
        id_col.alias("stix_id"),
        body.alias("stix_json"),
    )


def _file_sco(name: Column, md5: Column, sha1: Column, sha256: Column) -> Column:
    """file SCO: id-contributing properties are hashes + name (STIX 2.1
    §6.5); alphabetical key order matches canonical sort_keys JSON."""
    hashes = F.struct(
        md5.alias("MD5"), sha1.alias("SHA-1"), sha256.alias("SHA-256"))
    props = F.to_json(F.struct(hashes.alias("hashes"), name.alias("name")))
    return _entry("file", _sco_id("file", props), props)


def stix_objects_of(records: DataFrame) -> DataFrame:
    """records -> (root_sha256, stix_type, stix_id, stix_json) — one SCO
    per mapped indicator plus one file SCO per tree file (roots and
    residual children).

    Expression-size discipline: the per-pred branching picks only small
    (type, id-key, props) strings; the uuid5/id/body machinery is built
    ONCE over the chosen values.  Inlining the sha1+surgery tree into
    every branch made the generated code so large that the first run
    spent >70 s in whole-stage codegen compilation (measured; warm runs
    were 3 s).  Likewise the payload JSON is parsed once via from_json
    instead of one get_json_object pass per field."""
    payload_schema = ("url string, value string, address string, "
                      "path string, is_dir boolean, name string, "
                      "md5 string, sha1 string, sha256 string, "
                      "public_exponent bigint, modulus string, "
                      "key string, value_format string, "
                      "architecture string, compile_time string, "
                      "tags array<string>")
    m = mentions_of(records).select(
        "root_sha256", "pred",
        F.from_json("obj", payload_schema).alias("o"),
    )

    def value_props(alias_name: str, col: Column) -> Column:
        return F.to_json(F.struct(col.alias(alias_name)))

    url_props = value_props("value", F.col("o.url"))
    addr_props = value_props("value", F.col("o.address"))
    email_props = value_props("value", F.col("o.value"))
    mutex_props = value_props("name", F.col("o.value"))
    dir_props = value_props("path", F.col("o.path"))
    # reference Path2.as_stix files carry only the basename
    # (metadata.py:584-599)
    base_name = F.element_at(F.split(F.col("o.path"), r"[\\/]"), -1)
    pathfile_props = value_props("name", base_name)
    file_props = F.to_json(F.struct(
        F.struct(
            F.col("o.md5").alias("MD5"),
            F.col("o.sha1").alias("SHA-1"),
            F.col("o.sha256").alias("SHA-256"),
        ).alias("hashes"),
        F.col("o.name").alias("name"),
    ))
    x509_props = F.to_json(F.struct(
        F.col("o.public_exponent").alias("subject_public_key_exponent"),
        F.col("o.modulus").alias("subject_public_key_modulus"),
    ))
    # x509 id keys use the reference's own namespace and seed
    # (mwcp/metadata.py:2459-2461: uuid5(ns, f"{exponent}//{modulus}"))
    x509_key = F.concat_ws("//", F.col("o.public_exponent"), F.col("o.modulus"))
    # string-valued Other -> observed-string extension SCO
    # (metadata.py:2026-2035; id-contributing props = [value, purpose],
    # stix/extensions.py:65); boolean/integer/empty values go to the master
    # note instead (metadata.py:2018-2025)
    other_is_note = (
        F.col("o.value_format").isin("boolean", "integer")
        | (F.col("o.value") == "")
    )
    purpose = F.lower(F.translate(F.col("o.key"), "_ ", "--"))
    obs_key = F.to_json(F.struct(
        purpose.alias("purpose"), F.col("o.value").alias("value")))
    obs_base = F.to_json(F.struct(
        F.col("o.value").alias("value"), purpose.alias("purpose")))
    obs_props = F.concat(
        obs_base.substr(F.lit(1), F.length(obs_base) - 1),
        F.lit(',"extensions":{"extension-definition--'
              '8b1aa84c-5532-4c69-a8e7-b6170facfd3d":'
              '{"extension_type":"new-sco"}}}'),
    )

    def pick(stix_type: str, key: Column, props: Column) -> Column:
        return F.struct(
            F.lit(stix_type).alias("t"), key.alias("k"), props.alias("p"))

    chosen = (
        F.when(F.col("pred") == "url", pick("url", url_props, url_props))
        .when((F.col("pred") == "socket") & F.col("o.address").rlike(_IPV4_RE),
              pick("ipv4-addr", addr_props, addr_props))
        .when((F.col("pred") == "socket") & F.col("o.address").isNotNull(),
              pick("domain-name", addr_props, addr_props))
        .when(F.col("pred") == "email_address",
              pick("email-addr", email_props, email_props))
        .when(F.col("pred") == "mutex", pick("mutex", mutex_props, mutex_props))
        .when((F.col("pred") == "path") & F.col("o.is_dir"),
              pick("directory", dir_props, dir_props))
        .when(F.col("pred") == "path", pick("file", pathfile_props, pathfile_props))
        .when(F.col("pred") == "file", pick("file", file_props, file_props))
        .when(F.col("pred") == "rsa_public_key",
              pick("x509-certificate", x509_key, x509_props))
        .when((F.col("pred") == "other") & ~other_is_note,
              pick("observed-string", obs_key, obs_props))
    )
    picked = (
        m.select("root_sha256", chosen.alias("c"), F.col("o.tags").alias("tags"))
        .filter(F.col("c").isNotNull())
        .select("root_sha256", "c.t", "c.k", "c.p", "tags")
    )
    ns = F.when(F.col("t") == "x509-certificate",
                F.lit(NAMESPACE_MWCP.bytes)).otherwise(F.lit(NAMESPACE_SCO.bytes))
    stix_id = F.concat(F.col("t"), F.lit("--"), uuid5_expr(ns, F.col("k")))
    head = F.concat(F.lit('{"type":"'), F.col("t"), F.lit('","id":"'), stix_id)
    body = F.when(
        F.col("p").isNotNull() & (F.length("p") > 2),
        F.concat(head, F.lit('",'), F.col("p").substr(F.lit(2), F.length("p"))),
    ).otherwise(F.concat(head, F.lit('"}')))
    with_ids = picked.select(
        "root_sha256",
        F.col("t").alias("stix_type"),
        stix_id.alias("stix_id"),
        body.alias("stix_json"),
        "tags",
    )
    mapped = with_ids.drop("tags").dropDuplicates(["root_sha256", "stix_id"])

    # per-SCO tag notes (metadata.py:477-489 as_stix_tags): content
    # "MWCP Tags: ...", labels = the element's tags, ref = the SCO id
    tag_notes = (
        with_ids
        .filter(F.size("tags") > 0)
        .select(
            "root_sha256",
            F.concat(F.lit("MWCP Tags: "),
                     F.array_join("tags", ", ")).alias("content"),
            F.col("tags").alias("labels"),
            F.col("stix_id").alias("ref"),
        )
    )

    # master-note element lines (report_writer.py:37,55-61)
    other_line = F.concat(
        F.col("o.key"), F.lit(": "), F.coalesce(F.col("o.value"), F.lit("")),
        F.when(F.size("o.tags") > 0,
               F.concat(F.lit("\n    "), F.col("o.key"), F.lit(" Tags: "),
                        F.array_join("o.tags", ", "))).otherwise(F.lit("")),
    )
    file_line = F.concat(
        F.lit("Compiled on: "), F.coalesce(F.col("o.compile_time"), F.lit("None")),
        F.lit("\nFor architecture: "),
        F.coalesce(F.col("o.architecture"), F.lit("None")),
    )
    note_line = (
        F.when((F.col("pred") == "other") & other_is_note, other_line)
        .when((F.col("pred") == "file")
              & (F.col("o.compile_time").isNotNull()
                 | F.col("o.architecture").isNotNull()), file_line)
    )
    lines = (
        m.select("root_sha256", note_line.alias("line"))
        .filter(F.col("line").isNotNull())
        .groupBy("root_sha256")
        .agg(F.array_sort(F.collect_list("line")).alias("lines"))
    )

    # root input files are not mention elements (output_file=False) but the
    # reference writes the sample's file SCO first
    # (report_writer.py:39-52); synthesize it from the file tree
    root_files = _root_files(records)
    roots = root_files.select(
        "root_sha256", "e.stix_type", "e.stix_id", "e.stix_json")

    # master note: "Description: ..." + sorted element lines, ref = the
    # sample's own file SCO (report_writer.py:37,75-89)
    empty = F.array().cast("array<string>")
    master_content = F.array_join(
        F.concat(
            F.array(F.concat(F.lit("Description: "),
                             F.coalesce(F.col("description"), F.lit("None")))),
            F.coalesce(F.col("lines"), empty),
        ),
        "\n",
    )
    master_notes = (
        root_files.join(lines, "root_sha256", "left")
        .select(
            "root_sha256",
            master_content.alias("content"),
            F.lit(None).cast("array<string>").alias("labels"),
            F.col("e.stix_id").alias("ref"),
        )
    )

    # consolidation (report_writer.py:107-132): the note id is uuid5 over
    # the same content + " / ".join(labels) key the reference dedupes on,
    # so equal-key notes collapse in this groupBy and refs union
    all_notes = tag_notes.unionByName(master_notes)
    grouped_notes = (
        all_notes.groupBy("root_sha256", "content", "labels")
        .agg(F.array_sort(F.collect_set("ref")).alias("object_refs"))
    )
    note_seed = F.concat(
        F.lit("note--"), F.col("content"),
        F.coalesce(F.array_join("labels", " / "), F.lit("")))
    note_id = F.concat(F.lit("note--"),
                       uuid5_expr(NAMESPACE_MWCP, note_seed))
    content_field = F.to_json(F.struct(F.col("content").alias("content")))
    note_json = F.concat(
        F.lit('{"type":"note","spec_version":"2.1","id":"'), note_id,
        F.lit('","created":"'), F.lit(FIXED_TIMESTAMP),
        F.lit('","modified":"'), F.lit(FIXED_TIMESTAMP), F.lit('",'),
        content_field.substr(F.lit(2), F.length(content_field) - 2),
        F.when(F.size("labels") > 0,
               F.concat(F.lit(',"labels":'), F.to_json("labels")))
        .otherwise(F.lit("")),
        F.lit(',"object_refs":'), F.to_json("object_refs"), F.lit("}"),
    )
    notes = grouped_notes.select(
        "root_sha256",
        F.lit("note").alias("stix_type"),
        note_id.alias("stix_id"),
        note_json.alias("stix_json"),
    )

    linked = mapped.unionByName(roots).dropDuplicates(
        ["root_sha256", "stix_id"]).withColumn("linked", F.lit(True))
    return linked.unionByName(notes.withColumn("linked", F.lit(False)))


def _root_files(records: DataFrame) -> DataFrame:
    """(root_sha256, e=file-SCO struct, parser) — one deterministic row per
    root.  Identical content can arrive under several names; pick the min
    (name, parser) like reports_of's provenance rule, so the sample's SCO
    id is stable across runs and matches the bundle's sample_ref."""
    return (
        files_of(records)
        .filter(F.col("depth") == 0)
        .groupBy(F.col("sha256").alias("root_sha256"), F.col("md5"))
        .agg(F.min(F.struct("name", "parser", "description")).alias("prov"))
        .select(
            "root_sha256",
            _file_sco(F.col("prov.name"), F.col("md5"),
                      F.lit(None).cast("string"), F.col("root_sha256")).alias("e"),
            F.col("prov.parser").alias("parser"),
            F.col("prov.description").alias("description"),
        )
    )


def stix_bundles_of(records: DataFrame,
                    fixed_timestamp: str = FIXED_TIMESTAMP) -> DataFrame:
    """records -> (root_sha256, n_objects, bundle_json): all SCOs plus the
    closing malware-analysis SDO (report_writer.py:92-117), one bundle per
    root sample."""
    objects = stix_objects_of(records)
    # sample_ref: the root's own file SCO (same deterministic provenance
    # pick as stix_objects_of, so the ref always matches an object id)
    root_file = _root_files(records).select(
        "root_sha256",
        F.col("e.stix_id").alias("sample_ref"),
        "parser",
    )
    grouped = (
        objects
        .groupBy("root_sha256")
        .agg(
            F.array_sort(F.collect_set("stix_id")).alias("ids"),
            F.array_sort(F.collect_list("stix_json")).alias("jsons"),
            # analysis_sco_refs carries only linked SCOs — notes are bundle
            # objects but never analysis refs (report_writer.py:63-72)
            F.array_sort(F.collect_set(
                F.when(F.col("linked"), F.col("stix_id")))).alias("linked_ids"),
        )
    )
    joined = grouped.join(root_file, "root_sha256", "left")
    # linked refs: every linked SCO except the sample itself
    refs = F.array_sort(
        F.array_remove(F.col("linked_ids"), F.col("sample_ref")))
    analysis_id = F.concat(
        F.lit("malware-analysis--"),
        uuid5_expr(NAMESPACE_MWCP,
                   F.concat(F.lit("malware-analysis--"), F.col("root_sha256"))),
    )
    ts = F.lit(fixed_timestamp)
    analysis = F.concat(
        F.lit('{"type":"malware-analysis","spec_version":"2.1","id":"'),
        analysis_id,
        F.lit('","created":"'), ts, F.lit('","modified":"'), ts,
        F.lit('","product":"kgmwcp"'),
        # parser values are rule class names (identifier-safe)
        F.when(F.col("parser").isNotNull(),
               F.concat(F.lit(',"result_name":"'), F.col("parser"), F.lit('"')))
        .otherwise(F.lit("")),
        F.lit(',"sample_ref":"'), F.col("sample_ref"), F.lit('"'),
        F.when(F.size(refs) > 0,
               F.concat(F.lit(',"analysis_sco_refs":'), F.to_json(refs)))
        .otherwise(F.lit(',"result":"unknown"')),  # report_writer.py:96-101
        F.lit("}"),
    )
    bundle_id = F.concat(
        F.lit("bundle--"),
        uuid5_expr(NAMESPACE_MWCP,
                   F.concat(F.lit("bundle--"), F.col("root_sha256"))),
    )
    # jsons always holds at least the root's own file SCO
    bundle = F.concat(
        F.lit('{"type":"bundle","id":"'), bundle_id, F.lit('","objects":['),
        F.concat_ws(",", F.col("jsons")), F.lit(","), analysis,
        F.lit("]}"),
    )
    return joined.select(
        "root_sha256",
        (F.size(F.col("ids")) + 1).alias("n_objects"),
        bundle.alias("bundle_json"),
    )
