"""End-to-end Spark pipeline tests on the deterministic fixture corpus."""

import base64
import hashlib
import json

import pytest
from pyspark.sql import functions as F

from kgmwcp import fixtures
from kgmwcp.pipeline import Pipeline, PipelineConfig


@pytest.fixture(scope="module")
def corpus(spark):
    return fixtures.corpus_df(spark, replication=2, hot_rows=8).cache()


@pytest.fixture(scope="module")
def tables(spark, corpus):
    pipe = Pipeline(PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"}))
    tabs = pipe.run(corpus)
    tabs["records"] = tabs["records"].cache()
    return tabs


def test_sha256_invariant(spark, corpus):
    """Spark sha2(content_bin) == hashlib.sha256 of the decoded payload —
    the per-row invariant vs reference FileObject.sha256."""
    pipe = Pipeline(PipelineConfig(n_buckets=8))
    got = {
        (r["path"]): r["sha256"]
        for r in pipe.samples(corpus).select("path", "sha256").collect()
    }
    for repo, path, commit, lang, content, route in fixtures.corpus_rows(2, 8):
        raw = base64.b64decode(content) if lang == "binary-b64" else content.encode()
        assert got[path] == hashlib.sha256(raw).hexdigest()


def test_ps1_urls_and_expansion(tables):
    triples = tables["triples"]
    sha = hashlib.sha256(fixtures.PS1_URLS.encode()).hexdigest()  # dup_pair content
    rows = triples.filter(F.col("subj") == sha).collect()
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r["pred"], []).append(json.loads(r["obj"]))
    urls = sorted(o["url"] for o in by_pred["url"])
    assert urls == ["http://10.1.2.3:8080/a/b.jpg", "https://evil-domain.com/gate.php"]
    assert len(by_pred["network"]) == 2
    assert len(by_pred["socket"]) == 2
    sockets = sorted((o["address"], o["port"]) for o in by_pred["socket"])
    assert sockets == [("10.1.2.3", 8080), ("evil-domain.com", None)]


def test_dup_pair_collapses_in_triples(tables, corpus):
    # dup_a + dup_b have identical content; triples are keyed by sha256 so
    # exactly one triple set exists despite two source rows.
    sha = hashlib.sha256(fixtures.PS1_URLS.encode()).hexdigest()
    n_rows = corpus.filter(F.col("content") == fixtures.PS1_URLS).count()
    assert n_rows == 4  # 2 replications x dup_a/dup_b
    n_url_triples = tables["triples"].filter(
        (F.col("subj") == sha) & (F.col("pred") == "url")
    ).count()
    assert n_url_triples == 2


def test_zip_children_attributed_to_child(tables):
    inner = (fixtures.PS1_URLS + "\n# variant 0\n").encode()
    inner_sha = hashlib.sha256(inner).hexdigest()
    urls = tables["triples"].filter(
        (F.col("subj") == inner_sha) & (F.col("pred") == "url")
    ).count()
    assert urls == 2
    # file-derivation edge zip -> inner.ps1 exists
    edges = tables["edges"].filter(
        (F.col("rel") == "dispatched") & (F.col("dst") == inner_sha)
    ).count()
    assert edges == 1


def test_foo_knowledge_base(tables):
    others = [
        json.loads(r["obj"])
        for r in tables["triples"].filter(F.col("pred") == "other").collect()
    ]
    assert {"key": "secret_using_external_knowledge", "tags": [],
            "value": "hello!", "value_format": "string"} in others


def test_hot_entity_node(tables):
    nodes = tables["nodes"].filter(
        F.col("canonical_value") == "http://mutex-c2.example.com/beacon"
    ).collect()
    url_nodes = [n for n in nodes if n["entity_kind"] == "url"]
    assert len(url_nodes) == 1
    node = url_nodes[0]
    assert node["n_mentions"] == 8
    assert node["n_samples"] == 8
    # one canonical node, 8 sample edges
    edge_count = tables["edges"].filter(
        (F.col("dst") == node["entity_id"]) & (F.col("rel") == "url")
    ).count()
    assert edge_count == 8


def test_vbe_decodes_and_identifies_child(tables):
    files = tables["files"]
    vb_children = files.filter(F.col("name").endswith(".vb")).collect()
    assert len(vb_children) == 2  # one per replication
    assert all(c["description"] == "VBScript" for c in vb_children)
    assert all(c["parent_sha256"] is not None for c in vb_children)


def test_qb_xor_child_is_pdf_with_urls(tables):
    plain = (fixtures.PDF_TEXT + "\n# variant 0\n").encode()
    child_sha = hashlib.sha256(plain).hexdigest()
    urls = tables["triples"].filter(
        (F.col("subj") == child_sha) & (F.col("pred") == "url")
    ).collect()
    assert any(json.loads(r["obj"])["url"] == "http://bad.example.com/x?q=1" for r in urls)


def test_reports_one_per_root(tables, corpus):
    n_roots_expected = (
        corpus.select(
            F.sha2(
                F.when(F.col("lang") == "binary-b64", F.unbase64("content"))
                .otherwise(F.encode("content", "utf-8")),
                256,
            ).alias("sha"),
        )
        .distinct()
        .count()
    )
    reports = tables["reports"]
    assert reports.count() == n_roots_expected
    assert reports.filter(F.col("report_json").isNull()).count() == 0


def test_unidentified_has_no_mentions(tables):
    sha = hashlib.sha256((fixtures.PLAIN_TEXT + "\n# variant 0\n").encode()).hexdigest()
    assert tables["triples"].filter(F.col("subj") == sha).count() == 0


def test_metrics_table(tables):
    metrics = Pipeline.metrics(tables["records"]).collect()
    assert any(m["kind"] == "mention" and m["pred"] == "url" for m in metrics)


def test_output_independent_of_arrow_batch_size(spark):
    """Extraction output must not depend on Arrow batch boundaries
    (SURVEY.md §7.3 risk #4): the identify-cache is per-engine/per-batch
    state and must never change emitted triples."""
    corpus = fixtures.corpus_df(spark, replication=1, hot_rows=2)
    pipe = Pipeline(PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"}))

    def run_with_batch(n):
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(n))
        try:
            return {(r["subj"], r["pred"], r["obj"])
                    for r in pipe.run(corpus)["triples"].collect()}
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert run_with_batch(3) == run_with_batch(512)


def test_report_json_structure(spark, corpus):
    pipe = Pipeline(PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"}))
    tables = pipe.run(corpus)
    foo_sha = hashlib.sha256((fixtures.FOO_TEXT + "\n# variant 0\n").encode()).hexdigest()
    row = tables["reports"].filter(F.col("root_sha256") == foo_sha).collect()[0]
    report = json.loads(row["report_json"])
    assert report["type"] == "report"
    assert report["input_file"]["sha256"] == foo_sha
    assert report["input_file"]["name"] == "anything.txt"
    entry_types = sorted(e["type"] for e in report["metadata"])
    assert entry_types == ["file", "network", "other", "socket", "url"]
    # every metadata entry is a typed payload (reference unstructure shape)
    url_entry = next(e for e in report["metadata"] if e["type"] == "url")
    assert url_entry["url"] == "http://127.0.0.1"


def test_router_parity_with_auto_dispatch(spark, corpus, tables):
    """P10 acceptance: routed pipeline triples equal the auto-routed ones
    on the fixture corpus (the router is a hint, never a semantic change)."""
    routed_pipe = Pipeline(PipelineConfig(
        n_buckets=8, knowledge_base={"secret": "hello"}, use_router=True))
    routed = routed_pipe.run(corpus)["triples"]
    auto = tables["triples"]
    assert auto.exceptAll(routed).count() == 0
    assert routed.exceptAll(auto).count() == 0


def test_router_route_assignment(spark, corpus):
    """Signatures resolve the right group per fixture class; input routes
    win; unidentified rows keep NULL (auto fallback)."""
    pipe = Pipeline(PipelineConfig(n_buckets=8, use_router=True))
    rows = {r["path"]: r["route"]
            for r in pipe.samples(corpus).select("path", "route").collect()}
    assert rows["x0/run.ps1"] == "PowerShell"
    assert rows["a0/doc.pdf"] == "PDF"
    assert rows["a0/drop.zip"] == "Archive"
    assert rows["a0/drop.tar.gz"] == "Archive"
    assert rows["d0/readme.bin"] == "Decoy"          # CFB decoy, no Details
    assert rows["q0/sample.bup"] == "Quarantined"    # CFB + Details stream
    assert rows["q0/sample.qbd"] == "Quarantined"    # XORed %PDF prefix
    assert rows["q0/entry.dat"] == "Quarantined"     # Defender 0BAD
    assert rows["q0/chest.dat"] == "Quarantined"     # -chest- prefix
    assert rows["b0/drop.exe"] == "GenericDropper"
    assert rows["k0/cert.pem"] == "RSA"
    assert rows["k0/key.blob"] == "RSA"
    assert rows["k0/key.xml"] == "RSA"
    assert rows["s0/mal.vbs"] == "VisualBasic"
    assert rows["s0/enc.vbe"] == "VisualBasic"
    assert rows["f0/anything.txt"] == "foo"          # input route preserved
    assert rows["u0/blob.txt"] is None               # no signature -> auto


def test_router_pyinstaller_and_iso_signatures(spark):
    """EOF-cookie and at-offset signatures (not in the standard corpus)."""
    from kgmwcp.stages.ingest import prepare_samples
    from kgmwcp.stages.router import route_samples

    pyz = fixtures.pyinstaller_payload(b"print('x')\n", variant=0)
    iso_blob = bytearray(0x8001 + 5 + 10)
    iso_blob[0x8001:0x8001 + 5] = b"CD001"
    docs = spark.createDataFrame(
        [("r", "p/a.bin", "c", "binary-b64", base64.b64encode(pyz).decode()),
         ("r", "p/b.iso", "c", "binary-b64", base64.b64encode(bytes(iso_blob)).decode())],
        "repo string, path string, commit string, lang string, content string")
    rows = {r["path"]: r["route"]
            for r in route_samples(prepare_samples(docs, n_buckets=4))
            .select("path", "route").collect()}
    assert rows["p/a.bin"] == "Python"
    assert rows["p/b.iso"] == "ISO"


def test_report_logs_capture(spark, corpus):
    """Per-file logs ride kind='log' records into the report JSON
    (reference ReportLogHandler, mwcp/report.py:169-180; model fields
    errors/logs, mwcp/metadata.py:2941-2942)."""
    pipe = Pipeline(PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"}))
    tables = pipe.run(corpus)

    log_rows = tables["records"].filter(F.col("kind") == "log")
    msgs = {r["error"] for r in log_rows.collect()}
    assert "[I] Attempting to extract files from Zip archive." in msgs
    assert any(m.startswith("[I] size of inputfile is") for m in msgs)

    foo_sha = hashlib.sha256((fixtures.FOO_TEXT + "\n# variant 0\n").encode()).hexdigest()
    row = tables["reports"].filter(F.col("root_sha256") == foo_sha).collect()[0]
    report = json.loads(row["report_json"])
    assert report["errors"] == []
    assert any(l.startswith("[I] size of inputfile is") for l in report["logs"])
    assert any(l.startswith("[I] operating on inputfile") for l in report["logs"])


def test_stix_bundles(tables, corpus):
    """STIX 2.1 view (S13 full form): valid bundle JSON per root, SCO ids
    equal python uuid.uuid5 over the spec's SCO namespace, x509 ids use
    the reference's namespace + seed (mwcp/metadata.py:185,2459-2461)."""
    import uuid as _uuid

    from kgmwcp.stages import stix

    bundles = {r["root_sha256"]: r for r in tables["stix"].collect()}
    assert bundles, "no bundles emitted"

    foo_sha = hashlib.sha256((fixtures.FOO_TEXT + "\n# variant 0\n").encode()).hexdigest()
    b = json.loads(bundles[foo_sha]["bundle_json"])
    assert b["type"] == "bundle"
    objs = b["objects"]
    assert bundles[foo_sha]["n_objects"] == len(objs)

    # url SCO id == python uuid5 over canonical sort_keys JSON in the
    # STIX 2.1 SCO namespace
    url = next(o for o in objs if o["type"] == "url")
    key = json.dumps({"value": url["value"]}, ensure_ascii=False,
                     separators=(",", ":"), sort_keys=True)
    assert url["id"] == "url--" + str(_uuid.uuid5(stix.NAMESPACE_SCO, key))
    assert url["value"] == "http://127.0.0.1"

    # the closing malware-analysis SDO references every linked SCO — notes
    # are bundle objects but never analysis refs (report_writer.py:63-72)
    ma = next(o for o in objs if o["type"] == "malware-analysis")
    assert ma["product"] == "kgmwcp"
    assert ma["result_name"] == "Foo"
    assert ma["sample_ref"].startswith("file--")
    refs = ma["analysis_sco_refs"]
    assert refs == sorted(refs)
    other_ids = {o["id"] for o in objs
                 if o["type"] not in ("malware-analysis", "note")}
    assert set(refs) == other_ids - {ma["sample_ref"]}

    # string-valued Other -> observed-string extension SCO
    # (metadata.py:2026-2035, stix/extensions.py:36-74)
    obs = next(o for o in objs if o["type"] == "observed-string")
    assert obs["value"] == "hello!"
    assert obs["purpose"] == "secret-using-external-knowledge"
    assert "extension-definition--8b1aa84c-5532-4c69-a8e7-b6170facfd3d" in (
        obs["extensions"])
    assert obs["id"] in refs

    # master note: "Description: ..." refs the sample's own file SCO
    # (report_writer.py:37,75-89)
    master = next(o for o in objs if o["type"] == "note")
    assert master["content"] == "Description: Foo"
    assert master["object_refs"] == [ma["sample_ref"]]
    assert "labels" not in master

    # x509: the reference's own uuid5 namespace and exponent//modulus seed
    cert_sha = hashlib.sha256((fixtures.cert_pem() + "# 0\n").encode()).hexdigest()
    cb = json.loads(bundles[cert_sha]["bundle_json"])
    x509 = next(o for o in cb["objects"] if o["type"] == "x509-certificate")
    seed = f"65537//{fixtures.CERT_MODULUS}"
    assert x509["id"] == "x509-certificate--" + str(
        _uuid.uuid5(stix.NAMESPACE_MWCP, seed))
    assert x509["subject_public_key_exponent"] == 65537

    # every bundle parses as JSON
    for row in bundles.values():
        json.loads(row["bundle_json"])


def test_stix_notes(tables):
    """Note pipeline (report_writer.py:37-89,107-132): File
    compile-time/architecture lines land in the master note, tagged
    elements get per-SCO 'MWCP Tags:' notes, and identical content+labels
    notes consolidate with object_refs unioned."""
    from pyspark.sql import functions as F

    from kgmwcp.stages import stix

    bundles = {r["root_sha256"]: r for r in tables["stix"].collect()}

    # dropper: inner PE carries architecture/compile_time -> master-note line
    drop_sha = hashlib.sha256(fixtures.dropper_overlay_payload(0)).hexdigest()
    objs = json.loads(bundles[drop_sha]["bundle_json"])["objects"]
    master = next(o for o in objs if o["type"] == "note")
    assert master["content"] == (
        "Description: Dropper (Overlay)\n"
        "Compiled on: 2020-01-01T00:00:00+00:00\nFor architecture: x86")

    # mcafee: original_location-tagged path -> 'MWCP Tags:' note on the SCO
    inner = (fixtures.PDF_TEXT + "\n# variant 0\n" + "% filler\n" * 600).encode()
    bup = fixtures.mcafee_bup_payload(inner, "C:\\Users\\victim0\\evil.pdf")
    bup_sha = hashlib.sha256(bup).hexdigest()
    objs = json.loads(bundles[bup_sha]["bundle_json"])["objects"]
    tag_note = next(o for o in objs if o["type"] == "note"
                    and o.get("labels") == ["original_location"])
    assert tag_note["content"] == "MWCP Tags: original_location"
    (ref,) = tag_note["object_refs"]
    target = next(o for o in objs if o["id"] == ref)
    assert target == {"type": "file", "id": ref, "name": "evil.pdf"}
    ma = next(o for o in objs if o["type"] == "malware-analysis")
    assert tag_note["id"] not in ma["analysis_sco_refs"]

    # consolidation: a second element with the same tags in the same root
    # merges into ONE note whose refs union both SCOs
    recs = tables["records"].filter(F.col("root_sha256") == bup_sha)
    dup = (
        recs.filter((F.col("kind") == "mention") & (F.col("pred") == "path"))
        .withColumn("obj", F.regexp_replace("obj", r"evil\.pdf", "evil2.pdf"))
    )
    consolidated = stix.stix_objects_of(recs.unionByName(dup))
    notes = [json.loads(r["stix_json"]) for r in consolidated
             .filter(F.col("stix_type") == "note").collect()]
    tagged = [n for n in notes if n.get("labels") == ["original_location"]]
    assert len(tagged) == 1, tagged
    assert len(tagged[0]["object_refs"]) == 2


def test_report_external_knowledge_and_recursive(tables):
    """Reference report-model fields (mwcp/metadata.py:2936-2940):
    external_knowledge snapshots the supplied kb; recursive is true."""
    row = tables["reports"].limit(1).collect()[0]
    report = json.loads(row["report_json"])
    assert report["recursive"] is True
    assert report["external_knowledge"] == {"secret": "hello"}


def test_stix_sample_ref_deterministic_for_dup_content(tables):
    """dup_a/dup_b share content under two names: the root file SCO must
    pick deterministic provenance (min name) and sample_ref must always
    appear among the bundle's objects."""
    dup_sha = hashlib.sha256(fixtures.PS1_URLS.encode()).hexdigest()
    row = next(r for r in tables["stix"].collect() if r["root_sha256"] == dup_sha)
    b = json.loads(row["bundle_json"])
    ma = next(o for o in b["objects"] if o["type"] == "malware-analysis")
    ids = {o["id"] for o in b["objects"]}
    assert ma["sample_ref"] in ids
    sample = next(o for o in b["objects"] if o["id"] == ma["sample_ref"])
    assert sample["name"] == "dup_a.ps1"  # min(name) of the two provenances


def test_refang_defanged_iocs(spark):
    """Entity canonicalization refangs bracketed separators and hxxp
    schemes so one defanged C2 doesn't split into several entities;
    the goldens twin must agree on every case."""
    import json as _json

    from kgmwcp import goldens
    from kgmwcp.stages.link import canonical_value_expr

    cases = [
        ("url", {"url": "hxxp://evil[.]com/a"}, "http://evil.com/a"),
        ("url", {"url": "hXXps://bad(.)org/x"}, "https://bad.org/x"),
        ("url", {"url": "http://c2{.}net[:]8080"}, "http://c2.net:8080"),
        ("email_address", {"value": "Admin[@]Evil[.]com"}, "admin@evil.com"),
        ("socket", {"address": "10.0.0[.]1", "port": 443}, "10.0.0.1:443"),
        # bracketed non-separators must NOT be touched
        ("mutex", {"value": "Global\\[x](y)"}, "global\\[x](y)"),
    ]
    df = spark.createDataFrame(
        [(pred, _json.dumps(obj)) for pred, obj, _ in cases],
        "pred string, obj string",
    ).withColumn("cv", canonical_value_expr(F.col("pred"), F.col("obj")))
    got = [r["cv"] for r in df.collect()]
    want = [expected for _, _, expected in cases]
    assert got == want
    twin = [goldens.canonical_value(pred, _json.dumps(obj))
            for pred, obj, _ in cases]
    assert twin == want


def test_residual_file_sink(spark, corpus):
    """Opt-in residual sink (reference report.py:861-885): file_node
    records carry child payload bytes; the residuals table is
    content-addressed (one row per sha256, identical children from many
    roots collapse) and bytes round-trip exactly."""
    pipe = Pipeline(PipelineConfig(
        n_buckets=8, knowledge_base={"secret": "hello"},
        emit_file_data=True))
    tabs = pipe.run(corpus)
    residuals = {r["sha256"]: r for r in tabs["residuals"].collect()}
    assert residuals

    # zip_nested inner.ps1 payload round-trips byte-exact
    inner = (fixtures.PS1_URLS + "\n# variant 0\n").encode()
    inner_sha = hashlib.sha256(inner).hexdigest()
    row = residuals[inner_sha]
    assert bytes(row["data"]) == inner
    assert row["name"] == "inner.ps1"
    assert row["md5"] == hashlib.md5(inner).hexdigest()
    # 2 replications of zip_nested carry the same inner.ps1 per variant —
    # content-addressing collapses rows, n_sources counts them
    assert row["n_sources"] >= 1

    # roots are NOT in the residual table (they are the input)
    root_sha = hashlib.sha256(fixtures.PS1_URLS.encode()).hexdigest()
    assert root_sha not in residuals

    # default config stays payload-free: all file_data null, no table
    base = Pipeline(PipelineConfig(n_buckets=8))
    recs = base.run(corpus)
    assert "residuals" not in recs
    assert recs["records"].filter(
        F.col("file_data").isNotNull()).count() == 0


def test_greedy_pipeline_runs_all_matching_rules(spark):
    """PipelineConfig.greedy threads the reference's greedy dispatch
    (dispatcher.py:61-98) to the extract stage: a PDF-with-IOCs root also
    matched by the Decoy rule keeps BOTH parses' elements."""
    import base64

    data = b"%PDF-1.4 stream http://greedy.example.com/a end"
    docs = spark.createDataFrame(
        [("r0", "g/doc.bin", "c0", "binary-b64",
          base64.b64encode(data).decode(), None)],
        "repo string, path string, commit string, lang string, "
        "content string, route string")
    sha = hashlib.sha256(data).hexdigest()

    def preds(greedy):
        tabs = Pipeline(PipelineConfig(n_buckets=4, greedy=greedy)).run(docs)
        return {r["pred"] for r in tabs["triples"]
                .filter(F.col("subj") == sha).collect()}

    non_greedy = preds(False)
    greedy = preds(True)
    assert "url" in non_greedy         # PDF parser's URL extraction
    assert greedy >= non_greedy        # greedy never loses elements


def test_include_file_data_in_reports(spark, corpus):
    """Reference report.py:112,536-541: include_file_data keeps base64
    payload bytes in File report elements; default strips them."""
    import base64

    pipe = Pipeline(PipelineConfig(
        n_buckets=8, knowledge_base={"secret": "hello"},
        emit_file_data=True, include_file_data=True))
    tabs = pipe.run(corpus)
    foo_sha = hashlib.sha256(
        (fixtures.FOO_TEXT + "\n# variant 0\n").encode()).hexdigest()
    report = json.loads(tabs["reports"].filter(
        F.col("root_sha256") == foo_sha).collect()[0]["report_json"])
    entry = next(e for e in report["metadata"] if e["type"] == "file")
    assert entry["data"] == base64.b64encode(b"hello world").decode()
    # the rest of the element is untouched by the in-place patch
    assert entry["name"] == "fooconfigtest.txt"
    assert entry["md5"] == hashlib.md5(b"hello world").hexdigest()

    # payloads longer than one MIME base64 line (76 chars) must embed
    # unchunked — some Spark builds emit \r\n-chunked base64
    inner = (fixtures.PS1_URLS + "\n# variant 0\n").encode()
    zip_sha = hashlib.sha256(fixtures._zip_payload(inner, 0)).hexdigest()
    zrep = json.loads(tabs["reports"].filter(
        F.col("root_sha256") == zip_sha).collect()[0]["report_json"])
    zentry = next(e for e in zrep["metadata"]
                  if e["type"] == "file" and e["name"] == "inner.ps1")
    assert zentry["data"] == base64.b64encode(inner).decode()
    assert "\r" not in zentry["data"] and len(zentry["data"]) > 76

    # default config keeps data null (reference default)
    base = Pipeline(PipelineConfig(
        n_buckets=8, knowledge_base={"secret": "hello"}))
    report2 = json.loads(base.run(corpus)["reports"].filter(
        F.col("root_sha256") == foo_sha).collect()[0]["report_json"])
    entry2 = next(e for e in report2["metadata"] if e["type"] == "file")
    assert entry2["data"] is None


def test_outputs_deterministic_across_partitionings(spark):
    """The determinism claim behind uuid5 ids and min-provenance picks:
    report_json and bundle_json are byte-identical when the same corpus
    runs under different shuffle widths and bucket counts."""
    corpus = fixtures.corpus_df(spark, replication=1, hot_rows=2)

    def snapshot(n_buckets, shuffle):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
        try:
            tabs = Pipeline(PipelineConfig(
                n_buckets=n_buckets,
                knowledge_base={"secret": "hello"})).run(corpus)
            reports = sorted((r["root_sha256"], r["report_json"])
                             for r in tabs["reports"].collect())
            stix = sorted((r["root_sha256"], r["bundle_json"])
                          for r in tabs["stix"].collect())
            return reports, stix
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a = snapshot(n_buckets=8, shuffle=3)
    b = snapshot(n_buckets=16, shuffle=13)
    assert a == b


def test_null_content_row_is_processed_once(spark, tmp_path):
    """A NULL content document must not poison identity: it hashes as an
    empty payload, gets a bucket, commits, and does not re-run forever."""
    docs = spark.createDataFrame(
        [("r0", "n/null.bin", "c0", "text", None, None),
         ("r0", "n/ok.txt", "c0", "text", "hello", None)],
        "repo string, path string, commit string, lang string, "
        "content string, route string")
    out = str(tmp_path / "kg")
    pipe = Pipeline(PipelineConfig(n_buckets=4))
    tabs = pipe.run_checkpointed(spark, docs, out)
    empty_sha = hashlib.sha256(b"").hexdigest()
    roots = {r["sha256"] for r in tabs["files"]
             .filter(F.col("depth") == 0).collect()}
    assert empty_sha in roots
    # resume: nothing left to do, identical results
    tabs2 = Pipeline(PipelineConfig(n_buckets=4)).run_checkpointed(
        spark, docs, out)
    assert tabs2["records"].count() == tabs["records"].count()


def test_report_logs_single_provenance_run(spark):
    """Identical content under N provenance rows runs the engine N times;
    the report keeps ONE run's logs (min provenance — the same pick the
    input_file block makes), so report content doesn't depend on copy
    count (code-review finding)."""
    docs = spark.createDataFrame(
        [("r0", "a/one.txt", "c0", "text", fixtures.FOO_TEXT, "foo"),
         ("r1", "b/two.txt", "c1", "text", fixtures.FOO_TEXT, "foo")],
        "repo string, path string, commit string, lang string, "
        "content string, route string")
    tabs = Pipeline(PipelineConfig(
        n_buckets=4, knowledge_base={"secret": "hello"})).run(docs)
    report = json.loads(tabs["reports"].collect()[0]["report_json"])
    ops = [l for l in report["logs"]
           if l.startswith("[I] operating on inputfile")]
    assert ops == ["[I] operating on inputfile one.txt"]


def test_report_parser_name_json_escaped(spark):
    """A caller-supplied parser name with quotes/backslashes must not
    corrupt report_json (the one formerly-unescaped splice)."""
    from kgmwcp.stages.report import reports_of

    docs = fixtures.corpus_df(spark, replication=1, hot_rows=1)
    records = Pipeline(PipelineConfig(n_buckets=4)).records(docs)
    hostile = 'acme "v2" \\ test'
    row = reports_of(records, parser=hostile).limit(1).collect()[0]
    report = json.loads(row["report_json"])   # must parse
    assert report["parser"] == hostile


def test_router_pyinstaller_signature_clamps_short_content(spark):
    """Spark substring(c,-24,8) returns b'' for content shorter than 24
    bytes while python's data[-24:][:8] clamps to the prefix — the
    Column signature must clamp identically (twin parity, code-review
    finding)."""
    import base64

    from kgmwcp import goldens
    from kgmwcp.stages.ingest import prepare_samples
    from kgmwcp.stages.router import route_samples

    magic = b"MEI\x0c\x0b\x0a\x0b\x0e"
    docs = spark.createDataFrame(
        [("r0", "p/short.bin", "c0", "binary-b64",
          base64.b64encode(magic).decode(), None)],
        "repo string, path string, commit string, lang string, "
        "content string, route string")
    routed = route_samples(prepare_samples(docs, n_buckets=4)).collect()[0]
    assert goldens.signature_groups(magic, "p/short.bin") == ["Python"]
    assert "Python" in routed["sig_matches"]
