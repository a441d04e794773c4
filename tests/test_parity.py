"""Golden-triple parity gate: P/R == 1.0 on the full fixture corpus.

The golden set is built IN THIS TEST from the raw payloads + hashlib +
the reference's documented semantics (independent of the engine code),
mirroring FIXTURES.md §B golden_triples.  The pipeline's triples table
must match it exactly (multiset, order-insensitive — the reference's own
compare semantics, mwcp/tests/test_parsers.py:308-312,364).
"""

import hashlib
import json

import pytest

from kgmwcp import fixtures, parity
from kgmwcp.pipeline import Pipeline, PipelineConfig


def j(payload: dict) -> str:
    return json.dumps(payload, sort_keys=True, separators=(",", ":"))


def sha(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


# -- golden obj constructors (test-side restatement of the reference's
#    serialization rules; deliberately not importing kgmwcp.canonical) ------

def url_obj(url, path=None, query=None, protocol=None):
    return {"url": url, "path": path, "query": query, "protocol": protocol, "tags": []}


def socket_obj(address=None, port=None):
    return {"address": address, "port": port, "network_protocol": None,
            "listen": None, "tags": []}


def network_obj(url_d, socket_d):
    return {"credential": None,
            "socket": {"type": "socket", **socket_d},
            "url": {"type": "url", **url_d},
            "tags": []}


def file_obj(name, description, data: bytes, derivation=None):
    return {"name": name, "description": description,
            "md5": hashlib.md5(data).hexdigest(),
            "sha1": hashlib.sha1(data).hexdigest(),
            "sha256": hashlib.sha256(data).hexdigest(),
            "architecture": None, "compile_time": None, "file_path": None,
            "data": None, "derivation": derivation, "tags": []}


def other_obj(key, value):
    fmt = "string" if isinstance(value, str) else "integer"
    return {"key": key, "value": value, "value_format": fmt, "tags": []}


def url_bundle(subj, url, address, port=None, path=None, query=None, protocol="http"):
    """url + derived network + socket triples (mwcp/metadata.py:1261-1274)."""
    u = url_obj(url, path=path, query=query, protocol=protocol)
    s = socket_obj(address=address, port=port)
    return {
        (subj, "url", j(u)),
        (subj, "network", j(network_obj(u, s))),
        (subj, "socket", j(s)),
    }


def build_golden() -> set:
    v = "\n# variant 0\n"
    vb = "' variant 0\r\n"
    golden = set()

    # ps1_urls / zip inner.ps1 (identical content, same subject)
    ps1 = (fixtures.PS1_URLS + v).encode()
    golden |= url_bundle(sha(ps1), "http://10.1.2.3:8080/a/b.jpg",
                         "10.1.2.3", 8080, path="/a/b.jpg")
    golden |= url_bundle(sha(ps1), "https://evil-domain.com/gate.php",
                         "evil-domain.com", path="/gate.php", protocol="https")

    # dup_pair (unreplicated PS1_URLS)
    dup = fixtures.PS1_URLS.encode()
    golden |= url_bundle(sha(dup), "http://10.1.2.3:8080/a/b.jpg",
                         "10.1.2.3", 8080, path="/a/b.jpg")
    golden |= url_bundle(sha(dup), "https://evil-domain.com/gate.php",
                         "evil-domain.com", path="/gate.php", protocol="https")

    # pdf_iocs / qb_xor child (identical content, same subject)
    pdf = (fixtures.PDF_TEXT + v).encode()
    golden |= url_bundle(sha(pdf), "http://bad.example.com/x?q=1",
                         "bad.example.com", path="/x", query="?q=1")
    golden.add((sha(pdf), "email_address",
                j({"value": "admin@bad.example.com", "tags": []})))

    # vbe_script: decoded child reported as residual file
    vbe_root = fixtures.corpus_rows(1, 1)  # not needed; compute directly
    from kgmwcp.engine import vbe as vbe_codec
    vbe_payload = vbe_codec.wrap_vbe(fixtures.VBS_TEXT + vb)
    decoded = (fixtures.VBS_TEXT + vb).encode()
    golden.add((sha(vbe_payload), "file",
                j(file_obj("enc.vb", "VBScript", decoded))))

    # zip_nested: member files attributed to the zip
    zip_payload = fixtures._zip_payload(ps1, 0)
    golden.add((sha(zip_payload), "file",
                j(file_obj("inner.ps1", "PowerShell Script", ps1))))
    golden.add((sha(zip_payload), "file",
                j(file_obj("note.txt", "Unidentified file", b"note 0\n"))))

    # zip_native: ELF child gets architecture from the ELF view; the
    # Mach-O child stays None (reference file_object.py:492-504)
    native_zip = fixtures._zip_native_payload(0)
    elf_blob = fixtures.elf_payload(0)
    elf_file = file_obj("libx.so", "Unidentified file", elf_blob)
    elf_file["architecture"] = "x64"
    golden.add((sha(native_zip), "file", j(elf_file)))
    macho_blob = fixtures.macho_fat_payload(0)
    golden.add((sha(native_zip), "file",
                j(file_obj("tool.bin", "Unidentified file", macho_blob))))

    # gzip_tar: single member
    tar_payload = fixtures._targz_payload(decoded, 0)
    golden.add((sha(tar_payload), "file",
                j(file_obj("m0.vbs", "VBScript", decoded))))

    # qb_xor: decrypted child (default <md5>.bin name, identified as PDF)
    qb_payload = fixtures._qb_payload(pdf)
    child_name = hashlib.md5(pdf).hexdigest() + ".bin"
    golden.add((sha(qb_payload), "file",
                j(file_obj(child_name, "PDF Document", pdf))))

    # mcafee_bup: original-location path + extracted child (distinct
    # subject: content includes the filler padding) + child's own PDF IOCs
    bup_inner = (fixtures.PDF_TEXT + v + "% filler\n" * 600).encode()
    bup = fixtures.mcafee_bup_payload(bup_inner, "C:\\Users\\victim0\\evil.pdf")
    golden.add((sha(bup), "path", j({
        "path": "C:\\Users\\victim0\\evil.pdf", "is_dir": False,
        "posix": False, "file_system": None, "tags": ["original_location"]})))
    golden.add((sha(bup), "file",
                j(file_obj("evil.pdf", "PDF Document", bup_inner))))
    golden |= url_bundle(sha(bup_inner), "http://bad.example.com/x?q=1",
                         "bad.example.com", path="/x", query="?q=1")
    golden.add((sha(bup_inner), "email_address",
                j({"value": "admin@bad.example.com", "tags": []})))

    # defender_q (0bad): decrypted child == the vbs_plain payload
    dq = fixtures.defender_payload(decoded, variant="0bad")
    child_name = hashlib.md5(decoded).hexdigest() + ".bin"
    golden.add((sha(dq), "file", j(file_obj(child_name, "VBScript", decoded))))

    # avast_chest: decrypted child == the pdf_iocs payload (its IOC bundle
    # is already golden under the same subject via pdf_iocs/qb_xor)
    av = fixtures.avast_payload(pdf)
    child_name = hashlib.md5(pdf).hexdigest() + ".bin"
    golden.add((sha(av), "file", j(file_obj(child_name, "PDF Document", pdf))))

    # dropper_overlay: embedded PE child with arch-suffixed stub name +
    # PE metadata on the File element
    inner = fixtures.inner_pe(0)
    outer = fixtures.dropper_overlay_payload(0)
    pe_file = file_obj(f"{hashlib.md5(inner).hexdigest()}_x86.exe",
                       "Unidentified file", inner)
    pe_file["architecture"] = "x86"
    pe_file["compile_time"] = "2020-01-01T00:00:00+00:00"
    golden.add((sha(outer), "file", j(pe_file)))

    # pem_cert
    cert = (fixtures.cert_pem() + "# 0\n").encode()
    golden.add((sha(cert), "rsa_public_key",
                j({"public_exponent": 65537, "modulus": fixtures.CERT_MODULUS,
                   "tags": []})))
    golden.add((sha(cert), "ssl_cert_sha1",
                j({"value": hashlib.sha1(fixtures.cert_der()).hexdigest(),
                   "tags": []})))
    for key, value in [
        ("rsa_cert_serial", "0x1deface"),
        ("rsa_cert_issuer", "CN=Evil CA , O=Evil Org "),
        ("rsa_cert_subject", "CN=Evil CA , O=Evil Org "),
        ("rsa_cert_valid_from", "2020-01-02 03:04:05"),
        ("rsa_cert_valid_to", "2030-01-02 03:04:05"),
    ]:
        golden.add((sha(cert), "other", j(other_obj(key, value))))

    # pem_privkey / rsa_blob / rsa_xml: three key containers, identical
    # CRT payload (the BLOB and XML forms must land on the same element)
    privkey_payload = j({
        "public_exponent": 65537, "modulus": fixtures.KEY_N,
        "private_exponent": fixtures.KEY_D, "p": fixtures.KEY_P,
        "q": fixtures.KEY_Q,
        "d_mod_p1": fixtures.KEY_D % (fixtures.KEY_P - 1),
        "d_mod_q1": fixtures.KEY_D % (fixtures.KEY_Q - 1),
        "q_inv_mod_p": pow(fixtures.KEY_Q, -1, fixtures.KEY_P),
        "tags": []})
    key_pem = (fixtures.privkey_pem() + "# 0\n").encode()
    golden.add((sha(key_pem), "rsa_private_key", privkey_payload))
    key_blob = fixtures.privkey_blob() + b"pad0"
    golden.add((sha(key_blob), "rsa_private_key", privkey_payload))
    key_xml = (fixtures.rsa_xml_key() + "<!-- 0 -->\n").encode()
    golden.add((sha(key_xml), "rsa_private_key", privkey_payload))

    # foo_any (routed, knowledge_base {"secret": "hello"})
    foo = (fixtures.FOO_TEXT + v).encode()
    golden.add((sha(foo), "other",
                j(other_obj("secret_using_external_knowledge", "hello!"))))
    golden |= url_bundle(sha(foo), "http://127.0.0.1", "127.0.0.1")
    golden.add((sha(foo), "file",
                j(file_obj("fooconfigtest.txt", "example output file",
                           b"hello world", derivation="extracted and decompressed"))))

    # hot_mutex row 0
    hot = (fixtures.MUTEX_PS1 + "# row 0\n").encode()
    golden |= url_bundle(sha(hot), "http://mutex-c2.example.com/beacon",
                         "mutex-c2.example.com", path="/beacon")

    # vbs_plain, decoy_doc, unidentified contribute no triples
    return golden


def test_pipeline_triples_match_golden(spark):
    corpus = fixtures.corpus_df(spark, replication=1, hot_rows=1)
    pipe = Pipeline(PipelineConfig(n_buckets=8, knowledge_base={"secret": "hello"}))
    tables = pipe.run(corpus)
    produced = {(r["subj"], r["pred"], r["obj"]) for r in tables["triples"].collect()}
    golden = build_golden()

    precision, recall = parity.precision_recall_local(produced, golden)
    if (precision, recall) != (1.0, 1.0):
        only_p = sorted(produced - golden)[:5]
        only_g = sorted(golden - produced)[:5]
        pytest.fail(
            f"P={precision:.3f} R={recall:.3f}\n"
            f"only produced: {only_p}\nonly golden: {only_g}"
        )
    # the BASELINE.md bar is 0.95; we hold exact equality
    assert precision >= 0.95 and recall >= 0.95


def test_distributed_precision_recall(spark):
    """The Spark-side P/R implementation agrees with the local one."""
    a = spark.createDataFrame(
        [("s1", "url", "x"), ("s1", "url", "y"), ("s2", "file", "z")],
        "subj string, pred string, obj string")
    b = spark.createDataFrame(
        [("s1", "url", "x"), ("s2", "file", "z"), ("s3", "other", "w")],
        "subj string, pred string, obj string")
    p, r = parity.precision_recall(a, b)
    assert (round(p, 4), round(r, 4)) == (round(2 / 3, 4), round(2 / 3, 4))
    assert parity.symmetric_diff(a, b).count() == 2
