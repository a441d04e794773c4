"""Unit tests for the row-local extraction engine (no Spark).

Golden expectations hand-derived from reference behavior; the foo case is
checked against the literal values in the reference's own golden report
mwcp/parsers/tests/foo/f144899b86766688991c5d0d10902f4a.json.
"""

import hashlib
import json

import pytest

from kgmwcp import fixtures
from kgmwcp.engine import vbe
from kgmwcp.engine.dispatcher import ExtractionEngine
from kgmwcp.engine.fileobj import SampleFile


def run(data, name=None, route=None, kb=None):
    return ExtractionEngine().run(data, name=name, route=route, knowledge_base=kb)


def triples_of(result):
    return [(src.sha256, pred, json.loads(obj)) for src, pred, obj in result.triples]


class TestFoo:
    """Parity with the reference golden foo report."""

    def test_foo_golden(self):
        data = b"some text content for the foo parser\n"
        result = run(data, name="anything.txt", route="foo", kb={"secret": "hello"})
        root_sha = hashlib.sha256(data).hexdigest()
        trips = triples_of(result)

        preds = [pred for _, pred, _ in trips]
        assert preds == ["other", "url", "network", "socket", "file"]
        assert all(subj == root_sha for subj, _, _ in trips)

        by_pred = {pred: obj for _, pred, obj in trips}
        assert by_pred["other"] == {
            "key": "secret_using_external_knowledge",
            "tags": [], "value": "hello!", "value_format": "string",
        }
        assert by_pred["url"] == {
            "url": "http://127.0.0.1", "path": None, "query": None,
            "protocol": "http", "tags": [],
        }
        # nested network serialization carries type discriminators
        assert by_pred["network"] == {
            "credential": None,
            "socket": {
                "type": "socket", "tags": [], "address": "127.0.0.1",
                "port": None, "network_protocol": None, "listen": None,
            },
            "tags": [],
            "url": {
                "type": "url", "tags": [], "url": "http://127.0.0.1",
                "path": None, "query": None, "protocol": "http",
            },
        }
        assert by_pred["socket"] == {
            "address": "127.0.0.1", "port": None, "network_protocol": None,
            "listen": None, "tags": [],
        }
        # literal hashes from the reference golden report
        assert by_pred["file"] == {
            "name": "fooconfigtest.txt",
            "description": "example output file",
            "md5": "5eb63bbbe01eeed093cb22bb8f5acdc3",
            "sha1": "2aae6c35c94fcfb415dbe95f408b9ce91ee846ed",
            "sha256": "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9",
            "architecture": None, "compile_time": None, "file_path": None,
            "data": None, "derivation": "extracted and decompressed",
            "tags": [],
        }


class TestPowerShell:
    def test_urls_extracted_denylisted_deduped(self):
        data = (
            b"$a = 'http://10.1.2.3:8080/a/b.jpg';\n"
            b"$b = 'https://evil-domain.com/gate.php';\n"
            b"$b2 = 'https://evil-domain.com/gate.php';\n"  # dup
            b"$c = 'https://api.ipify.org';\n"  # denylisted
        )
        result = run(data, name="run.ps1")
        urls = sorted(
            json.loads(obj)["url"] for _, pred, obj in result.triples if pred == "url"
        )
        assert urls == [
            "http://10.1.2.3:8080/a/b.jpg",
            "https://evil-domain.com/gate.php",
        ]
        # each URL has host:port -> socket + network expansion
        preds = sorted(pred for _, pred, _ in result.triples)
        assert preds.count("network") == 2
        assert preds.count("socket") == 2

    def test_url_socket_port_parsed(self):
        data = b"x 'http://10.1.2.3:8080/a/b.jpg' y"
        result = run(data, name="s.ps1")
        sockets = [json.loads(o) for _, p, o in result.triples if p == "socket"]
        assert sockets == [{
            "address": "10.1.2.3", "port": 8080, "network_protocol": None,
            "listen": None, "tags": [],
        }]
        url = next(json.loads(o) for _, p, o in result.triples if p == "url")
        assert url["path"] == "/a/b.jpg"
        assert url["protocol"] == "http"

    def test_non_ps1_not_identified(self):
        result = run(b"'http://10.1.2.3/'", name="run.txt")
        assert not any(p == "url" for _, p, _ in result.triples)


class TestPDF:
    def test_pdf_urls_and_emails(self):
        data = (
            b"%PDF-1.4\nsome stream http://bad.example.com/x?q=1 "
            b"contact admin@bad.example.com and http://www.w3.org/1999/xhtml end"
        )
        result = run(data, name="doc.pdf")
        urls = [json.loads(o)["url"] for _, p, o in result.triples if p == "url"]
        assert "http://bad.example.com/x?q=1" in urls
        assert not any("w3.org" in u for u in urls)
        emails = [json.loads(o)["value"] for _, p, o in result.triples if p == "email_address"]
        assert emails == ["admin@bad.example.com"]

    def test_pdf_without_iocs_is_decoy(self):
        result = run(b"%PDF-1.4\nnothing here", name="plain.bin")
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        # root is input (not reported); no children -> no file rows
        assert files == []
        assert result.files[0].description == "Decoy Document (.pdf)"
        assert result.files[0].name.endswith(".pdf")  # ext renamed from .bin


class TestArchive:
    def test_zip_recursion_attributes_urls_to_child(self):
        import io
        import zipfile

        inner = b"iex 'http://10.9.8.7/payload.bin'"
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            info = zipfile.ZipInfo("sub/inner.ps1", date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, inner)
            info2 = zipfile.ZipInfo("note.txt", date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info2, b"hello note")
        data = buf.getvalue()

        result = run(data, name="drop.zip")
        root_sha = hashlib.sha256(data).hexdigest()
        inner_sha = hashlib.sha256(inner).hexdigest()

        url_rows = [(s.sha256, json.loads(o)) for s, p, o in result.triples if p == "url"]
        assert url_rows and all(subj == inner_sha for subj, _ in url_rows)
        assert url_rows[0][1]["url"] == "http://10.9.8.7/payload.bin"

        # child File elements attributed to the zip (parent)
        file_rows = [(s.sha256, json.loads(o)) for s, p, o in result.triples if p == "file"]
        assert {subj for subj, _ in file_rows} == {root_sha}
        names = sorted(obj["name"] for _, obj in file_rows)
        assert names == ["inner.ps1", "note.txt"]
        descs = {obj["name"]: obj["description"] for _, obj in file_rows}
        assert descs["inner.ps1"] == "PowerShell Script"
        assert descs["note.txt"] == "Unidentified file"

    def test_targz_member(self):
        import gzip as gz
        import io
        import tarfile

        member = b"dim x\r\nset y = createobject(\"wscript.shell\")\r\n"
        tarbuf = io.BytesIO()
        with tarfile.open(fileobj=tarbuf, mode="w") as tar:
            ti = tarfile.TarInfo("m.vbs")
            ti.size = len(member)
            ti.mtime = 0
            tar.addfile(ti, io.BytesIO(member))
        gzbuf = io.BytesIO()
        with gz.GzipFile(fileobj=gzbuf, mode="wb", mtime=0) as gzf:
            gzf.write(tarbuf.getvalue())
        data = gzbuf.getvalue()

        result = run(data, name="drop.tar.gz")
        file_rows = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert [f["name"] for f in file_rows] == ["m.vbs"]
        assert file_rows[0]["description"] == "VBScript"


class TestVBE:
    def test_roundtrip_codec(self):
        script = 'dim x\r\nset shell = createobject("WScript.Shell")\r\nshell.run "calc"\r\n'
        assert vbe.decode_vbe_stream(vbe.encode_vbe_stream(script)) == script

    def test_vbe_decodes_to_child_vbscript(self):
        script = 'dim x\r\nset shell = createobject("WScript.Shell")\r\n'
        data = vbe.wrap_vbe(script)
        result = run(data, name="enc.vbe")
        assert result.files[0].description == "Encoded VBScript"
        file_rows = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert [f["name"] for f in file_rows] == ["enc.vb"]
        assert file_rows[0]["sha256"] == hashlib.sha256(script.encode()).hexdigest()
        # decoded child identified as VBScript
        assert result.files[1].description == "VBScript"


class TestQuarantine:
    def test_symantec_qb_xor(self):
        plain = b"%PDF-1.4 fake payload body for the quarantine test"
        data = bytes(b ^ 0xB3 for b in plain)
        result = run(data, name="sample.qbd")
        assert result.files[0].description == "Symantec Quarantined QB"
        file_rows = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert file_rows and file_rows[0]["sha256"] == hashlib.sha256(plain).hexdigest()
        # decoded child is itself identified (Decoy PDF since no URLs)
        assert result.files[1].description == "Decoy Document (.pdf)"


class TestDedupe:
    def test_same_element_added_once(self):
        data = b"a 'http://1.2.3.4/x' b 'http://1.2.3.4/x' c"
        result = run(data, name="d.ps1")
        url_rows = [o for _, p, o in result.triples if p == "url"]
        assert len(url_rows) == 1


class TestUnidentified:
    def test_unidentified_root_has_no_triples(self):
        result = run(b"nothing interesting here", name="blob.txt")
        assert result.triples == []
        assert result.files[0].description == "Unidentified file"


class TestValidation:
    def test_invalid_port_dropped_not_raised(self):
        from kgmwcp import canonical as md
        with pytest.raises(md.ValidationError):
            md.Socket(address="x", port=70000)


class TestRSA:
    def test_certificate_extraction(self):
        import hashlib
        from kgmwcp import fixtures

        data = fixtures.cert_pem().encode()
        result = run(data, name="cert.pem")
        trips = {pred: obj for _, pred, obj in
                 ((s, p, json.loads(o)) for s, p, o in result.triples)}
        assert result.files[0].description == "Digital Certificate (PEM)"
        assert trips["rsa_public_key"] == {
            "public_exponent": 65537,
            "modulus": fixtures.CERT_MODULUS,
            "tags": [],
        }
        assert trips["ssl_cert_sha1"] == {
            "value": hashlib.sha1(fixtures.cert_der()).hexdigest(),
            "tags": [],
        }
        others = {json.loads(o)["key"]: json.loads(o)["value"]
                  for _, p, o in result.triples if p == "other"}
        assert others["rsa_cert_serial"] == "0x1deface"
        # reference RDN format keeps a trailing space per element (RSA.py:67)
        assert others["rsa_cert_issuer"] == "CN=Evil CA , O=Evil Org "
        assert others["rsa_cert_subject"] == "CN=Evil CA , O=Evil Org "
        assert others["rsa_cert_valid_from"] == "2020-01-02 03:04:05"
        assert others["rsa_cert_valid_to"] == "2030-01-02 03:04:05"

    def test_private_key_extraction(self):
        from kgmwcp import fixtures

        data = fixtures.privkey_pem().encode()
        result = run(data, name="key.pem")
        assert result.files[0].description == "RSA Private Key"
        keys = [json.loads(o) for _, p, o in result.triples if p == "rsa_private_key"]
        assert keys == [{
            "public_exponent": 65537,
            "modulus": fixtures.KEY_N,
            "private_exponent": fixtures.KEY_D,
            "p": fixtures.KEY_P,
            "q": fixtures.KEY_Q,
            "d_mod_p1": fixtures.KEY_D % (fixtures.KEY_P - 1),
            "d_mod_q1": fixtures.KEY_D % (fixtures.KEY_Q - 1),
            "q_inv_mod_p": pow(fixtures.KEY_Q, -1, fixtures.KEY_P),
            "tags": [],
        }]

    def test_non_printable_not_identified(self):
        from kgmwcp import fixtures

        data = fixtures.cert_pem().encode() + b"\x00\xff"
        result = run(data, name="cert.pem")
        assert not any(p == "rsa_public_key" for _, p, _ in result.triples)

    def _expected_private(self):
        from kgmwcp import fixtures

        return {
            "public_exponent": 65537,
            "modulus": fixtures.KEY_N,
            "private_exponent": fixtures.KEY_D,
            "p": fixtures.KEY_P,
            "q": fixtures.KEY_Q,
            "d_mod_p1": fixtures.KEY_D % (fixtures.KEY_P - 1),
            "d_mod_q1": fixtures.KEY_D % (fixtures.KEY_Q - 1),
            "q_inv_mod_p": pow(fixtures.KEY_Q, -1, fixtures.KEY_P),
            "tags": [],
        }

    def test_privatekeyblob_extraction(self):
        # blob embedded mid-payload: the signature scan must find it
        from kgmwcp import fixtures

        data = b"\x90" * 33 + fixtures.privkey_blob() + b"trailing"
        result = run(data, name="key.blob")
        assert result.files[0].description == "RSA Key BLOB"
        keys = [json.loads(o) for _, p, o in result.triples
                if p == "rsa_private_key"]
        assert keys == [self._expected_private()]

    def test_publickeyblob_extraction(self):
        import struct
        from kgmwcp import fixtures

        blob = (bytes([0x06, 0x02, 0x00, 0x00]) + struct.pack("<I", 0xA400)
                + b"RSA1" + struct.pack("<II", 256, 65537)
                + fixtures.KEY_N.to_bytes(32, "little"))
        result = run(blob, name="pub.blob")
        keys = [json.loads(o) for _, p, o in result.triples
                if p == "rsa_public_key"]
        assert keys == [{"public_exponent": 65537,
                         "modulus": fixtures.KEY_N, "tags": []}]

    def test_truncated_blob_logs_error(self):
        from kgmwcp import fixtures

        data = b"\x00" * 8 + fixtures.privkey_blob()[:40]
        result = run(data, name="trunc.blob")
        assert not any(p == "rsa_private_key" for _, p, _ in result.triples)
        assert any("RSA key BLOB" in e for e in result.errors)

    def test_xml_private_key_extraction(self):
        from kgmwcp import fixtures

        data = ("config: " + fixtures.rsa_xml_key() + " tail").encode()
        result = run(data, name="key.xml")
        assert result.files[0].description == "RSA Key XML"
        keys = [json.loads(o) for _, p, o in result.triples
                if p == "rsa_private_key"]
        assert keys == [self._expected_private()]

    def test_xml_public_fallback(self):
        # no private components -> RSAPublicKey (from_XML fallback=True)
        from kgmwcp import fixtures

        data = fixtures.rsa_xml_key(private=False).encode()
        result = run(data, name="pub.xml")
        keys = [json.loads(o) for _, p, o in result.triples
                if p == "rsa_public_key"]
        assert keys == [{"public_exponent": 65537,
                         "modulus": fixtures.KEY_N, "tags": []}]
        assert not any(p == "rsa_private_key" for _, p, _ in result.triples)


class TestQuarantineMcAfee:
    def test_bup_extraction(self):
        from kgmwcp import fixtures

        inner = (fixtures.PDF_TEXT + "% filler\n" * 600).encode()
        data = fixtures.mcafee_bup_payload(inner, "C:\\Users\\victim\\evil.pdf")
        result = run(data, name="sample.bup")
        assert result.files[0].description == "McAfee Quarantined"
        # original-location path mention, tagged
        paths = [json.loads(o) for _, p, o in result.triples if p == "path"]
        assert paths == [{
            "path": "C:\\Users\\victim\\evil.pdf", "is_dir": False,
            "posix": False, "file_system": None, "tags": ["original_location"],
        }]
        # extracted child named from OriginalName, identified as PDF
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert [f["name"] for f in files] == ["evil.pdf"]
        assert files[0]["sha256"] == hashlib.sha256(inner).hexdigest()
        assert files[0]["description"] == "PDF Document"
        # the child's own extraction ran too
        urls = [json.loads(o)["url"] for _, p, o in result.triples if p == "url"]
        assert "http://bad.example.com/x?q=1" in urls


class TestQuarantineDefender:
    def test_0bad_variant(self):
        from kgmwcp import fixtures

        inner = b"dim x\r\nset y = createobject(\"z\")\r\n"
        data = fixtures.defender_payload(inner, variant="0bad")
        assert data[:2] == b"\x0b\xad"
        result = run(data, name="entry.dat")
        assert result.files[0].description == "Windows Defender Quarantined"
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert files[0]["sha256"] == hashlib.sha256(inner).hexdigest()
        assert files[0]["description"] == "VBScript"

    def test_dbe8_variant(self):
        from kgmwcp import fixtures
        from kgmwcp.engine.crypto import rc4
        from kgmwcp.engine.parsers import Defender

        inner = bytes(range(256)) * 4
        data = fixtures.defender_payload(inner, variant="dbe8")
        assert data[:4] == b"\xdb\xe8\xc5\x01"
        result = run(data, name="entry.dat")
        assert result.files[0].description == "Windows Defender Quarantined"
        # child = decrypted header + both segments
        header = rc4(Defender.RC4_KEY, data[:Defender.HEADER_LEN])
        expected_child = header + inner
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert files[0]["sha256"] == hashlib.sha256(expected_child).hexdigest()


class TestRC4:
    def test_symmetry_and_vector(self):
        from kgmwcp.engine.crypto import rc4

        # public test vector (RFC 6229 style): key "Key", plaintext "Plaintext"
        assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
        assert rc4(b"Key", rc4(b"Key", b"payload")) == b"payload"


class TestPE:
    def test_parse_roundtrip(self):
        from kgmwcp.engine import pe

        blob = pe.build_pe(payload=b"\xcc" * 100)
        parsed = pe.parse_pe(blob)
        assert parsed is not None
        assert parsed.architecture == "x86"
        assert parsed.file_ext() == ".exe"
        assert parsed.compile_time().isoformat() == "2020-01-01T00:00:00+00:00"
        assert parsed.overlay() is None

        blob64 = pe.build_pe(machine=pe.MACHINE_AMD64, dll=True)
        parsed64 = pe.parse_pe(blob64)
        assert parsed64.architecture == "x64"
        assert parsed64.file_ext() == ".dll"

    def test_overlay_dropper(self):
        from kgmwcp.engine import pe

        inner = pe.build_pe(payload=b"\x90" * 32)
        outer = pe.build_pe(payload=b"\xcc" * 32, overlay=inner)
        result = run(outer, name="drop.exe")
        assert result.files[0].description == "Dropper (Overlay)"
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert len(files) == 1
        child = files[0]
        assert child["sha256"] == hashlib.sha256(inner).hexdigest()
        # PE children get arch-suffixed stub names + PE metadata
        inner_md5 = hashlib.md5(inner).hexdigest()
        assert child["name"] == f"{inner_md5}_x86.exe"
        assert child["architecture"] == "x86"
        assert child["compile_time"] == "2020-01-01T00:00:00+00:00"

    def test_rsrc_dropper(self):
        from kgmwcp.engine import pe

        inner = pe.build_pe(payload=b"\x90" * 48)
        outer = pe.build_pe(payload=b"\xcc" * 32,
                            resources=[(10, 101, inner), (24, 1, b"<xml/>")])
        parsed = pe.parse_pe(outer)
        rsrcs = parsed.resources()
        assert [(t, i) for t, i, _ in rsrcs] == [("RT_RCDATA", "101"), ("RT_MANIFEST", "1")]
        assert rsrcs[0][2] == inner

        result = run(outer, name="drop2.exe")
        assert result.files[0].description == "Dropper (RSRC)"
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert [f["sha256"] for f in files] == [hashlib.sha256(inner).hexdigest()]

    def test_foo_reports_pe_section(self):
        from kgmwcp.engine import pe

        blob = pe.build_pe(payload=b"\x90" * 16)
        result = run(blob, route="foo", kb={})
        others = [json.loads(o) for _, p, o in result.triples if p == "other"]
        assert {"key": "section0", "value": "LnRleHQ=",  # b".text" base64
                "value_format": "bytes", "tags": []} in others


class TestQuarantineAhnLab:
    def test_v3b_extraction(self):
        from itertools import cycle
        from kgmwcp.engine.parsers import AhnLab

        inner = b"%PDF-1.4 quarantined original content here"
        header = b"AhnLab Inc. 2006" + b"\x00" * 0x4C
        # header declares 0x10 extra bytes before data (offset 0x58+0x10)
        header = bytearray(header)
        import struct
        struct.pack_into("<I", header, 0x58, 0x10)
        header = bytes(header) + b"\xee" * 0x0C  # prefix len = 0x58 + 0x10
        enc = bytes(d ^ k for d, k in zip(inner, cycle(AhnLab.KEY)))
        data = header + enc
        result = run(data, name="v3b.dat")
        assert result.files[0].description == "AhnLab"
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert files[0]["sha256"] == hashlib.sha256(inner).hexdigest()


class TestQuarantineAvast:
    def test_chest_extraction(self):
        from kgmwcp import fixtures

        inner = b"%PDF-1.4 stream http://avast.example.com/x end"
        data = fixtures.avast_payload(inner)
        result = run(data, name="chest.dat")
        assert result.files[0].description == "Avast or AVG"
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert files[0]["sha256"] == hashlib.sha256(inner).hexdigest()
        assert files[0]["description"] == "PDF Document"

    def test_chest_block_boundary_key_restart(self):
        # the key cycle restarts at each 0x10000 block: a payload spanning
        # the boundary must NOT decrypt as one continuous keystream
        from kgmwcp import fixtures
        from kgmwcp.engine.avastkey import AVAST_KEY

        inner = b"%PDF-1.4 " + bytes((i * 7) % 256 for i in range(0x10000 + 512))
        data = fixtures.avast_payload(inner)
        # sanity on the fixture itself: byte at block start uses key[0]
        assert data[8 + 0x10000] == inner[0x10000] ^ AVAST_KEY[0]
        result = run(data, name="big.chest")
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert files[0]["sha256"] == hashlib.sha256(inner).hexdigest()


class TestPyInstaller:
    def test_carchive_extraction(self):
        from kgmwcp import fixtures

        script = b"import socket\nHOST = 'c2.example.net'\n"
        data = fixtures.pyinstaller_payload(script)
        result = run(data, name="frozen.exe")
        assert result.files[0].description == "PyInstaller"
        # python version reported, tagged
        versions = [json.loads(o) for _, p, o in result.triples if p == "version"]
        assert versions == [{"value": "3.7", "tags": ["Python"]}]
        # manifest targeting: only 'evil' (-> evil.py) and the PYZ extracted
        files = sorted(
            json.loads(o)["name"] for _, p, o in result.triples if p == "file"
        )
        assert files == ["PYZ-00.pyz", "evil.py"]
        evil = next(json.loads(o) for _, p, o in result.triples
                    if p == "file" and json.loads(o)["name"] == "evil.py")
        assert evil["sha256"] == hashlib.sha256(script).hexdigest()


class TestISO:
    def test_image_walk(self):
        from kgmwcp.engine import iso9660

        ps1 = b"iex 'http://10.5.5.5/iso-drop'"
        image = iso9660.build_iso({"run.ps1": ps1, "readme.txt": b"hello iso"})
        assert iso9660.is_iso(image)

        # reader roundtrip
        files = {name: data for _, name, data in iso9660.IsoReader(image).walk()}
        assert files == {"RUN.PS1": ps1, "README.TXT": b"hello iso"}

        result = run(image, name="image.iso")
        assert result.files[0].description == "ISO Image File"
        file_rows = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert sorted(f["name"] for f in file_rows) == ["README.TXT", "RUN.PS1"]
        # .PS1 extension (case) — PowerShell identify is endswith(".ps1"),
        # so the upper-cased ISO identifier is NOT identified; parity with
        # the reference's case-sensitive name predicate (PowerShell.py:39-41)
        descs = {f["name"]: f["description"] for f in file_rows}
        assert descs["RUN.PS1"] == "Unidentified file"

    def test_joliet_long_names(self):
        from kgmwcp.engine import iso9660

        ps1 = b"iex 'http://10.5.5.5/iso-drop'"
        image = iso9660.build_iso(
            {"run.ps1": ps1, "readme.txt": b"hello iso"},
            joliet={"run.ps1": "Run Stage Two Payload.ps1",
                    "readme.txt": "Read Me First.txt"})
        reader = iso9660.IsoReader(image)
        assert reader.has_joliet() and not reader.has_rock_ridge()
        jfiles = {name: data for _, name, data in reader.walk("joliet")}
        assert jfiles == {"Run Stage Two Payload.ps1": ps1,
                          "Read Me First.txt": b"hello iso"}
        # primary view unchanged
        assert {n for _, n, _ in reader.walk()} == {"RUN.PS1", "README.TXT"}

        # rule walks both views: each member surfaces under BOTH its 8.3
        # and its Joliet name.  Note the Joliet twin stays Unidentified
        # even though its long name ends in .ps1: the identify cache is
        # keyed (parser, md5) in the reference too (dispatcher.py:183-199),
        # so the short-name probe's negative result is reused for the
        # identical-content twin — bug-for-bug parity.
        result = run(image, name="image.iso")
        file_rows = [json.loads(o) for _, p, o in result.triples if p == "file"]
        descs = {f["name"]: f["description"] for f in file_rows}
        assert descs["RUN.PS1"] == "Unidentified file"
        assert descs["Run Stage Two Payload.ps1"] == "Unidentified file"
        assert len(file_rows) == 4  # two members x two name views

    def test_rock_ridge_posix_names(self):
        from kgmwcp.engine import iso9660

        data = b"#!/bin/sh\necho hi\n"
        image = iso9660.build_iso(
            {"script.sh": data},
            rock_ridge={"script.sh": "install-stage2.sh"})
        reader = iso9660.IsoReader(image)
        assert reader.has_rock_ridge() and not reader.has_joliet()
        assert {n for _, n, _ in reader.walk("rr")} == {"install-stage2.sh"}
        assert {n for _, n, _ in reader.walk()} == {"SCRIPT.SH"}

        result = run(image, name="image.iso")
        names = sorted(json.loads(o)["name"]
                       for _, p, o in result.triples if p == "file")
        assert names == ["SCRIPT.SH", "install-stage2.sh"]

    def test_udf_only_payload_recovered(self):
        from kgmwcp.engine import iso9660

        # bridge image: empty primary tree, payload lives ONLY in UDF —
        # without the UDF walk this extracts nothing (the round-2 gap)
        ps1 = b"iex 'http://10.6.6.6/udf-drop.ps1'"
        image = iso9660.build_udf_bridge(
            {"drop.ps1": ps1, "note.txt": b"udf only"})
        assert iso9660.is_iso(image)
        reader = iso9660.IsoReader(image)
        assert reader.has_udf()
        assert not reader.has_joliet() and not reader.has_rock_ridge()
        assert list(reader.walk("iso")) == []
        udf_files = {n: d for _, n, d in reader.walk("udf")}
        assert udf_files == {"drop.ps1": ps1, "note.txt": b"udf only"}

        result = run(image, name="image.iso")
        assert any("UDF extension identified" in m for m in result.logs)
        file_rows = [json.loads(o) for _, p, o in result.triples if p == "file"]
        descs = {f["name"]: f["description"] for f in file_rows}
        # lower-case .ps1 name IS identified (unlike the 8.3 upper-case view)
        assert descs["drop.ps1"] == "PowerShell Script"
        urls = [json.loads(o)["url"] for _, p, o in result.triples if p == "url"]
        assert "http://10.6.6.6/udf-drop.ps1" in urls

    def test_udf_multi_extent_and_subdir(self):
        from kgmwcp.engine import iso9660

        # a payload spanning several 2048-byte extents round-trips intact
        big = bytes(range(256)) * 40        # 10240 bytes = 5 sectors
        image = iso9660.build_udf_bridge({"big.bin": big})
        got = {n: d for _, n, d in iso9660.IsoReader(image).walk("udf")}
        assert got == {"big.bin": big}

    def test_udf_cycle_and_truncation_safe(self):
        import struct as _struct

        from kgmwcp.engine import iso9660

        image = bytearray(iso9660.build_udf_bridge({"a.txt": b"payload"}))
        # craft a cycle: append a FID to the root directory's inline FIDs
        # pointing BACK at the root dir ICB (block 1) with the dir bit set
        reader = iso9660.IsoReader(bytes(image))
        part_start, root_block = reader._udf_root()
        cyc = iso9660._udf_fid("loop", 0x02, root_block, part_start + 1)
        fe_off = (part_start + root_block) * iso9660.SECTOR
        l_ad = _struct.unpack_from("<I", image, fe_off + 172)[0]
        image[fe_off + 176 + l_ad:fe_off + 176 + l_ad + len(cyc)] = cyc
        _struct.pack_into("<I", image, fe_off + 172, l_ad + len(cyc))
        looped = iso9660.IsoReader(bytes(image))
        # must terminate (visited set) and still yield the real file
        names = [n for _, n, _ in looped.walk("udf")]
        assert names == ["a.txt"]

        # truncation anywhere must degrade to fewer results, never raise
        base = iso9660.build_udf_bridge({"a.txt": b"payload"})
        for cut in (257 * 2048, 260 * 2048 + 100, len(base) - 1000):
            r = iso9660.IsoReader(base[:cut])
            assert isinstance(list(r.walk("udf")), list)

    def test_udf_empty_payload_alignment(self):
        from kgmwcp.engine import iso9660

        # an empty file must still occupy its reserved sector, or every
        # later file's recorded block addresses shift by one
        image = iso9660.build_udf_bridge({"empty.txt": b"", "a.txt": b"x" * 10})
        got = {n: d for _, n, d in iso9660.IsoReader(image).walk("udf")}
        assert got == {"empty.txt": b"", "a.txt": b"x" * 10}

    def test_identical_name_views_dedupe(self):
        from kgmwcp.engine import iso9660

        # joliet name equal to the primary name -> one file element only
        image = iso9660.build_iso({"A.TXT": b"same"}, joliet={"A.TXT": "A.TXT"})
        result = run(image, name="image.iso")
        names = [json.loads(o)["name"]
                 for _, p, o in result.triples if p == "file"]
        assert names == ["A.TXT"]


class TestQuarantineSubSDK:
    def test_blowfish_chunked_extraction(self):
        from kgmwcp import fixtures

        inner = (fixtures.PDF_TEXT + " " * (-len(fixtures.PDF_TEXT) % 8)).encode()
        data = fixtures.subsdk_payload(inner)
        result = run(data, name="sub.dat")
        assert result.files[0].description == "Symantec Quarantined Sub SDK"
        files = [json.loads(o) for _, p, o in result.triples if p == "file"]
        assert files[0]["sha256"] == hashlib.sha256(inner).hexdigest()
        assert files[0]["description"] == "PDF Document"


    def test_all_printable_ciphertext_still_trial_decrypted(self):
        """Bug-for-bug with Quarantined.py:146-166: identify must ALWAYS
        trial-decrypt — an adversarial fully-printable 48-byte prefix
        whose decrypted header matches a known magic is a SubSDK
        container to the reference, so it must be one to us.  The
        pinned prefix was brute-forced per ECB block (key chosen so
        E(pad-block) is printable, then the free header-tail bytes so
        E(header-block) is printable); decode of [32:48] yields
        b'%PDF\\\\\\xab!\\x8e'."""
        from kgmwcp.engine.parsers import SymantecSubSDK, _is_text

        prefix = b"AAAAAAAAAAAAAAAATr3zBCjTdgdJir4PZ=+DWc?<R\r|64=s@"
        assert _is_text(prefix, threshold=0.0)  # the old gate's condition
        data = prefix + b" " * 32
        f = SampleFile(data)
        assert SymantecSubSDK.identify(f) is True
        header = SymantecSubSDK._decode(data[32:48], data[16:32])
        assert header.startswith(b"%PDF")

    def test_openssl_fast_path_matches_pure_blowfish(self):
        """The libcrypto accelerator must be byte-identical to the
        from-scratch implementation (which defines the semantics) on
        random keys/blocks in both directions; skipped-silently fallback
        means this also passes when libcrypto lacks BF_* symbols."""
        import random

        from kgmwcp.engine.crypto import Blowfish

        rng = random.Random(7)
        for _ in range(20):
            key = bytes(rng.randrange(256)
                        for _ in range(rng.randrange(4, 57)))
            data = bytes(rng.randrange(256)
                         for _ in range(8 * rng.randrange(1, 5)))
            fast, pure = Blowfish(key), Blowfish(key, _pure=True)
            assert fast.encrypt(data) == pure.encrypt(data)
            assert fast.decrypt(data) == pure.decrypt(data)
            assert pure.decrypt(fast.encrypt(data)) == data

    def test_plain_text_rejected_via_trial_decrypt(self):
        # ordinary text: the trial decrypt itself rejects (bad PKCS7 or
        # no magic), matching the reference's answer without a fast path
        from kgmwcp.engine.parsers import SymantecSubSDK

        f = SampleFile(b"just some ordinary source text " * 4)
        assert SymantecSubSDK.identify(f) is False


class TestGreedyMode:
    def test_greedy_runs_all_matching_rules(self):
        # a PDF-with-IOCs also matches Decoy.PDF; greedy mode runs both
        data = b"%PDF-1.4 stream http://greedy.example.com/a end"
        non_greedy = ExtractionEngine().run(data, name="g.bin")
        assert non_greedy.files[0].description == "PDF Document"
        assert non_greedy.files[0].name == "g.bin"  # no decoy rename

        greedy = ExtractionEngine(greedy=True).run(data, name="g.bin")
        # PDF ran (urls extracted) AND Decoy renamed the extension
        assert any(p == "url" for _, p, _ in greedy.triples)
        assert greedy.files[0].name == "g.pdf"


class TestElfView:
    def test_parse_and_arch(self):
        from kgmwcp.engine.elf import parse_elf

        elf = parse_elf(fixtures.elf_payload(0))
        assert elf is not None
        assert elf.architecture == "x64"
        assert [n for n, _ in elf.sections()] == ["", ".text", ".shstrtab"]
        assert elf.section_data(".text").startswith(b"\x90" * 16)

    def test_machine_arch_mapping(self):
        from kgmwcp.engine.elf import parse_elf

        # pyelftools get_machine_arch names; unknown machine -> None
        # (the reference maps '<unknown>' to None, file_object.py:498-502)
        assert parse_elf(fixtures.elf_payload(0, machine=0x03)).architecture == "x86"
        assert parse_elf(fixtures.elf_payload(0, machine=0xB7)).architecture == "AArch64"
        assert parse_elf(fixtures.elf_payload(0, machine=0x9999)).architecture is None

    def test_not_elf_and_truncated(self):
        from kgmwcp.engine.elf import parse_elf

        assert parse_elf(b"MZ not an elf") is None
        assert parse_elf(fixtures.elf_payload(0)[:40]) is None

    def test_fileobj_architecture_from_elf(self):
        from kgmwcp.engine.fileobj import SampleFile

        f = SampleFile(fixtures.elf_payload(0))
        assert f.architecture == "x64"
        assert f.pe is None and f.elf is not None


class TestMachoView:
    def test_thin_slice(self):
        from kgmwcp.engine.macho import parse_macho

        m = parse_macho(fixtures.macho_payload(0))
        assert m is not None and m.size == 1
        # lief-style enum names (machoutils.get_cpu_type parity)
        assert m.cpu_types() == ["X86_64"]
        assert m.section_data("__text").startswith(b"\xc3" * 8)

    def test_fat_binary(self):
        from kgmwcp.engine.macho import parse_macho

        m = parse_macho(fixtures.macho_fat_payload(1))
        assert m.size == 2
        assert m.cpu_types() == ["X86_64", "ARM64"]
        assert m.at(1).cpu_type == "ARM64"
        assert b"macho-variant-1" in m.section_data("__text")

    def test_not_macho(self):
        from kgmwcp.engine.macho import parse_macho

        assert parse_macho(b"\x7fELF" + bytes(60)) is None
        assert parse_macho(b"") is None

    def test_macho_does_not_set_architecture(self):
        # reference parity: FileObject.architecture is PE/ELF only
        from kgmwcp.engine.fileobj import SampleFile

        f = SampleFile(fixtures.macho_payload(0))
        assert f.macho is not None
        assert f.architecture is None


class TestPEOriginalFilename:
    """pefileutils.obtain_original_filename parity (pefileutils.py:350-418):
    export-dir DLL name, else RT_VERSION OriginalFilename, else
    '<stub>_<arch><ext>'."""

    def test_export_directory_name(self):
        from kgmwcp.engine import pe

        blob = pe.build_pe(payload=b"\xcc" * 64, dll=True,
                           export_name=b"evil_core.dll")
        parsed = pe.parse_pe(blob)
        assert parsed.export_name() == "evil_core.dll"
        assert parsed.original_filename("stub") == "evil_core.dll"
        assert parsed.original_filename("stub", use_arch=True) == "evil_core_x86.dll"
        assert SampleFile(blob).name == "evil_core.dll"

    def test_version_info_name(self):
        from kgmwcp.engine import pe

        vi = pe.build_version_info("payload.exe")
        blob = pe.build_pe(payload=b"\x90" * 64, resources=[(16, 1, vi)])
        parsed = pe.parse_pe(blob)
        assert parsed.export_name() is None
        assert parsed.version_original_filename() == "payload.exe"
        assert SampleFile(blob).name == "payload.exe"

    def test_export_beats_version(self):
        from kgmwcp.engine import pe

        vi = pe.build_version_info("payload.exe")
        blob = pe.build_pe(payload=b"\x90" * 64, export_name=b"lib.dll",
                           resources=[(16, 1, vi)])
        assert pe.parse_pe(blob).original_filename("s") == "lib.dll"

    def test_fallback_stub_unchanged(self):
        from kgmwcp.engine import pe

        blob = pe.build_pe(payload=b"\x90" * 32)
        expected = hashlib.md5(blob).hexdigest() + "_x86.exe"
        assert SampleFile(blob).name == expected


class TestPEExportsImports:
    """pefileutils export/import surface (pefileutils.py:170-268)."""

    def _blob(self):
        from kgmwcp.engine import pe

        return pe.build_pe(
            payload=b"\x90" * 64, dll=True, export_name=b"core.dll",
            exports=[b"Init", b"RunPayload", b"Shutdown"],
            imports={b"KERNEL32.dll": [b"CreateFileA", b"ReadFile"],
                     b"WS2_32.dll": [b"connect", b"send"]},
        )

    def test_exports_list(self):
        from kgmwcp.engine import pe

        p = pe.parse_pe(self._blob())
        assert p.exports() == ["Init", "RunPayload", "Shutdown"]
        assert p.export_name() == "core.dll"

    def test_imports(self):
        from kgmwcp.engine import pe

        p = pe.parse_pe(self._blob())
        assert p.imports() == {
            "KERNEL32.dll": ["CreateFileA", "ReadFile"],
            "WS2_32.dll": ["connect", "send"],
        }
        assert p.is_imported("kernel32.DLL", "ReadFile")
        assert not p.is_imported("user32.dll", "MessageBoxA")

    def test_imports_64bit_thunks(self):
        from kgmwcp.engine import pe

        blob = pe.build_pe(payload=b"\x90" * 32, machine=pe.MACHINE_AMD64,
                           imports={b"ntdll.dll": [b"NtCreateFile"]})
        assert pe.parse_pe(blob).imports() == {"ntdll.dll": ["NtCreateFile"]}

    def test_section_data_and_offset_mapping(self):
        from kgmwcp.engine import pe

        p = pe.parse_pe(self._blob())
        assert p.section_data(".text").startswith(b"\x90" * 16)
        assert p.section_data(".missing") is None
        off = p.rva_to_offset(0x1000)
        assert p.offset_to_rva(off) == 0x1000

    def test_no_tables_empty(self):
        from kgmwcp.engine import pe

        p = pe.parse_pe(pe.build_pe(payload=b"\x90" * 16))
        assert p.exports() == []
        assert p.imports() == {}


class TestElfSegments:
    def test_segment_address_mapping(self):
        from kgmwcp.engine.elf import parse_elf

        e = parse_elf(fixtures.elf_payload(0, with_segment=True))
        assert e.architecture == "x64"
        segs = e.segments()
        assert len(segs) == 1 and segs[0][0] == 1  # one PT_LOAD
        text_off = 64 + 56
        va = e.offset_to_vaddr(text_off + 4)
        assert va == 0x400000 + text_off + 4
        assert e.vaddr_to_offset(va) == text_off + 4
        assert e.vaddr_to_offset(0x1) is None

    def test_no_program_headers(self):
        from kgmwcp.engine.elf import parse_elf

        e = parse_elf(fixtures.elf_payload(0))
        assert e.segments() == []
        assert e.offset_to_vaddr(70) is None


class TestMediaCodecs:
    """engine/media.py: builders emit spec-conformant files and parsers
    recover metadata from bytes alone (the multimodal decode path)."""

    def test_bmp_roundtrip(self):
        from kgmwcp.engine import media

        for w, h, c in [(1, 1, 3), (31, 17, 3), (32, 24, 4)]:
            payload = media.make_bmp(w, h, c, seed=7)
            meta = media.parse_bmp(payload)
            assert meta == {"width": w, "height": h, "channels": c,
                            "n_bytes": len(payload)}
            # declared file size matches reality (offset 2, LE u32)
            import struct
            assert struct.unpack_from("<I", payload, 2)[0] == len(payload)

    def test_bmp_topdown_negative_height(self):
        import struct

        from kgmwcp.engine import media

        payload = bytearray(media.make_bmp(8, 4, 3))
        struct.pack_into("<i", payload, 22, -4)  # top-down row order
        assert media.parse_bmp(bytes(payload))["height"] == 4

    def test_wav_roundtrip_and_chunk_order(self):
        import struct

        from kgmwcp.engine import media

        payload = media.make_wav(2, 16000, 123, seed=3)
        meta = media.parse_wav(payload)
        assert meta == {"channels": 2, "sample_rate": 16000,
                        "duration_ms": 123 * 1000 // 16000,
                        "n_bytes": len(payload)}
        # chunk walk survives an extra LIST chunk before fmt/data
        # (odd-sized -> exercises even-offset padding)
        extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
        reordered = payload[:12] + extra + payload[12:]
        meta2 = media.parse_wav(reordered)
        assert meta2["channels"] == 2 and meta2["sample_rate"] == 16000

    def test_decode_real_sniffs_and_rejects(self):
        import pytest as _pytest

        from kgmwcp.engine import media
        from kgmwcp.ops.multimodal import decode_real

        bmp = decode_real(media.make_bmp(5, 6, 4))
        assert (bmp["media_type"], bmp["width"], bmp["height"],
                bmp["channels"]) == ("image/bmp", 5, 6, 4)
        wav = decode_real(media.make_wav(1, 8000, 40))
        assert (wav["media_type"], wav["sample_rate"],
                wav["duration_ms"]) == ("audio/wav", 8000, 5)
        with _pytest.raises(NotImplementedError):
            decode_real(b"\x89PNG\r\n\x1a\n not a codec we ship")


class TestDispatcherRobustness:
    def test_identify_crash_contained(self):
        """A crashing identify() must not escape run() (it would fail the
        whole Spark task) — deviation from the reference's unguarded
        call, logged as an error instead."""
        from kgmwcp.engine.dispatcher import ExtractionEngine
        from kgmwcp.engine.parsers import Rule

        class Bomb(Rule):
            DESCRIPTION = "Bomb"

            @classmethod
            def identify(cls, f):
                raise ValueError("boom")

            def run(self, f, ctx):  # pragma: no cover
                raise AssertionError

        eng = ExtractionEngine()
        eng.groups = dict(eng.groups)
        first = eng.group_order[0]
        eng.groups[first] = [Bomb] + list(eng.groups[first])
        result = eng.run(b"plain text", name="x.txt")
        assert any("Bomb identify failed: boom" in e for e in result.errors)
        # extraction still completed: the root got its fallback identity
        assert result.files[0].description == "Unidentified file"

    def test_max_files_truncation_is_logged(self):
        from kgmwcp.engine import dispatcher as disp
        from kgmwcp.engine.dispatcher import ExtractionEngine

        inner = b"PK\x03\x04"  # irrelevant; we drive the queue directly
        eng = ExtractionEngine()
        old = disp.MAX_FILES_PER_ROOT
        disp.MAX_FILES_PER_ROOT = 2
        try:
            from kgmwcp import fixtures
            # zip with 3 members -> root + 3 children > 2 processed
            payload = fixtures._zip_payload(b"m1", 0)
            result = eng.run(payload, name="a.zip")
            assert any("max files per root exceeded" in e
                       for e in result.errors)
        finally:
            disp.MAX_FILES_PER_ROOT = old


class TestMediaResizeFeatures:
    def test_resize_reads_real_pixels_not_header_echo(self):
        from kgmwcp.engine import media

        bmp = media.make_bmp(9, 6, 3, seed=7)
        base = media.resize_bmp_nearest(bmp)
        assert base["width"] == 5 and base["height"] == 3
        # flip one pixel byte that nearest-neighbor samples: the checksum
        # MUST move — proving bytes are read, not recomputed from headers
        corrupted = bytearray(bmp)
        corrupted[54] = (corrupted[54] + 1) % 256  # pixel (0,0) channel 0
        assert media.resize_bmp_nearest(bytes(corrupted))["checksum"] \
            != base["checksum"]

    def test_resize_bounds_guarded_on_truncated_pixels(self):
        from kgmwcp.engine import media

        bmp = media.make_bmp(9, 6, 3, seed=7)
        assert media.resize_bmp_nearest(bmp[:60]) is None
        assert media.resize_bmp_nearest(b"not a bmp") is None

    def test_wav_features_decode_matches_struct_truth(self):
        import struct

        from kgmwcp.engine import media

        wav = media.make_wav(2, 8000, 5, seed=3)
        feats = media.wav_features(wav)
        words = struct.unpack_from("<10h", wav, 44)
        assert feats["n_frames"] == 5 and feats["channels"] == 2
        assert feats["sum_abs"] == sum(abs(w) for w in words)
        assert feats["peak"] == max(abs(w) for w in words)
        # truncated data chunk: guarded, not raising
        assert media.wav_features(wav[:50]) is None
