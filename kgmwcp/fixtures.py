"""Deterministic fixture corpus generator (FIXTURES.md §A).

Synthesizes the pipeline's input table ``(repo, path, commit, lang,
content[, route])`` at a chosen replication factor.  Fully deterministic:
fixed literal payloads, zip entries dated 1980-01-01, gzip mtime=0 — no
wall-clock anywhere.  Binary payloads are base64 in ``content`` with
``lang='binary-b64'`` (stage 0 decodes before hashing, preserving the
content-sha256 invariant).
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import tarfile
import zipfile
from typing import Iterator, List, Optional, Tuple

from kgmwcp.engine import vbe

__all__ = ["corpus_rows", "corpus_df", "PS1_URLS", "PDF_TEXT", "VBS_TEXT"]

# -- canonical payloads ------------------------------------------------------

PS1_URLS = (
    "$c2 = 'http://10.1.2.3:8080/a/b.jpg';\n"
    "Invoke-WebRequest 'https://evil-domain.com/gate.php'\n"
    "$me = 'https://api.ipify.org'  # dropped by denylist\n"
)

PDF_TEXT = (
    "%PDF-1.4\n1 0 obj\n<< /URI (http://bad.example.com/x?q=1) >>\n"
    "contact admin@bad.example.com\n"
    "xmlns http://www.w3.org/1999/xhtml ignored\nendobj\n"
)

VBS_TEXT = 'dim x\r\nset shell = createobject("WScript.Shell")\r\nshell.run "cmd"\r\n'

MUTEX_PS1 = (
    "$u = 'http://mutex-c2.example.com/beacon'\n"  # shared hot entity
    "New-Object System.Threading.Mutex($false, 'Global\\PopularMutex')\n"
)

PLAIN_TEXT = "just some ordinary readme text with nothing interesting.\n"

FOO_TEXT = "config blob for the demo foo parser\n"


def _zip_payload(inner_ps1: bytes, variant: int) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        info = zipfile.ZipInfo("payload/inner.ps1", date_time=(1980, 1, 1, 0, 0, 0))
        zf.writestr(info, inner_ps1)
        note = zipfile.ZipInfo("note.txt", date_time=(1980, 1, 1, 0, 0, 0))
        zf.writestr(note, f"note {variant}\n".encode())
    return buf.getvalue()


def _targz_payload(member: bytes, variant: int) -> bytes:
    tarbuf = io.BytesIO()
    with tarfile.open(fileobj=tarbuf, mode="w") as tar:
        info = tarfile.TarInfo(f"m{variant}.vbs")
        info.size = len(member)
        info.mtime = 0
        tar.addfile(info, io.BytesIO(member))
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gzf:
        gzf.write(tarbuf.getvalue())
    return out.getvalue()


def _zip_native_payload(variant: int) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        so = zipfile.ZipInfo("native/libx.so", date_time=(1980, 1, 1, 0, 0, 0))
        zf.writestr(so, elf_payload(variant))
        tool = zipfile.ZipInfo("native/tool.bin", date_time=(1980, 1, 1, 0, 0, 0))
        zf.writestr(tool, macho_fat_payload(variant))
    return buf.getvalue()


def _qb_payload(plain: bytes) -> bytes:
    return bytes(b ^ 0xB3 for b in plain)


def inner_pe(variant: int) -> bytes:
    from kgmwcp.engine import pe

    return pe.build_pe(payload=b"\x90" * 32 + bytes([variant % 256]) * 8)


def dropper_overlay_payload(variant: int) -> bytes:
    """Host PE with an embedded PE appended as overlay."""
    from kgmwcp.engine import pe

    return pe.build_pe(payload=b"\xcc" * 32, overlay=inner_pe(variant))


def mcafee_bup_payload(inner: bytes, original_name: str) -> bytes:
    """McAfee BUP fixture: OLE container with XOR-0x6a Details + File_0.
    Streams are padded past the mini-stream cutoff (comment lines / content
    padding) because the fixture CFB writer emits regular FAT only."""
    from kgmwcp.engine import cfb

    details = (
        "[Details]\nCreationYear=2020\n"
        f"[File_0]\nOriginalName={original_name}\n"
    )
    details += "".join(f"; pad {i}\n" for i in range(500))  # > 4096 bytes
    if len(inner) < 4096:
        raise ValueError("pad inner payload past the mini-stream cutoff")
    streams = {
        "Details": bytes(b ^ 0x6A for b in details.encode("utf8")),
        "File_0": bytes(b ^ 0x6A for b in inner),
    }
    return cfb.build_cfb(streams)


def defender_payload(inner: bytes, variant: str = "0bad") -> bytes:
    """Defender quarantine fixture: RC4-encrypt ``inner`` into either the
    \\x0B\\xAD or \\xDB\\xE8\\xC5\\x01 layout (inverse of the extractor)."""
    import struct

    from kgmwcp.engine.crypto import rc4
    from kgmwcp.engine.parsers import Defender

    key = Defender.RC4_KEY
    if variant == "0bad":
        extra_header = 0x20  # header_len = 0x28 + this
        header_len = 0x28 + extra_header
        plain = bytearray(header_len)
        struct.pack_into("<I", plain, 0x08, extra_header)
        struct.pack_into("<I", plain, header_len - 12, len(inner))
        plain += inner
        # force the plaintext magic of the *encrypted* stream
        keystream = rc4(key, b"\x00" * 2)
        plain[0] = keystream[0] ^ 0x0B
        plain[1] = keystream[1] ^ 0xAD
        return rc4(key, bytes(plain))
    # DB E8 C5 01 variant: three independently keyed segments
    header = bytearray(Defender.HEADER_LEN)
    keystream = rc4(key, b"\x00" * 4)
    header[0:4] = bytes(k ^ m for k, m in zip(keystream, b"\xDB\xE8\xC5\x01"))
    half = len(inner) // 2
    struct.pack_into("<I", header, 0x28, half)
    struct.pack_into("<I", header, 0x2C, len(inner) - half)
    return (rc4(key, bytes(header)) + rc4(key, inner[:half])
            + rc4(key, inner[half:]))


# -- deterministic X.509 / PKCS#1 fixtures (kgmwcp/engine/der.py encoder) -----

# fixed RSA parameters — arbitrary deterministic big ints; the extractors
# never validate primality, only parse structure
CERT_MODULUS = int(hashlib.sha256(b"kgmwcp-cert-modulus").hexdigest(), 16) | (1 << 511) | 1
CERT_EXPONENT = 65537
KEY_P = int(hashlib.sha256(b"kgmwcp-key-p").hexdigest()[:32], 16) | (1 << 127) | 1
KEY_Q = int(hashlib.sha256(b"kgmwcp-key-q").hexdigest()[:32], 16) | (1 << 127) | 1
KEY_N = KEY_P * KEY_Q
KEY_D = int(hashlib.sha256(b"kgmwcp-key-d").hexdigest(), 16)
CERT_SERIAL = 0x1DEFACE
CERT_NOT_BEFORE = "200102030405Z"
CERT_NOT_AFTER = "300102030405Z"


def cert_der() -> bytes:
    from kgmwcp.engine import der

    def rdn(oid: str, value: str) -> bytes:
        return der.encode_set(der.encode_sequence(
            der.encode_oid(oid), der.encode_printable_string(value)))

    rsa_oid = der.encode_sequence(der.encode_oid("1.2.840.113549.1.1.11"),
                                  der.encode_null())
    name = der.encode_sequence(rdn("2.5.4.3", "Evil CA"), rdn("2.5.4.10", "Evil Org"))
    pubkey = der.encode_sequence(der.encode_integer(CERT_MODULUS),
                                 der.encode_integer(CERT_EXPONENT))
    spki = der.encode_sequence(
        der.encode_sequence(der.encode_oid("1.2.840.113549.1.1.1"), der.encode_null()),
        der.encode_bit_string(pubkey),
    )
    tbs = der.encode_sequence(
        der.encode_context(0, der.encode_integer(2)),
        der.encode_integer(CERT_SERIAL),
        rsa_oid,
        name,
        der.encode_sequence(der.encode_utc_time(CERT_NOT_BEFORE),
                            der.encode_utc_time(CERT_NOT_AFTER)),
        name,  # self-signed: subject == issuer
        spki,
    )
    return der.encode_sequence(tbs, rsa_oid, der.encode_bit_string(b"\x00" * 64))


def privkey_der() -> bytes:
    from kgmwcp.engine import der

    return der.encode_sequence(
        der.encode_integer(0),
        der.encode_integer(KEY_N),
        der.encode_integer(CERT_EXPONENT),
        der.encode_integer(KEY_D),
        der.encode_integer(KEY_P),
        der.encode_integer(KEY_Q),
        der.encode_integer(KEY_D % (KEY_P - 1)),
        der.encode_integer(KEY_D % (KEY_Q - 1)),
        der.encode_integer(pow(KEY_Q, -1, KEY_P)),
    )


def privkey_blob() -> bytes:
    """MS PRIVATEKEYBLOB fixture from the same CRT parameters as the PEM
    key (inverse of msblob.parse_private_blob; layout per the public
    CryptoAPI docs restated in windows_structures.py:271-290)."""
    import struct

    bitlen, full, half = 256, 32, 16
    blob = bytes([0x07, 0x02, 0x00, 0x00])          # type, version, reserved
    blob += struct.pack("<I", 0x0000A400)            # CALG_RSA_KEYX
    blob += b"RSA2" + struct.pack("<II", bitlen, CERT_EXPONENT)
    for value, size in (
        (KEY_N, full), (KEY_P, half), (KEY_Q, half),
        (KEY_D % (KEY_P - 1), half), (KEY_D % (KEY_Q - 1), half),
        (pow(KEY_Q, -1, KEY_P), half), (KEY_D, full),
    ):
        blob += value.to_bytes(size, "little")
    return blob


def rsa_xml_key(private: bool = True) -> str:
    """.NET RSA.ToXmlString-shaped fixture for the same key material."""
    def b64(value: int, size: int) -> str:
        return base64.b64encode(value.to_bytes(size, "big")).decode("ascii")

    parts = [
        f"<Modulus>{b64(KEY_N, 32)}</Modulus>",
        f"<Exponent>{b64(CERT_EXPONENT, 3)}</Exponent>",
    ]
    if private:
        parts += [
            f"<P>{b64(KEY_P, 16)}</P>",
            f"<Q>{b64(KEY_Q, 16)}</Q>",
            f"<DP>{b64(KEY_D % (KEY_P - 1), 16)}</DP>",
            f"<DQ>{b64(KEY_D % (KEY_Q - 1), 16)}</DQ>",
            f"<InverseQ>{b64(pow(KEY_Q, -1, KEY_P), 16)}</InverseQ>",
            f"<D>{b64(KEY_D, 32)}</D>",
        ]
    return "<RSAKeyValue>" + "".join(parts) + "</RSAKeyValue>"


def _pem(der_bytes: bytes, label: str) -> str:
    body = base64.b64encode(der_bytes).decode("ascii")
    lines = [body[i:i + 64] for i in range(0, len(body), 64)]
    return (f"-----BEGIN {label}-----\n" + "\n".join(lines)
            + f"\n-----END {label}-----\n")


def cert_pem() -> str:
    return _pem(cert_der(), "CERTIFICATE")


def privkey_pem() -> str:
    return _pem(privkey_der(), "RSA PRIVATE KEY")


def _b64(data: bytes) -> str:
    return base64.b64encode(data).decode("ascii")


def _commit(seed: str) -> str:
    return hashlib.sha1(seed.encode()).hexdigest()


Row = Tuple[str, str, str, str, str, Optional[str]]
COLUMNS = ["repo", "path", "commit", "lang", "content", "route"]


def corpus_rows(replication: int = 1, hot_rows: int = 8) -> List[Row]:
    """Build the corpus; ``replication`` scales every class, ``hot_rows``
    scales only the hot-entity class (skew knob).

    Repo assignment is intentionally skewed: ~half of all rows land in two
    repos (exercises the repartition/skew path per FIXTURES.md).
    """
    rows: List[Row] = []

    def add(cls: str, i: int, path: str, lang: str, content: str,
            route: Optional[str] = None) -> None:
        # 50% of rows land in the single hot repo-000 (even ordinals),
        # the rest spread over 15 odd-numbered repos — one-hot-repo
        # skew, the shape the repartition-by-sha256 path must absorb
        ordinal = len(rows)
        if ordinal % 2 == 0:
            repo = f"repo-{ordinal % 2:03d}"
        else:
            repo = f"repo-{2 + (ordinal % 30):03d}"
        rows.append((repo, path, _commit(f"{cls}/{i}/{path}"), lang, content, route))

    for i in range(replication):
        # variant suffix makes each replica content-distinct (distinct sha256)
        v = f"\n# variant {i}\n"
        vb = f"' variant {i}\r\n"

        add("ps1_urls", i, f"x{i}/run.ps1", "powershell", PS1_URLS + v)
        add("pdf_iocs", i, f"a{i}/doc.pdf", "pdf", PDF_TEXT + v)
        add("vbs_plain", i, f"s{i}/mal.vbs", "vbscript", VBS_TEXT + vb)
        add("vbe_script", i, f"s{i}/enc.vbe", "binary-b64",
            _b64(vbe.wrap_vbe(VBS_TEXT + vb)))
        add("zip_nested", i, f"a{i}/drop.zip", "binary-b64",
            _b64(_zip_payload((PS1_URLS + v).encode(), i)))
        add("gzip_tar", i, f"a{i}/drop.tar.gz", "binary-b64",
            _b64(_targz_payload((VBS_TEXT + vb).encode(), i)))
        add("decoy_doc", i, f"d{i}/readme.bin", "binary-b64",
            _b64(b"\xd0\xcf\x11\xe0" + f"decoy filler {i}".encode()))
        add("qb_xor", i, f"q{i}/sample.qbd", "binary-b64",
            _b64(_qb_payload((PDF_TEXT + v).encode())))
        add("mcafee_bup", i, f"q{i}/sample.bup", "binary-b64",
            _b64(mcafee_bup_payload(
                (PDF_TEXT + v + "% filler\n" * 600).encode(),
                f"C:\\Users\\victim{i}\\evil.pdf")))
        add("defender_q", i, f"q{i}/entry.dat", "binary-b64",
            _b64(defender_payload((VBS_TEXT + vb).encode(), variant="0bad")))
        add("avast_chest", i, f"q{i}/chest.dat", "binary-b64",
            _b64(avast_payload((PDF_TEXT + v).encode())))
        add("dropper_overlay", i, f"b{i}/drop.exe", "binary-b64",
            _b64(dropper_overlay_payload(i)))
        add("pem_cert", i, f"k{i}/cert.pem", "pem", cert_pem() + f"# {i}\n")
        add("pem_privkey", i, f"k{i}/key.pem", "pem", privkey_pem() + f"# {i}\n")
        add("rsa_blob", i, f"k{i}/key.blob", "binary-b64",
            _b64(privkey_blob() + f"pad{i}".encode()))
        add("rsa_xml", i, f"k{i}/key.xml", "text",
            rsa_xml_key() + f"<!-- {i} -->\n")
        add("foo_any", i, f"f{i}/anything.txt", "text", FOO_TEXT + v, route="foo")
        add("unidentified", i, f"u{i}/blob.txt", "text", PLAIN_TEXT + v)
        # dup_pair: identical content, different repo/path -> same sha256
        add("dup_a", i, f"p{i}/dup_a.ps1", "powershell", PS1_URLS)
        add("dup_b", i, f"p{i}/dup_b.ps1", "powershell", PS1_URLS)
        # non-Windows executables as zip children: unidentified file nodes
        # whose architecture comes from the ELF view (Mach-O stays None —
        # reference file_object.py:492-504 never consults the macho view)
        add("zip_native", i, f"e{i}/native.zip", "binary-b64",
            _b64(_zip_native_payload(i)))

    for i in range(hot_rows):
        # hot_mutex: every row extracts the same URL entity -> hot key
        add("hot_mutex", i, f"h{i}/beacon.ps1", "powershell",
            MUTEX_PS1 + f"# row {i}\n")

    return rows


def corpus_df(spark, replication: int = 1, hot_rows: int = 8):
    from kgmwcp.schema import DOCUMENTS_SCHEMA, ROUTE_COLUMN
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(list(DOCUMENTS_SCHEMA) + [StructField(ROUTE_COLUMN, StringType())])
    return spark.createDataFrame(corpus_rows(replication, hot_rows), schema)


# The golden-parquet fixture scale: ONE definition shared by
# __spark_entry__'s pipeline_fixture_* queries, ops/graph.py's
# kg_pagerank_pipeline, and (by documented contract) the python-side
# build in scripts/make_goldens.py — the committed golden/*.parquet are
# derived at exactly this shape, so every live-pipeline oracle row
# depends on these staying in lockstep.
GOLDEN_REPLICATION = 4
GOLDEN_HOT_ROWS = 16
GOLDEN_PIPELINE_CONFIG = dict(n_buckets=16, knowledge_base={"secret": "hello"})


def golden_dir() -> str:
    """Location of the committed golden parquet — the ONE resolver
    (simplify pass: graph.py's two pipeline oracles and __spark_entry__
    each hand-rolled this).  Resolved at CALL time, not import: a
    --py-files zip or relocated checkout changes ``__file__``, and a
    baked path silently produces an unreadable oracle (round-4 ADVICE).
    ``KGMWCP_GOLDEN_DIR`` overrides for fully detached deployments."""
    import os

    return os.environ.get("KGMWCP_GOLDEN_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def golden_corpus(spark):
    """Fixture corpus at the golden-parquet scale."""
    return corpus_df(spark, replication=GOLDEN_REPLICATION,
                     hot_rows=GOLDEN_HOT_ROWS)


_GOLDEN_TABLES_CACHE: dict = {}


def golden_pipeline_tables(spark):
    """The full pipeline run whose triples/nodes match golden/*.parquet.

    Memoized per SparkSession: four driver-gate queries (triples, nodes,
    stix, kg_pagerank_pipeline) consume these tables in one session, and
    without the cache each would re-run the extract stage and stack a
    fresh records persist."""
    # applicationId is unique per SparkContext — no id()-reuse staleness,
    # and no cache clear (two live sessions alternating calls would
    # otherwise thrash, re-running the pipeline and stacking persists)
    key = spark.sparkContext.applicationId
    # evict entries whose SparkContext has been stopped (pyspark nulls
    # _jsc on stop()): their persisted-DataFrame handles are dead weight
    # that would otherwise leak for the life of a multi-session process
    for k, (sess, _) in list(_GOLDEN_TABLES_CACHE.items()):
        if k != key and getattr(sess.sparkContext, "_jsc", None) is None:
            del _GOLDEN_TABLES_CACHE[k]
    if key not in _GOLDEN_TABLES_CACHE:
        from kgmwcp.pipeline import Pipeline, PipelineConfig

        pipe = Pipeline(PipelineConfig(**GOLDEN_PIPELINE_CONFIG))
        _GOLDEN_TABLES_CACHE[key] = (spark, pipe.run(golden_corpus(spark)))
    return _GOLDEN_TABLES_CACHE[key][1]


def iter_expected_root_hashes(replication: int = 1, hot_rows: int = 8) -> Iterator[str]:
    """sha256 of each row's decoded content (test helper)."""
    for _, _, _, lang, content, _ in corpus_rows(replication, hot_rows):
        raw = base64.b64decode(content) if lang == "binary-b64" else content.encode()
        yield hashlib.sha256(raw).hexdigest()


def pyinstaller_payload(script: bytes, variant: int = 0) -> bytes:
    """PyInstaller 2.1+ CArchive fixture: zlib'd script entry + manifest +
    PYZ stub, trailing cookie (inverse of the extractor's layout walk)."""
    import struct
    import zlib

    magic = b"MEI\x0c\x0b\x0a\x0b\x0e"

    def toc_entry(name: str, typ: bytes, blob: bytes, offset: int,
                  compressed: bool) -> tuple:
        stored = zlib.compress(blob) if compressed else blob
        name_field = name.encode() + b"\x00" * (8 - len(name.encode()) % 8)
        entry_size = 18 + len(name_field)
        head = struct.pack(">IIII", entry_size, offset, len(stored), len(blob))
        head += b"\x01" if compressed else b"\x00"
        head += typ
        return head + name_field, stored

    blobs = []
    entries = []
    offset = 0
    for name, typ, blob, compressed in [
        ("evil", b"s", script, True),
        ("evil.exe.manifest", b"x", b"<assembly/>" + bytes([variant % 256]), False),
        ("PYZ-00.pyz", b"z", b"PYZ\x00\x42\x0d\x0d\x0a" + b"\x00" * 16, False),
    ]:
        entry, stored = toc_entry(name, typ, blob, offset, compressed)
        entries.append(entry)
        blobs.append(stored)
        offset += len(stored)

    data_blob = b"".join(blobs)
    toc = b"".join(entries)
    cookie = magic + struct.pack(
        ">IIII", 0, len(data_blob), len(entries), 37) + b"python37.dll".ljust(64, b"\x00")
    cookie_size = len(cookie)
    assert cookie_size == 88
    package_size = len(data_blob) + len(toc) + cookie_size
    cookie = magic + struct.pack(
        ">IIII", package_size, len(data_blob), len(entries), 37
    ) + b"python37.dll".ljust(64, b"\x00")
    return data_blob + toc + cookie


def avast_payload(inner: bytes) -> bytes:
    """Avast chest fixture: XOR is its own inverse, so encrypting is the
    same per-64KiB-block keystream walk the parser undoes
    (Quarantined.py:548-563)."""
    from itertools import cycle

    from kgmwcp.engine.avastkey import AVAST_KEY

    block_size = 0x10000
    enc = bytearray()
    for off in range(0, len(inner), block_size):
        enc += bytes(d ^ k for d, k in zip(inner[off:off + block_size],
                                           cycle(AVAST_KEY)))
    return b"-chest- " + bytes(enc)


def subsdk_payload(inner: bytes, key: bytes = b"0123456789abcdef") -> bytes:
    """Symantec SubSDK fixture: inverse of the per-chunk decode — each
    8-byte plaintext piece becomes swap(BF_encrypt(swap(piece) + PKCS7(8)))."""
    from kgmwcp.engine.crypto import Blowfish
    from kgmwcp.engine.parsers import _swap_dwords

    if len(inner) % 8:
        raise ValueError("pad inner payload to a multiple of 8 bytes")
    cipher = Blowfish(key)
    body = bytearray()
    for off in range(0, len(inner), 8):
        piece = inner[off:off + 8]
        padded = _swap_dwords(piece) + b"\x08" * 8
        body += _swap_dwords(cipher.encrypt(padded))
    header = b"SubSDKQuarantine" + key  # bytes 16:32 carry the key
    return header + bytes(body)


def elf_payload(variant: int = 0, machine: int = 0x3E,
                with_segment: bool = False) -> bytes:
    """Minimal valid ELF64 little-endian image: null + .text + .shstrtab
    sections, optionally one PT_LOAD program header mapping .text at
    vaddr 0x400000+off (segment address mapping, elffileutils.py:92-128)."""
    import struct

    text = b"\x90" * 16 + f"elf-variant-{variant}".encode()
    shstrtab = b"\x00.text\x00.shstrtab\x00"
    ph_size = 56 if with_segment else 0
    text_off = 64 + ph_size
    str_off = text_off + len(text)
    sh_off = (str_off + len(shstrtab) + 7) & ~7

    ehdr = struct.pack(
        "<4sBBBBB7xHHIQQQIHHHHHH",
        b"\x7fELF", 2, 1, 1, 0, 0,     # 64-bit, little-endian, SYSV
        2 if with_segment else 1, machine, 1,  # ET_EXEC/ET_REL, machine, ver
        0, 64 if with_segment else 0, sh_off, 0,  # entry, phoff, shoff, flags
        64, 56 if with_segment else 0, 1 if with_segment else 0,
        64, 3, 2,                      # shent, shnum, shstrndx
    )
    phdr = b""
    if with_segment:
        phdr = struct.pack("<IIQQQQQQ", 1, 5, text_off,
                           0x400000 + text_off, 0x400000 + text_off,
                           len(text), len(text), 0x1000)

    def shdr(name_off, typ, offset, size):
        return struct.pack("<IIQQQQIIQQ", name_off, typ, 0, 0, offset, size,
                           0, 0, 1, 0)

    blob = bytearray(ehdr)
    blob += phdr
    blob += text
    blob += shstrtab
    blob += b"\x00" * (sh_off - len(blob))
    blob += shdr(0, 0, 0, 0)                               # SHT_NULL
    blob += shdr(1, 1, text_off, len(text))                # .text (PROGBITS)
    blob += shdr(7, 3, str_off, len(shstrtab))             # .shstrtab (STRTAB)
    return bytes(blob)


def macho_payload(variant: int = 0, cputype: int = 0x01000007) -> bytes:
    """Minimal thin 64-bit Mach-O: one LC_SEGMENT_64 (__TEXT) with one
    __text section (engine/macho.py slice + section walk)."""
    import struct

    text = b"\xc3" * 8 + f"macho-variant-{variant}".encode()
    ncmds, sizeofcmds = 1, 72 + 80
    text_off = 32 + sizeofcmds
    header = struct.pack("<IiiIIIII", 0xFEEDFACF, cputype, 3, 2,
                         ncmds, sizeofcmds, 0, 0)
    seg = struct.pack("<II16sQQQQiiII", 0x19, sizeofcmds, b"__TEXT",
                      0x1000, len(text), text_off, len(text), 7, 5, 1, 0)
    sect = struct.pack("<16s16sQQIIIIIIII", b"__text", b"__TEXT",
                       0x1000, len(text), text_off, 0, 0, 0, 0, 0, 0, 0)
    return header + seg + sect + text


def macho_fat_payload(variant: int = 0) -> bytes:
    """Fat Mach-O with an x86_64 and an arm64 slice (big-endian fat header,
    machoutils.obtain_macho / FatBinary.at parity)."""
    import struct

    slices = [macho_payload(variant, cputype=0x01000007),
              macho_payload(variant, cputype=0x0100000C)]
    header_size = 8 + 20 * len(slices)
    out = bytearray(struct.pack(">II", 0xCAFEBABE, len(slices)))
    offsets = []
    pos = (header_size + 7) & ~7
    for blob in slices:
        offsets.append(pos)
        pos += (len(blob) + 7) & ~7
    for blob, off, cpu in zip(slices, offsets, (0x01000007, 0x0100000C)):
        out += struct.pack(">iiIII", cpu, 3, off, len(blob), 3)
    body = bytearray()
    base = (header_size + 7) & ~7
    out += b"\x00" * (base - len(out))
    for blob, off in zip(slices, offsets):
        out += b"\x00" * (off - len(out))
        out += blob
    return bytes(out)


def clustered_embeddings_rows(n_clusters: int = 40, per_cluster: int = 25,
                              dim: int = 64, noise: float = 0.15,
                              seed: int = 20260817):
    """Deterministic planted-near-dup embedding fixture: each cluster is a
    random unit center, members are center + gaussian noise renormalized;
    ``noise`` is the TOTAL expected noise norm (per-coordinate sigma is
    noise/sqrt(dim)), so pairwise cos ~ 1/(1+noise^2) ~ 0.978 at the
    default regardless of dim.  Labels are the cluster ids.  vec_id 0 belongs to cluster 0, so its brute-force top-k
    are its cluster mates — the operating point where IVF (label cells)
    and hyperplane LSH are supposed to work, unlike the driver's
    near-random synthetic vectors (ann_recall_eval documents both).
    Schema matches the driver's embeddings table
    (vec_id long, embedding array<float>, label int)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    vec_id = 0
    for c in range(n_clusters):
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + (noise / np.sqrt(dim)) * rng.normal(size=dim)
            v /= np.linalg.norm(v)
            rows.append((vec_id, [float(x) for x in v.astype(np.float32)], c))
            vec_id += 1
    return rows
