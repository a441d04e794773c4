"""Microsoft CryptoAPI RSA key BLOBs and .NET ``RSA.FromXmlString`` forms.

Layouts from the public CryptoAPI PUBLICKEYBLOB / PRIVATEKEYBLOB
documentation (reference restatement: mwcp/utils/construct/
windows_structures.py:253-290, mwcp/metadata.py:2377-2440,2293-2317).
All multi-byte blob integers are little-endian; XML field payloads are
base64 big-endian.
"""

from __future__ import annotations

import base64
import binascii
import struct
from xml.etree import ElementTree

__all__ = [
    "parse_private_blob", "parse_public_blob", "parse_rsa_xml",
    "PRIVATE_SIG", "PUBLIC_SIG",
]

CALG_RSA_KEYX = 0x0000A400

# algid (LE) + magic — the two fields the format actually validates;
# scanning for this 8-byte anchor places the blob start 4 bytes earlier
# (type/version/reserved precede the algid).
PRIVATE_SIG = b"\x00\xa4\x00\x00RSA2"   # 0x0000A400 little-endian + magic
PUBLIC_SIG = b"\x00\xa4\x00\x00RSA1"


def _parse_header(data: bytes, magic: bytes) -> tuple[int, int, int]:
    """-> (bitlen, pubexponent, body_offset); raises ValueError."""
    if len(data) < 20:
        raise ValueError("key blob too short")
    algid = struct.unpack_from("<I", data, 4)[0]
    if algid != CALG_RSA_KEYX:
        raise ValueError("algid is not CALG_RSA_KEYX")
    if data[8:12] != magic:
        raise ValueError(f"bad magic {data[8:12]!r}")
    bitlen, pubexp = struct.unpack_from("<II", data, 12)
    if bitlen % 8:
        raise ValueError("bitlen not a multiple of 8")
    return bitlen, pubexp, 20


def parse_private_blob(data: bytes) -> dict:
    """PRIVATEKEYBLOB -> RSAPrivateKey field dict (all CRT components)."""
    bitlen, pubexp, off = _parse_header(data, b"RSA2")
    full, half = bitlen // 8, bitlen // 16
    if len(data) < off + 2 * full + 5 * half:
        raise ValueError("truncated PRIVATEKEYBLOB")

    def take(n: int) -> int:
        nonlocal off
        value = int.from_bytes(data[off:off + n], "little")
        off += n
        return value

    modulus = take(full)
    p, q = take(half), take(half)
    d_mod_p1, d_mod_q1, q_inv_mod_p = take(half), take(half), take(half)
    d = take(full)
    return {
        "public_exponent": pubexp, "modulus": modulus,
        "private_exponent": d, "p": p, "q": q,
        "d_mod_p1": d_mod_p1, "d_mod_q1": d_mod_q1,
        "q_inv_mod_p": q_inv_mod_p,
    }


def parse_public_blob(data: bytes) -> dict:
    """PUBLICKEYBLOB -> RSAPublicKey field dict."""
    bitlen, pubexp, off = _parse_header(data, b"RSA1")
    full = bitlen // 8
    if len(data) < off + full:
        raise ValueError("truncated PUBLICKEYBLOB")
    modulus = int.from_bytes(data[off:off + full], "little")
    return {"public_exponent": pubexp, "modulus": modulus}


# .NET tag -> RSAPrivateKey field (mwcp/metadata.py:2413-2427)
_XML_FIELD_MAP = {
    "Exponent": "public_exponent",
    "Modulus": "modulus",
    "D": "private_exponent",
    "P": "p",
    "Q": "q",
    "DP": "d_mod_p1",
    "DQ": "d_mod_q1",
    "InverseQ": "q_inv_mod_p",
}
_PRIVATE_TAGS = ("D", "P", "Q", "DP", "DQ", "InverseQ")


def parse_rsa_xml(text: str) -> tuple[dict, bool]:
    """.NET RSAKeyValue XML -> (field dict, is_private).

    ``is_private`` mirrors the reference's ``fallback`` probe: False when
    none of the private components are present (public key only).
    """
    try:
        root = ElementTree.fromstring(text)
    except ElementTree.ParseError as exc:
        raise ValueError(f"failed to parse XML data: {exc}")
    if root.tag != "RSAKeyValue":
        raise ValueError(f"expected RSAKeyValue root, got {root.tag!r}")
    raw = {}
    for child in root:
        try:
            raw[child.tag] = int.from_bytes(
                base64.b64decode(child.text or ""), byteorder="big")
        except binascii.Error:
            continue  # reference logs-and-skips undecodable fields
    if not raw:
        raise ValueError("no RSA key data parsed from XML")
    is_private = any(tag in raw for tag in _PRIVATE_TAGS)
    fields = {
        _XML_FIELD_MAP[tag]: value
        for tag, value in raw.items() if tag in _XML_FIELD_MAP
    }
    return fields, is_private
