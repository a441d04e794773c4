"""Minimal DER (ASN.1) codec — from scratch, no external ASN.1 library.

The decoder is a generic tag/length/value walker producing nested Python
structures; the encoder exists for deterministic fixture generation
(self-signed certificate + PKCS#1 private key test payloads).  Covers
exactly the subset X.509 / PKCS#1 parsing needs.
"""

from __future__ import annotations

from typing import Any, List, Tuple

__all__ = [
    "decode", "Tagged",
    "encode_sequence", "encode_set", "encode_integer", "encode_oid",
    "encode_utc_time", "encode_printable_string", "encode_bit_string",
    "encode_null", "encode_context",
]

# -- decoding -----------------------------------------------------------------


class Tagged:
    """A context-tagged (e.g. [0]) constructed value."""

    __slots__ = ("tag_no", "value")

    def __init__(self, tag_no: int, value: Any):
        self.tag_no = tag_no
        self.value = value

    def __repr__(self) -> str:  # pragma: no cover
        return f"[{self.tag_no}]{self.value!r}"


def _read_tlv(data: bytes, offset: int) -> Tuple[int, int, int, int]:
    """-> (tag, value_offset, value_length, next_offset)"""
    tag = data[offset]
    offset += 1
    first = data[offset]
    offset += 1
    if first < 0x80:
        length = first
    else:
        n = first & 0x7F
        length = int.from_bytes(data[offset:offset + n], "big")
        offset += n
    return tag, offset, length, offset + length


def _decode_value(tag: int, value: bytes) -> Any:
    constructed = bool(tag & 0x20)
    cls = tag & 0xC0
    tag_no = tag & 0x1F
    if cls == 0x80:  # context-specific
        if constructed:
            return Tagged(tag_no, decode_all(value))
        return Tagged(tag_no, value)
    if constructed:  # SEQUENCE (0x10) / SET (0x11)
        return decode_all(value)
    if tag_no == 0x02:  # INTEGER
        return int.from_bytes(value, "big", signed=True)
    if tag_no == 0x03:  # BIT STRING: first byte = unused bits
        return value[1:]
    if tag_no == 0x04:  # OCTET STRING
        return value
    if tag_no == 0x05:  # NULL
        return None
    if tag_no == 0x06:  # OID
        return _decode_oid(value)
    if tag_no in (0x0C, 0x13, 0x16, 0x14):  # UTF8/Printable/IA5/T61 string
        return value.decode("latin1")
    if tag_no in (0x17, 0x18):  # UTCTime / GeneralizedTime
        return value.decode("ascii")
    return value


def _decode_oid(value: bytes) -> str:
    first = value[0]
    parts = [str(first // 40), str(first % 40)]
    acc = 0
    for byte in value[1:]:
        acc = (acc << 7) | (byte & 0x7F)
        if not byte & 0x80:
            parts.append(str(acc))
            acc = 0
    return ".".join(parts)


def decode_all(data: bytes) -> List[Any]:
    """Decode every top-level TLV in ``data``."""
    out: List[Any] = []
    offset = 0
    while offset < len(data):
        tag, voff, vlen, nxt = _read_tlv(data, offset)
        out.append(_decode_value(tag, data[voff:voff + vlen]))
        offset = nxt
    return out


def decode(data: bytes) -> Any:
    """Decode the first TLV in ``data``."""
    return decode_all(data)[0]


# -- encoding (fixture generation) ------------------------------------------


def _tlv(tag: int, value: bytes) -> bytes:
    n = len(value)
    if n < 0x80:
        return bytes([tag, n]) + value
    ln = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([tag, 0x80 | len(ln)]) + ln + value


def encode_integer(value: int) -> bytes:
    """Positive-integer DER encoding (all the fixtures need)."""
    if value < 0:
        raise ValueError("negative integers not supported")
    body = value.to_bytes((value.bit_length() + 7) // 8 or 1, "big")
    if body[0] & 0x80:
        body = b"\x00" + body
    return _tlv(0x02, body)


def encode_oid(dotted: str) -> bytes:
    parts = [int(p) for p in dotted.split(".")]
    body = bytes([parts[0] * 40 + parts[1]])
    for part in parts[2:]:
        chunk = [part & 0x7F]
        part >>= 7
        while part:
            chunk.append((part & 0x7F) | 0x80)
            part >>= 7
        body += bytes(reversed(chunk))
    return _tlv(0x06, body)


def encode_sequence(*members: bytes) -> bytes:
    return _tlv(0x30, b"".join(members))


def encode_set(*members: bytes) -> bytes:
    return _tlv(0x31, b"".join(members))


def encode_utc_time(value: str) -> bytes:
    return _tlv(0x17, value.encode("ascii"))


def encode_printable_string(value: str) -> bytes:
    return _tlv(0x13, value.encode("ascii"))


def encode_bit_string(value: bytes) -> bytes:
    return _tlv(0x03, b"\x00" + value)


def encode_null() -> bytes:
    return _tlv(0x05, b"")


def encode_context(tag_no: int, value: bytes) -> bytes:
    return _tlv(0xA0 | tag_no, value)
