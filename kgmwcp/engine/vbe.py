"""Microsoft Script Encoder (VBE) codec — from-scratch implementation.

The decoding permutation tables are public constants of the VBE format
(documented by many independent decoders); behavior matches the reference
decoder at mwcp/parsers/VisualBasic.py:82-127.  The *encoder* here has no
reference analogue — it exists so the fixture generator can synthesize
deterministic encoded payloads whose decode is known.
"""

from __future__ import annotations

from typing import Dict, List

__all__ = ["decode_vbe_stream", "encode_vbe_stream", "wrap_vbe", "START_TAG", "END_TAG"]

START_TAG = b"#@~^"
END_TAG = b"==^#~@"

# Per-position choice of which of the 3 substitution alphabets applies
# (public constant of the format; cycle length 64).
_PICK = "1231232332321323132311233213233211323231311231321323112331123132"

# The 3-way substitution table for code points 0x20-0x7F.  Entry i is the
# 3-character string of possible decodings for encoded char (0x20 + i).
# Public constant of the VBE format.
_TABLE_32_127 = [
    '.-2', 'Gu0', 'zR!', 'V`)', 'Bq[', 'j^8', '/I3', '&\\=', 'IbX', 'A}:',
    '4)5', '26e', '[ 9', 'v|\\', 'rzV', 'C\x7fs', '8kf', '9cN', 'p3E',
    'E+k', 'hhb', 'qQY', 'Ofx', '\tv^', 'b1}', 'DdJ', '#Tm', 'uCq', '<<<',
    '~:`', '>>>', '^~S', '@@@', 'wEB', "J,'", 'a*H', ']tr', '"\'u', 'K71',
    'oD7', 'NyM', ';YR', 'L/"', 'PoT', 'g&j', '*rG', '}jd', 't9-', 'T{ ',
    '+?\x7f', '-8.', ',wL', '0g]', 'nS~', 'kGl', 'f4o', '5xy', '%]t',
    '!0C', 'd#&', 'MZv', 'R[%', 'cl$', '?H+', '{U(', 'xp#', ')iA', '(.4',
    'sL\t', 'Y!*', '3$D', '\x7fN?', 'mPw', 'U\t;', 'SVU', '|si', ':5a',
    '_ac', 'eKP', 'FXg', 'X;Q', '1WI', 'i"O', 'lmF', 'ZMh', 'H%|', "'(6",
    '\\Fp', '=Jn', '$2z', 'yA/', '7=_', '`_K', 'QOZ', ' B,', '6eW',
]


def _alphabets() -> List[str]:
    table = [chr(i) * 3 for i in range(128)]
    table[32:128] = _TABLE_32_127
    table[9] = 'Wn{'
    return table


_ALPHABETS = _alphabets()

# Inverse maps: for alphabet index k (0..2), plaintext char -> encoded char.
# Built lazily; later (higher codepoint) encodings win ties, then we prefer
# non-special encoded chars so the escape pass stays simple.
_SPECIALS = {'@', '<', '>', '\n', '\r'}


def _build_inverse() -> List[Dict[str, str]]:
    inv: List[Dict[str, str]] = [{}, {}, {}]
    for enc_cp, triple in enumerate(_ALPHABETS):
        enc_ch = chr(enc_cp)
        for k in range(3):
            plain = triple[k]
            cur = inv[k].get(plain)
            if cur is None or (cur in _SPECIALS and enc_ch not in _SPECIALS):
                inv[k][plain] = enc_ch
    return inv


_INVERSE = _build_inverse()

# Escape pairs applied to the raw encoded stream before table decode
# (and inversely after table encode).
_UNESCAPE = {'@&': '\x0a', '@#': '\x0d', '@*': '>', '@!': '<', '@$': '@'}
_ESCAPE = {v: k for k, v in _UNESCAPE.items()}


def decode_vbe_stream(enc_code: str) -> str:
    """Decode the inner VBE stream (between the checksum fields)."""
    for pair, char in _UNESCAPE.items():
        enc_code = enc_code.replace(pair, char)
    out = []
    for i, ch in enumerate(enc_code):
        cp = ord(ch)
        if cp < 128:
            out.append(_ALPHABETS[cp][int(_PICK[i % 64]) - 1])
        else:
            out.append(ch)
    return "".join(out)


def encode_vbe_stream(plain: str) -> str:
    """Inverse of :func:`decode_vbe_stream` (fixture generation only)."""
    out = []
    for i, ch in enumerate(plain):
        if ord(ch) >= 128:
            out.append(ch)
            continue
        k = int(_PICK[i % 64]) - 1
        enc_ch = _INVERSE[k].get(ch)
        if enc_ch is None:
            raise ValueError(f"Unencodable character {ch!r}")
        out.append(_ESCAPE.get(enc_ch, enc_ch))
    return "".join(out)


def wrap_vbe(plain: str, prefix: bytes = b"") -> bytes:
    """Produce a full VBE file body around the encoded stream.

    Layout consumed by the reference decoder (VisualBasic.py:102-107):
    ``START_TAG + 8 filler bytes + stream + 6 filler bytes + END_TAG``.
    """
    stream = encode_vbe_stream(plain).encode("utf-8")
    return prefix + START_TAG + b"AAAAAAAA" + stream + b"AAAAAA" + END_TAG
