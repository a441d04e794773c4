"""Custom-alphabet baseXX codec (SURVEY.md T13).

From-scratch re-expression of the reference's custombase64 utility
(mwcp/utils/custombase64.py): translate-table remap between a custom
alphabet and the standard one, with missing-pad repair on decode.
Behavioral parity is pinned by tests using the reference's own doctest
vectors (public examples in its docstrings).
"""

from __future__ import annotations

import base64 as _b64
from typing import Optional, Union

__all__ = ["encode", "decode"]

_STD = {
    16: b"0123456789ABCDEF",
    32: b"ABCDEFGHIJKLMNOPQRSTUVWXYZ234567=",
    64: b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/=",
}
_CODERS = {
    16: (_b64.b16encode, _b64.b16decode),
    32: (_b64.b32encode, _b64.b32decode),
    64: (_b64.b64encode, _b64.b64decode),
}
_PAD_BLOCK = {32: 8, 64: 4}

Buf = Union[bytes, str]


def _as_bytes(value: Buf) -> bytes:
    return value.encode() if isinstance(value, str) else value


def _check_alphabet(alphabet: bytes, base: int) -> None:
    if len(alphabet) not in (base, base + 1):
        raise ValueError("invalid alphabet provided")
    if len(alphabet) != len(set(alphabet)):
        raise ValueError("mapping must be unique")


def _repair_pad(alphabet: bytes, data: bytes, base: int, decoding: bool) -> bytes:
    """When the custom alphabet omits its pad char, infer it (decode side:
    the one data byte outside the alphabet) or default to '=' (encode side).
    Mirrors mwcp/utils/custombase64.py:36-55."""
    if not (len(data) * 8) % 6:
        return alphabet
    if decoding:
        for char in data:
            if char not in alphabet:
                return alphabet + bytes([char])
        raise ValueError("please provide a padding character to the custom alphabet")
    if b"=" not in alphabet:
        return alphabet + b"="
    raise ValueError("please provide a padding character to the custom alphabet")


def encode(data: Buf, base: int = 64, alphabet: Optional[Buf] = None) -> bytes:
    """Encode with a custom alphabet; returns bytes."""
    alphabet = _as_bytes(alphabet) if alphabet else _STD[base]
    data = _as_bytes(data)
    _check_alphabet(alphabet, base)
    if base != 16 and len(alphabet) == base:
        _repair_pad(alphabet, data, base, decoding=False)
    encoded = _CODERS[base][0](data)
    return encoded.translate(bytes.maketrans(_STD[base][:len(alphabet)], alphabet))


def decode(data: Buf, base: int = 64, alphabet: Optional[Buf] = None) -> bytes:
    """Decode with a custom alphabet (repairs missing padding); returns bytes."""
    alphabet = _as_bytes(alphabet) if alphabet else _STD[base]
    data = _as_bytes(data)
    if base in _PAD_BLOCK:
        # pad with the alphabet's final (pad) char to the block size
        data += alphabet[len(alphabet) - 1:] * ((-len(data)) % _PAD_BLOCK[base])
    _check_alphabet(alphabet, base)
    if base != 16 and len(alphabet) == base:
        alphabet = _repair_pad(alphabet, data, base, decoding=True)
    table = bytes.maketrans(alphabet, _STD[base][:len(alphabet)])
    return _CODERS[base][1](data.translate(table))
