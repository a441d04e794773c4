"""Small crypto primitives — from scratch, no external crypto library.

RC4 here exists to invert quarantine-file obfuscation (a dead, publicly
documented cipher used by AV quarantine formats); it is not offered as a
security primitive.
"""

from __future__ import annotations

__all__ = ["rc4"]


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (KSA + PRGA). Encrypt == decrypt."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = byte ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)
