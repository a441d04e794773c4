"""Small crypto primitives — from scratch, no external crypto library.

RC4 here exists to invert quarantine-file obfuscation (a dead, publicly
documented cipher used by AV quarantine formats); it is not offered as a
security primitive.
"""

from __future__ import annotations

__all__ = ["rc4", "Blowfish", "pkcs7_unpad", "pkcs7_pad"]


def _pi_fraction_words(n_words: int):
    """First ``n_words`` 32-bit words of pi's binary fraction.

    Blowfish's P-array and S-boxes are, by definition, the hexadecimal
    digits of pi — so instead of embedding 4 KiB of table constants we
    compute them with Machin's formula (pi = 16 atan(1/5) - 4 atan(1/239))
    in fixed-point big-int arithmetic.
    """
    bits = n_words * 32 + 64  # guard bits
    one = 1 << bits

    def atan_inv(x: int) -> int:
        total = term = one // x
        x2 = x * x
        k = 1
        while term:
            term //= x2
            total += -term // (2 * k + 1) if k % 2 else term // (2 * k + 1)
            k += 1
        return total

    pi = 16 * atan_inv(5) - 4 * atan_inv(239)
    frac = pi - 3 * one  # fractional part, fixed point
    words = []
    for _ in range(n_words):
        frac <<= 32
        words.append(frac >> bits)
        frac &= one - 1
    return words


_PI_WORDS = None


def _pi_boxes():
    global _PI_WORDS
    if _PI_WORDS is None:
        _PI_WORDS = _pi_fraction_words(18 + 4 * 256)
    p = list(_PI_WORDS[:18])
    s = [list(_PI_WORDS[18 + i * 256:18 + (i + 1) * 256]) for i in range(4)]
    return p, s


class Blowfish:
    """Blowfish ECB — 16-round Feistel with pi-derived boxes.

    Used solely to invert quarantine-container obfuscation
    (Quarantined.py:142-199); not offered as a security primitive.
    """

    BLOCK_SIZE = 8

    def __init__(self, key: bytes):
        if not 4 <= len(key) <= 56:
            raise ValueError("Blowfish key must be 4-56 bytes")
        self.p, self.s = _pi_boxes()
        # key schedule: xor key words into P, then re-encrypt a zero block
        # through P and S
        key_words = []
        for i in range(18):
            word = 0
            for j in range(4):
                word = (word << 8) | key[(i * 4 + j) % len(key)]
            key_words.append(word)
        self.p = [p ^ k for p, k in zip(self.p, key_words)]
        # key schedule hot loop with local bindings + inlined F —
        # 521 block encryptions dominate cipher setup in pure python
        p = self.p
        s0, s1, s2, s3 = self.s
        left = right = 0

        def enc(l, r):
            for i in range(16):
                l ^= p[i]
                h = (s0[l >> 24] + s1[(l >> 16) & 0xFF]) & 0xFFFFFFFF
                r ^= (h ^ s2[(l >> 8) & 0xFF]) + s3[l & 0xFF] & 0xFFFFFFFF
                r &= 0xFFFFFFFF
                l, r = r, l
            return r ^ p[17], l ^ p[16]

        for i in range(0, 18, 2):
            left, right = enc(left, right)
            p[i], p[i + 1] = left, right
        for box in self.s:
            for i in range(0, 256, 2):
                left, right = enc(left, right)
                box[i], box[i + 1] = left, right

    def _f(self, x: int) -> int:
        s = self.s
        h = (s[0][x >> 24] + s[1][(x >> 16) & 0xFF]) & 0xFFFFFFFF
        return ((h ^ s[2][(x >> 8) & 0xFF]) + s[3][x & 0xFF]) & 0xFFFFFFFF

    def _encrypt_block(self, left: int, right: int):
        p = self.p
        for i in range(16):
            left ^= p[i]
            right ^= self._f(left)
            left, right = right, left
        left, right = right, left
        return left ^ p[17], right ^ p[16]

    def _decrypt_block(self, left: int, right: int):
        p = self.p
        for i in range(17, 1, -1):
            left ^= p[i]
            right ^= self._f(left)
            left, right = right, left
        left, right = right, left
        return left ^ p[0], right ^ p[1]

    def _apply(self, data: bytes, block_fn) -> bytes:
        if len(data) % 8:
            raise ValueError("data must be a multiple of 8 bytes")
        out = bytearray()
        for off in range(0, len(data), 8):
            left = int.from_bytes(data[off:off + 4], "big")
            right = int.from_bytes(data[off + 4:off + 8], "big")
            left, right = block_fn(left, right)
            out += left.to_bytes(4, "big") + right.to_bytes(4, "big")
        return bytes(out)

    def encrypt(self, data: bytes) -> bytes:
        return self._apply(data, self._encrypt_block)

    def decrypt(self, data: bytes) -> bytes:
        return self._apply(data, self._decrypt_block)


def pkcs7_pad(data: bytes, block_size: int) -> bytes:
    n = block_size - len(data) % block_size
    return data + bytes([n]) * n


def pkcs7_unpad(data: bytes, block_size: int) -> bytes:
    if not data or len(data) % block_size:
        raise ValueError("invalid padded data length")
    n = data[-1]
    if not 1 <= n <= block_size or data[-n:] != bytes([n]) * n:
        raise ValueError("invalid padding")
    return data[:-n]


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
