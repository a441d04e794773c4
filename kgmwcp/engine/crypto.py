"""Small crypto primitives — from scratch; semantics defined by the
pure-python code.  The system libcrypto is used only as a load-verified
accelerator for Blowfish (see ``_load_openssl_bf``).

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


def _load_openssl_bf():
    """Optional ctypes binding to the system libcrypto's legacy Blowfish
    (``BF_set_key`` / ``BF_ecb_encrypt`` — deprecated but still exported
    by OpenSSL 3).  The pure-python implementation below DEFINES the
    semantics; this is only an accelerator: SymantecSubSDK.identify now
    trial-decrypts every candidate root (bug-for-bug with
    Quarantined.py:146-166) and the pure-python key schedule costs
    ~3.8 ms/file, which would dominate extract throughput.  The binding
    is cross-verified against the pure implementation on a fixed vector
    at load; any missing symbol, load error, or mismatch disables it.
    """
    try:
        import ctypes
        import ctypes.util

        name = ctypes.util.find_library("crypto")
        if not name:
            return None
        lib = ctypes.CDLL(name)

        class _BFKey(ctypes.Structure):
            _fields_ = [("P", ctypes.c_uint32 * 18),
                        ("S", ctypes.c_uint32 * 1024)]

        set_key = lib.BF_set_key
        set_key.argtypes = [ctypes.POINTER(_BFKey), ctypes.c_int,
                            ctypes.c_char_p]
        set_key.restype = None
        ecb = lib.BF_ecb_encrypt
        ecb.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                        ctypes.POINTER(_BFKey), ctypes.c_int]
        ecb.restype = None

        def schedule(key: bytes):
            k = _BFKey()
            set_key(ctypes.byref(k), len(key), key)
            return k

        def apply_blocks(k, data: bytes, enc: int) -> bytes:
            out = bytearray()
            buf = ctypes.create_string_buffer(8)
            for off in range(0, len(data), 8):
                ecb(data[off:off + 8], buf, ctypes.byref(k), enc)
                out += buf.raw
            return bytes(out)

        # load-time verification against the from-scratch implementation
        vkey, vdata = b"verify-vector-key", bytes(range(16))
        pure = Blowfish(vkey, _pure=True)
        k = schedule(vkey)
        if (apply_blocks(k, vdata, 1) != pure.encrypt(vdata)
                or apply_blocks(k, vdata, 0) != pure.decrypt(vdata)):
            return None
        return schedule, apply_blocks
    except Exception:
        return None


_OPENSSL_BF = None  # resolved lazily on first Blowfish() construction
_OPENSSL_BF_PROBED = False


class Blowfish:
    """Blowfish ECB — 16-round Feistel with pi-derived boxes.

    Used solely to invert quarantine-container obfuscation
    (Quarantined.py:142-199); not offered as a security primitive.
    A verified libcrypto fast path (``_load_openssl_bf``) is used when
    available; pass ``_pure=True`` to force the from-scratch path.
    """

    BLOCK_SIZE = 8

    def __init__(self, key: bytes, _pure: bool = False):
        global _OPENSSL_BF, _OPENSSL_BF_PROBED
        if not 4 <= len(key) <= 56:
            raise ValueError("Blowfish key must be 4-56 bytes")
        self._ossl = None
        if not _pure:
            if not _OPENSSL_BF_PROBED:
                _OPENSSL_BF = _load_openssl_bf()
                _OPENSSL_BF_PROBED = True
            if _OPENSSL_BF is not None:
                schedule, apply_blocks = _OPENSSL_BF
                self._ossl = (schedule(key), apply_blocks)
                return
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
        if len(data) % 8:
            raise ValueError("data must be a multiple of 8 bytes")
        if self._ossl is not None:
            k, apply_blocks = self._ossl
            return apply_blocks(k, data, 1)
        return self._apply(data, self._encrypt_block)

    def decrypt(self, data: bytes) -> bytes:
        if len(data) % 8:
            raise ValueError("data must be a multiple of 8 bytes")
        if self._ossl is not None:
            k, apply_blocks = self._ossl
            return apply_blocks(k, data, 0)
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
