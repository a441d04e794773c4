"""Pure-python BMP/WAV builders and header parsers (public formats).

The multimodal decode path (`ops/multimodal.py::decode_real`) needs a
codec with zero external dependencies; BMP (BITMAPINFOHEADER) and WAV
(RIFF/WAVE PCM) are fully specified public formats whose metadata lives
in fixed-layout headers.  Builders synthesize real, spec-conformant
files (used as deterministic fixtures); parsers read ONLY the bytes —
they share no state with the builders, so round-trip tests prove a
genuine decode, not an echo.

Reference parity note: the reference treats residual media files as
opaque payloads (no codec layer); this module is part of the
LLM-data-pipeline surface the rebuild adds on top (SURVEY.md §6).
"""

from __future__ import annotations

import struct
from typing import Optional

__all__ = ["make_bmp", "make_wav", "parse_bmp", "parse_wav",
           "resize_bmp_nearest", "wav_features"]

_BMP_HEADER_SIZE = 54          # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
_WAV_HEADER_SIZE = 44          # RIFF + fmt(16) + data chunk header


def _bmp_row_stride(width: int, channels: int) -> int:
    # BMP pixel rows pad to 4-byte boundaries
    return (width * channels + 3) // 4 * 4


def make_bmp(width: int, height: int, channels: int, seed: int = 0) -> bytes:
    """Spec-conformant uncompressed BMP (24- or 32-bit, BI_RGB)."""
    if channels not in (3, 4):
        raise ValueError("only 24/32-bit BMPs (no palette) are synthesized")
    stride = _bmp_row_stride(width, channels)
    pixel_bytes = stride * height
    file_size = _BMP_HEADER_SIZE + pixel_bytes
    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, _BMP_HEADER_SIZE
    ) + struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, channels * 8, 0, pixel_bytes, 2835, 2835, 0, 0,
    )
    pixels = bytes((seed + i) % 256 for i in range(pixel_bytes))
    return header + pixels


def make_wav(n_channels: int, sample_rate: int, n_samples: int,
             seed: int = 0) -> bytes:
    """Spec-conformant 16-bit PCM RIFF/WAVE file."""
    data_size = n_samples * n_channels * 2
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    header = (
        struct.pack("<4sI4s", b"RIFF", 36 + data_size, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, n_channels,
                      sample_rate, byte_rate, block_align, 16)
        + struct.pack("<4sI", b"data", data_size)
    )
    data = bytes((seed + i) % 256 for i in range(data_size))
    return header + data


def parse_bmp(payload: bytes) -> Optional[dict]:
    """(width, height, channels, n_bytes) from BITMAPINFOHEADER fields —
    reads only the 54-byte header; negative height (top-down rows) is
    reported as its magnitude per the spec."""
    if len(payload) < _BMP_HEADER_SIZE or payload[:2] != b"BM":
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    return {
        "width": width,
        "height": abs(height),
        "channels": bpp // 8,
        "n_bytes": len(payload),
    }


def _walk_riff(payload: bytes):
    """One RIFF chunk walk shared by parse_wav and wav_features:
    (channels, sample_rate, bits, data_off, data_size) or None when the
    container/fmt/data chunks are missing or carry degenerate zeros
    (chunk order is not fixed by the spec; chunks pad to even offsets)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    channels = sample_rate = bits = None
    data_off = data_size = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt " and pos + 8 + 16 <= len(payload):
            _fmt, channels, sample_rate = struct.unpack_from("<HHI", payload, pos + 8)
            bits = struct.unpack_from("<H", payload, pos + 8 + 14)[0]
        elif cid == b"data":
            data_off, data_size = pos + 8, size
        pos += 8 + size + (size & 1)
    if channels is None or data_size is None:
        return None
    # corrupt fmt chunks can carry zeros — reject instead of dividing
    if not channels or not sample_rate or bits not in (8, 16, 24, 32):
        return None
    return channels, sample_rate, bits, data_off, data_size


def parse_wav(payload: bytes) -> Optional[dict]:
    """(channels, sample_rate, duration_ms, n_bytes) from the RIFF walk."""
    walked = _walk_riff(payload)
    if walked is None:
        return None
    channels, sample_rate, bits, _data_off, data_size = walked
    n_samples = data_size // (channels * (bits // 8))
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "duration_ms": n_samples * 1000 // sample_rate,
        "n_bytes": len(payload),
    }


def resize_bmp_nearest(payload: bytes, out_width: int = None,
                       out_height: int = None) -> Optional[dict]:
    """Real nearest-neighbor downscale over the decoded pixel array
    (default: half size, rounding up).  Reads the actual pixel bytes —
    stride padding included, sampling in STORED row order (BMP stores
    rows bottom-up; the resized array keeps that order, so this is a
    true resize of the stored image) — and returns the sampled-pixel
    byte checksum so a verifier can prove the bytes were really read,
    not echoed from header fields.  Bounds-guarded like every other
    untrusted-format reader here: a truncated pixel array returns None
    instead of raising."""
    info = parse_bmp(payload)
    if info is None:
        return None
    width, height, channels = info["width"], info["height"], info["channels"]
    if width <= 0 or height <= 0 or channels not in (3, 4):
        return None
    stride = _bmp_row_stride(width, channels)
    pixels = payload[_BMP_HEADER_SIZE:]
    if len(pixels) < stride * height:
        return None
    out_w = out_width if out_width is not None else (width + 1) // 2
    out_h = out_height if out_height is not None else (height + 1) // 2
    if out_w <= 0 or out_h <= 0:
        # an explicit 0/negative target is invalid, not "use the default"
        return None
    total = 0
    for oy in range(out_h):
        base_row = (oy * height // out_h) * stride
        for ox in range(out_w):
            base = base_row + (ox * width // out_w) * channels
            for c in range(channels):
                total += pixels[base + c]
    return {"width": out_w, "height": out_h, "channels": channels,
            "checksum": total}


def bmp_patchify(payload: bytes, patch: int = 8) -> Optional[list]:
    """ViT-style patch extraction over the decoded pixel array: the
    image is cut into non-overlapping ``patch``×``patch`` tiles (FULL
    tiles only — ragged right/bottom margins are dropped, the standard
    crop-to-multiple prep), each tile summarized by its pixel-byte sum
    in STORED row order (stride padding respected, like
    resize_bmp_nearest).  Returns ``[(patch_row, patch_col, checksum)]``
    — empty when the image is smaller than one patch.  Bounds-guarded
    like every other untrusted-format reader here: a truncated pixel
    array returns None instead of raising."""
    info = parse_bmp(payload)
    if info is None:
        return None
    width, height, channels = info["width"], info["height"], info["channels"]
    if width <= 0 or height <= 0 or channels not in (3, 4) or patch <= 0:
        return None
    stride = _bmp_row_stride(width, channels)
    pixels = payload[_BMP_HEADER_SIZE:]
    if len(pixels) < stride * height:
        return None
    out = []
    for py in range(height // patch):
        for px in range(width // patch):
            total = 0
            for dy in range(patch):
                base = (py * patch + dy) * stride + px * patch * channels
                total += sum(pixels[base: base + patch * channels])
            out.append((py, px, total))
    return out


def wav_features(payload: bytes) -> Optional[dict]:
    """Real feature extraction from decoded 16-bit PCM samples: frame
    count, sum of absolute amplitudes, peak amplitude — all integer
    arithmetic, so a declarative twin can match bit-for-bit."""
    walked = _walk_riff(payload)
    if walked is None:
        return None
    channels, _sample_rate, bits, data_off, data_size = walked
    if bits != 16:  # only 16-bit PCM features are implemented
        return None
    if data_off is None or data_off + data_size > len(payload):
        return None
    n_words = data_size // 2
    samples = struct.unpack_from(f"<{n_words}h", payload, data_off)
    sum_abs = sum(abs(s) for s in samples)
    peak = max((abs(s) for s in samples), default=0)
    return {
        "n_frames": n_words // channels,
        "channels": channels,
        "sum_abs": sum_abs,
        "peak": peak,
    }
