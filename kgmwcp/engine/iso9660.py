"""Minimal ISO9660 reader + writer — from scratch (ECMA-119 subset).

Reader: primary volume descriptor at sector 16, recursive directory-record
walk, file extraction — plus the two alternate-name views real ISOs ship
that the reference walks via pycdlib (ISO.py:59-83):

* **Joliet** — a type-2 supplementary volume descriptor whose escape
  sequences declare UCS-2 (``%/@``, ``%/C``, ``%/E``); its directory tree
  re-lists the files under UTF-16BE long names.
* **Rock Ridge** — SUSP entries in each directory record's system-use
  area; ``NM`` entries carry POSIX names (``SP`` in the root's self
  record signals SUSP presence).

UDF is a separate filesystem (not a name view of the ISO9660 tree); like
pycdlib-less readers generally, we do not parse it — ``has_udf`` reports
False and the primary walk still recovers bridge-format payloads.

Writer emits deterministic single-directory images for fixtures, with
optional Joliet and Rock Ridge name tables.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

__all__ = ["IsoReader", "is_iso", "build_iso"]

SECTOR = 2048
PVD_OFFSETS = (0x8001, 0x8801, 0x9001)
MAGIC = b"CD001"
_JOLIET_ESCAPES = (b"%/@", b"%/C", b"%/E")


def is_iso(data: bytes) -> bool:
    return any(data[o:o + len(MAGIC)] == MAGIC for o in PVD_OFFSETS)


class IsoReader:
    def __init__(self, data: bytes):
        self.data = data
        pvd = None
        svd = None
        # volume descriptor set starts at sector 16; 1 = primary,
        # 2 = supplementary (Joliet when UCS-2 escapes present), 255 = end
        for sector_idx in range(16, 32):
            off = sector_idx * SECTOR
            if data[off + 1:off + 6] != MAGIC:
                break
            if data[off] == 1 and pvd is None:
                pvd = off
            elif data[off] == 2 and svd is None:
                if data[off + 88:off + 91] in _JOLIET_ESCAPES:
                    svd = off
            elif data[off] == 255:  # terminator
                break
        if pvd is None:
            raise ValueError("no primary volume descriptor")
        # root directory record lives at offset 156 of the descriptor
        self.root_extent, self.root_size = self._parse_dir_record(
            data, pvd + 156)[:2]
        self._joliet_root: Optional[Tuple[int, int]] = None
        if svd is not None:
            self._joliet_root = self._parse_dir_record(data, svd + 156)[:2]

    @staticmethod
    def _parse_dir_record(data: bytes, off: int):
        """-> (extent_lba, data_length, flags, identifier, record_length,
        system_use_bytes)"""
        rec_len = data[off]
        if rec_len == 0:
            return None
        (extent,) = struct.unpack_from("<I", data, off + 2)
        (size,) = struct.unpack_from("<I", data, off + 10)
        flags = data[off + 25]
        ident_len = data[off + 32]
        ident = data[off + 33:off + 33 + ident_len]
        # system-use area: after the identifier and its even-length pad
        # byte (present when ident_len is even, ECMA-119 9.1.12)
        su_off = 33 + ident_len + (1 if ident_len % 2 == 0 else 0)
        su = data[off + su_off:off + rec_len]
        return extent, size, flags, ident, rec_len, su

    def _iter_dir(self, extent: int, size: int):
        raw = self.data[extent * SECTOR:extent * SECTOR + size]
        pos = 0
        while pos < len(raw):
            if raw[pos] == 0:
                # records never span sector boundaries; skip padding
                pos = (pos // SECTOR + 1) * SECTOR
                continue
            parsed = self._parse_dir_record(raw, pos)
            if parsed is None:
                break
            yield parsed
            pos += parsed[4]

    # -- extension probes ---------------------------------------------------
    @staticmethod
    def _susp_entries(su: bytes) -> Iterator[Tuple[bytes, bytes]]:
        """(signature, payload) pairs from a system-use area."""
        pos = 0
        while pos + 4 <= len(su):
            sig = su[pos:pos + 2]
            length = su[pos + 2]
            if length < 4 or pos + length > len(su):
                break
            yield sig, su[pos + 4:pos + length]
            pos += length

    @staticmethod
    def _rr_name(su: bytes) -> Optional[str]:
        """Rock Ridge alternate name from NM entries (concatenating the
        CONTINUE-flagged pieces, RRIP 4.1.4)."""
        pieces = []
        for sig, payload in IsoReader._susp_entries(su):
            if sig == b"NM" and payload:
                flags = payload[0]
                pieces.append(payload[1:])
                if not flags & 0x01:  # CONTINUE clear -> name complete
                    break
        if not pieces:
            return None
        return b"".join(pieces).decode("utf-8", errors="replace")

    def has_joliet(self) -> bool:
        return self._joliet_root is not None

    def has_rock_ridge(self) -> bool:
        """SP entry in the root directory's self record (SUSP 5.3)."""
        for extent, size, flags, ident, _, su in self._iter_dir(
                self.root_extent, self.root_size):
            if ident == b"\x00":
                return any(sig == b"SP" for sig, _ in self._susp_entries(su))
        return False

    def has_udf(self) -> bool:
        return False  # UDF descriptors are not parsed (module docstring)

    # -- walks ------------------------------------------------------------
    def walk(self, view: str = "iso") -> Iterator[Tuple[str, str, bytes]]:
        """Yields (dirname, filename, data) depth-first.

        ``view``: "iso" (primary 8.3 identifiers), "joliet" (UTF-16BE long
        names from the supplementary tree), or "rr" (primary tree with
        Rock Ridge NM names).
        """
        if view == "joliet":
            if self._joliet_root is None:
                return
            start = self._joliet_root
        elif view in ("iso", "rr"):
            start = (self.root_extent, self.root_size)
        else:
            raise ValueError(f"unknown view: {view}")
        stack: List[Tuple[str, int, int]] = [("/", *start)]
        while stack:
            dirname, extent, size = stack.pop()
            for f_extent, f_size, flags, ident, _, su in self._iter_dir(extent, size):
                if ident in (b"\x00", b"\x01"):  # self / parent
                    continue
                if view == "joliet":
                    name = ident.decode("utf-16-be", errors="replace")
                else:
                    name = ident.decode("latin1")
                if view == "rr":
                    rr = self._rr_name(su)
                    if rr is not None:
                        name = rr
                if flags & 0x02:  # directory
                    sub = dirname.rstrip("/") + "/" + name
                    stack.append((sub, f_extent, f_size))
                else:
                    # strip ";1" version suffix of ISO9660/Joliet identifiers
                    name = name.split(";")[0]
                    payload = self.data[f_extent * SECTOR:f_extent * SECTOR + f_size]
                    yield dirname, name, payload


# -- writer (fixtures) -----------------------------------------------------------

def build_iso(files: Dict[str, bytes], volume_id: str = "KGMWCP",
              joliet: Optional[Dict[str, str]] = None,
              rock_ridge: Optional[Dict[str, str]] = None) -> bytes:
    """Single-root-directory ISO9660 image with the given name->bytes files.

    ``joliet``: short-name -> long-name table; emits a type-2 SVD whose
    UTF-16BE directory tree points at the same extents.
    ``rock_ridge``: short-name -> POSIX-name table; emits SUSP SP on the
    root self record and NM entries on each mapped file record.
    """
    def pad_sector(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % SECTOR)

    def dir_record(ident: bytes, extent: int, size: int, flags: int,
                   su: bytes = b"") -> bytes:
        su_off = 33 + len(ident) + (1 if len(ident) % 2 == 0 else 0)
        rec_len = su_off + len(su)
        rec_len += rec_len % 2
        rec = bytearray(rec_len)
        rec[0] = rec_len
        struct.pack_into("<I", rec, 2, extent)
        struct.pack_into(">I", rec, 6, extent)
        struct.pack_into("<I", rec, 10, size)
        struct.pack_into(">I", rec, 14, size)
        # recording date (7 bytes, fixed deterministic 2020-01-01)
        rec[18:25] = bytes([120, 1, 1, 0, 0, 0, 0])
        rec[25] = flags
        rec[28] = 1  # volume sequence number (LE)
        rec[31] = 1  # (BE half)
        rec[32] = len(ident)
        rec[33:33 + len(ident)] = ident
        rec[su_off:su_off + len(su)] = su
        return bytes(rec)

    def nm_entry(posix_name: str) -> bytes:
        name = posix_name.encode("utf-8")
        return b"NM" + bytes([5 + len(name), 1, 0]) + name

    # SUSP indicator on the root self record (SP entry, check bytes BE/EF)
    sp_entry = b"SP" + bytes([7, 1, 0xBE, 0xEF, 0])

    # layout: 16 system sectors | PVD | [SVD] | terminator | primary root
    # dir | [joliet root dir] | file extents
    n_desc = 2 + (1 if joliet else 0)
    root_extent = 16 + n_desc
    joliet_extent = root_extent + 1 if joliet else None
    file_extent = root_extent + 1 + (1 if joliet else 0)
    placements = {}
    for name, payload in files.items():
        n_sectors = max(1, (len(payload) + SECTOR - 1) // SECTOR)
        placements[name] = file_extent
        file_extent += n_sectors

    root_entries = [
        dir_record(b"\x00", root_extent, SECTOR, 0x02,
                   su=sp_entry if rock_ridge else b""),
        dir_record(b"\x01", root_extent, SECTOR, 0x02),
    ]
    for name, payload in files.items():
        ident = (name.upper() + ";1").encode("ascii")
        su = nm_entry(rock_ridge[name]) if rock_ridge and name in rock_ridge else b""
        root_entries.append(dir_record(ident, placements[name], len(payload), 0, su=su))
    root_raw = b"".join(root_entries)
    if len(root_raw) > SECTOR:
        raise ValueError("fixture writer supports one root sector of entries")
    root_raw = pad_sector(root_raw)

    def volume_descriptor(vd_type: int, root_rec: bytes,
                          escapes: bytes = b"") -> bytes:
        vd = bytearray(SECTOR)
        vd[0] = vd_type
        vd[1:6] = MAGIC
        vd[6] = 1
        vd[40:40 + len(volume_id)] = volume_id.encode("ascii")
        struct.pack_into("<I", vd, 80, file_extent)
        struct.pack_into(">I", vd, 84, file_extent)
        vd[88:88 + len(escapes)] = escapes
        vd[120] = 1; vd[123] = 1       # volume set size
        vd[124] = 1; vd[127] = 1       # volume sequence number
        struct.pack_into("<H", vd, 128, SECTOR)
        struct.pack_into(">H", vd, 130, SECTOR)
        vd[156:156 + len(root_rec)] = root_rec
        return bytes(vd)

    pvd = volume_descriptor(1, dir_record(b"\x00", root_extent, SECTOR, 0x02))

    joliet_raw = b""
    svd = b""
    if joliet:
        joliet_entries = [
            dir_record(b"\x00", joliet_extent, SECTOR, 0x02),
            dir_record(b"\x01", joliet_extent, SECTOR, 0x02),
        ]
        for name, payload in files.items():
            long_name = joliet.get(name, name)
            ident = (long_name + ";1").encode("utf-16-be")
            joliet_entries.append(
                dir_record(ident, placements[name], len(payload), 0))
        joliet_raw = b"".join(joliet_entries)
        if len(joliet_raw) > SECTOR:
            raise ValueError("fixture writer supports one joliet sector")
        joliet_raw = pad_sector(joliet_raw)
        svd = volume_descriptor(
            2, dir_record(b"\x00", joliet_extent, SECTOR, 0x02),
            escapes=b"%/E")

    terminator = bytearray(SECTOR)
    terminator[0] = 255
    terminator[1:6] = MAGIC

    image = (b"\x00" * (16 * SECTOR) + pvd + svd + bytes(terminator)
             + root_raw + joliet_raw)
    for name, payload in files.items():
        image += pad_sector(payload)
    return image
