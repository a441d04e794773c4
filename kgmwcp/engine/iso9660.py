"""Minimal ISO9660 reader + writer — from scratch (ECMA-119 subset).

Reader: primary volume descriptor at sector 16, recursive directory-record
walk, file extraction.  Plain ISO9660 level; the reference additionally
walks UDF/Joliet/RockRidge views via pycdlib (ISO.py:59-83) — those views
re-list the same files under alternate names, so the primary walk recovers
the payloads.  Writer emits deterministic single-directory images for
fixtures.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Tuple

__all__ = ["IsoReader", "is_iso", "build_iso"]

SECTOR = 2048
PVD_OFFSETS = (0x8001, 0x8801, 0x9001)
MAGIC = b"CD001"


def is_iso(data: bytes) -> bool:
    return any(data[o:o + len(MAGIC)] == MAGIC for o in PVD_OFFSETS)


class IsoReader:
    def __init__(self, data: bytes):
        self.data = data
        pvd = None
        # volume descriptor set starts at sector 16; type 1 = primary
        for sector_idx in range(16, 32):
            off = sector_idx * SECTOR
            if data[off + 1:off + 6] != MAGIC:
                break
            if data[off] == 1:
                pvd = off
                break
            if data[off] == 255:  # terminator
                break
        if pvd is None:
            raise ValueError("no primary volume descriptor")
        # root directory record lives at offset 156 of the PVD
        self.root_extent, self.root_size = self._parse_dir_record(
            data, pvd + 156)[:2]

    @staticmethod
    def _parse_dir_record(data: bytes, off: int):
        """-> (extent_lba, data_length, flags, identifier, record_length)"""
        rec_len = data[off]
        if rec_len == 0:
            return None
        (extent,) = struct.unpack_from("<I", data, off + 2)
        (size,) = struct.unpack_from("<I", data, off + 10)
        flags = data[off + 25]
        ident_len = data[off + 32]
        ident = data[off + 33:off + 33 + ident_len]
        return extent, size, flags, ident, rec_len

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

    def walk(self) -> Iterator[Tuple[str, str, bytes]]:
        """Yields (dirname, filename, data) for every file, depth-first."""
        stack: List[Tuple[str, int, int]] = [("/", self.root_extent, self.root_size)]
        while stack:
            dirname, extent, size = stack.pop()
            for f_extent, f_size, flags, ident, _ in self._iter_dir(extent, size):
                if ident in (b"\x00", b"\x01"):  # self / parent
                    continue
                name = ident.decode("latin1")
                if flags & 0x02:  # directory
                    sub = dirname.rstrip("/") + "/" + name
                    stack.append((sub, f_extent, f_size))
                else:
                    # strip ";1" version suffix of ISO9660 identifiers
                    name = name.split(";")[0]
                    payload = self.data[f_extent * SECTOR:f_extent * SECTOR + f_size]
                    yield dirname, name, payload


# -- writer (fixtures) -----------------------------------------------------------

def build_iso(files: Dict[str, bytes], volume_id: str = "KGMWCP") -> bytes:
    """Single-root-directory ISO9660 image with the given name->bytes files."""
    def pad_sector(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % SECTOR)

    def dir_record(ident: bytes, extent: int, size: int, flags: int) -> bytes:
        base = 33 + len(ident)
        rec_len = base + (base % 2)  # even-length records
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
        return bytes(rec)

    # layout: 16 system sectors | PVD | terminator | root dir | file extents
    root_extent = 18
    file_extent = 19
    placements = {}
    for name, payload in files.items():
        n_sectors = max(1, (len(payload) + SECTOR - 1) // SECTOR)
        placements[name] = file_extent
        file_extent += n_sectors

    root_entries = [
        dir_record(b"\x00", root_extent, SECTOR, 0x02),
        dir_record(b"\x01", root_extent, SECTOR, 0x02),
    ]
    for name, payload in files.items():
        ident = (name.upper() + ";1").encode("ascii")
        root_entries.append(dir_record(ident, placements[name], len(payload), 0))
    root_raw = b"".join(root_entries)
    if len(root_raw) > SECTOR:
        raise ValueError("fixture writer supports one root sector of entries")
    root_raw = pad_sector(root_raw)

    pvd = bytearray(SECTOR)
    pvd[0] = 1
    pvd[1:6] = MAGIC
    pvd[6] = 1
    pvd[40:40 + len(volume_id)] = volume_id.encode("ascii")
    total_sectors = file_extent
    struct.pack_into("<I", pvd, 80, total_sectors)
    struct.pack_into(">I", pvd, 84, total_sectors)
    pvd[120] = 1; pvd[123] = 1       # volume set size
    pvd[124] = 1; pvd[127] = 1       # volume sequence number
    struct.pack_into("<H", pvd, 128, SECTOR)
    struct.pack_into(">H", pvd, 130, SECTOR)
    pvd[156:156 + 34] = dir_record(b"\x00", root_extent, SECTOR, 0x02)

    terminator = bytearray(SECTOR)
    terminator[0] = 255
    terminator[1:6] = MAGIC

    image = b"\x00" * (16 * SECTOR) + bytes(pvd) + bytes(terminator) + root_raw
    for name, payload in files.items():
        image += pad_sector(payload)
    return image
