"""Minimal OLE2 / Compound File Binary (CFB) reader + writer — from scratch.

Covers exactly what quarantine-container parsing needs: locate a stream by
name and read its bytes, following the FAT chain (and the mini-FAT for
streams below the mini-stream cutoff).  The writer emits simple containers
(root + flat streams, regular FAT only) for deterministic fixtures.

Format reference: the public [MS-CFB] specification.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

__all__ = ["CfbReader", "is_cfb", "build_cfb"]

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
MINI_CUTOFF = 4096


def is_cfb(data: bytes) -> bool:
    return data.startswith(MAGIC)


class CfbReader:
    def __init__(self, data: bytes):
        if not is_cfb(data):
            raise ValueError("not a CFB file")
        self.data = data
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        (self.n_fat_sectors,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat_sectors,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        self.fat = self._load_fat()
        self.directory = self._load_directory()
        self.minifat = self._load_minifat()
        root = self.directory[0]
        self.ministream = self._read_chain(root["start"], root["size"],
                                           mini=False) if root["size"] else b""

    # -- sectors -----------------------------------------------------------
    def _sector(self, sid: int) -> bytes:
        off = (sid + 1) * self.sector_size
        return self.data[off:off + self.sector_size]

    def _load_fat(self) -> List[int]:
        # DIFAT: first 109 FAT sector ids live in the header
        fat_sids = list(struct.unpack_from("<109I", self.data, 76))
        sid = self.difat_start
        while sid not in (ENDOFCHAIN, FREESECT):
            sector = self._sector(sid)
            entries = struct.unpack(f"<{self.sector_size // 4}I", sector)
            fat_sids.extend(entries[:-1])
            sid = entries[-1]
        fat: List[int] = []
        for fat_sid in fat_sids:
            if fat_sid in (FREESECT, ENDOFCHAIN):
                continue
            fat.extend(struct.unpack(f"<{self.sector_size // 4}I",
                                     self._sector(fat_sid)))
        return fat

    def _load_minifat(self) -> List[int]:
        if self.minifat_start in (ENDOFCHAIN, FREESECT):
            return []
        raw = self._read_chain(self.minifat_start,
                               self.n_minifat_sectors * self.sector_size,
                               mini=False)
        return list(struct.unpack(f"<{len(raw) // 4}I", raw))

    def _read_chain(self, start: int, size: int, mini: bool) -> bytes:
        chunks = []
        sid = start
        remaining = size
        table = self.minifat if mini else self.fat
        while sid != ENDOFCHAIN and remaining > 0:
            if mini:
                off = sid * self.mini_size
                chunk = self.ministream[off:off + self.mini_size]
            else:
                chunk = self._sector(sid)
            chunks.append(chunk[:remaining])
            remaining -= len(chunk[:remaining])
            sid = table[sid]
        return b"".join(chunks)

    # -- directory -----------------------------------------------------------
    def _load_directory(self) -> List[dict]:
        raw = b""
        sid = self.dir_start
        while sid != ENDOFCHAIN:
            raw += self._sector(sid)
            sid = self.fat[sid]
        entries = []
        for off in range(0, len(raw), 128):
            entry = raw[off:off + 128]
            if len(entry) < 128:
                break
            (name_len,) = struct.unpack_from("<H", entry, 64)
            obj_type = entry[66]
            if obj_type == 0:
                continue
            name = entry[:max(name_len - 2, 0)].decode("utf-16-le")
            (start,) = struct.unpack_from("<I", entry, 116)
            (size,) = struct.unpack_from("<Q", entry, 120)
            entries.append({
                "name": name, "type": obj_type, "start": start, "size": size,
            })
        return entries

    # -- public API ------------------------------------------------------------
    def list_streams(self) -> List[str]:
        return [e["name"] for e in self.directory if e["type"] == 2]

    def exists(self, name: str) -> bool:
        return name in self.list_streams()

    def read_stream(self, name: str) -> Optional[bytes]:
        for entry in self.directory:
            if entry["type"] == 2 and entry["name"] == name:
                mini = entry["size"] < MINI_CUTOFF
                return self._read_chain(entry["start"], entry["size"], mini=mini)
        return None


# -- writer (fixtures) ---------------------------------------------------------

def build_cfb(streams: Dict[str, bytes]) -> bytes:
    """Minimal CFB container: root entry + flat streams, 512-byte sectors,
    regular FAT only — every stream is padded into full sectors.  Streams
    smaller than the mini cutoff are padded up so readers (including the
    reference's olefile path) take the regular-FAT branch.
    """
    sector = 512

    def pad(data: bytes) -> bytes:
        n = (len(data) + sector - 1) // sector
        return data + b"\x00" * (n * sector - len(data)) if n else b""

    # layout: [dir sectors][stream sectors...][fat sectors]
    names = list(streams)
    payloads = {n: streams[n] for n in names}
    for name, payload in payloads.items():
        if len(payload) < MINI_CUTOFF:
            raise ValueError(
                f"stream {name!r} shorter than mini cutoff ({MINI_CUTOFF}); "
                "pad fixture payloads — this writer emits regular FAT only")

    n_dir_entries = 1 + len(names)
    n_dir_sectors = (n_dir_entries * 128 + sector - 1) // sector
    stream_sectors = {n: (len(p) + sector - 1) // sector for n, p in payloads.items()}

    # assign sector ids
    sid = 0
    dir_start = sid
    sid += n_dir_sectors
    starts = {}
    for name in names:
        starts[name] = sid
        sid += stream_sectors[name]
    n_data_sectors = sid
    # FAT sectors needed (each holds 128 entries)
    n_fat_sectors = max(1, (n_data_sectors + 1 + 127) // 128)
    fat_start = sid
    total_sectors = n_data_sectors + n_fat_sectors

    fat = [FREESECT] * (n_fat_sectors * 128)
    def chain(start: int, count: int) -> None:
        for i in range(count - 1):
            fat[start + i] = start + i + 1
        fat[start + count - 1] = ENDOFCHAIN

    chain(dir_start, n_dir_sectors)
    for name in names:
        chain(starts[name], stream_sectors[name])
    for i in range(n_fat_sectors):
        fat[fat_start + i] = FATSECT

    def dir_entry(name: str, obj_type: int, start: int, size: int,
                  child: int = 0xFFFFFFFF) -> bytes:
        encoded = name.encode("utf-16-le")
        buf = bytearray(128)
        buf[:len(encoded)] = encoded
        struct.pack_into("<H", buf, 64, len(encoded) + 2)
        buf[66] = obj_type
        buf[67] = 1  # black
        struct.pack_into("<I", buf, 68, 0xFFFFFFFF)  # left
        struct.pack_into("<I", buf, 72, 0xFFFFFFFF)  # right
        struct.pack_into("<I", buf, 76, child)
        struct.pack_into("<I", buf, 116, start)
        struct.pack_into("<Q", buf, 120, size)
        return bytes(buf)

    # naive red-black substitute: root's child -> first stream; each stream's
    # "right" points to the next (readers here and olefile walk all entries)
    entries = [dir_entry("Root Entry", 5, ENDOFCHAIN, 0,
                         child=1 if names else 0xFFFFFFFF)]
    for i, name in enumerate(names):
        entry = bytearray(dir_entry(name, 2, starts[name], len(payloads[name])))
        if i + 1 < len(names):
            struct.pack_into("<I", entry, 72, i + 2)  # right sibling
        entries.append(bytes(entry))
    dir_raw = pad(b"".join(entries))

    body = dir_raw
    for name in names:
        body += pad(payloads[name])
    for i in range(n_fat_sectors):
        body += struct.pack("<128I", *fat[i * 128:(i + 1) * 128])

    header = bytearray(512)
    header[:8] = MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version (512b sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)   # little endian
    struct.pack_into("<H", header, 30, 9)        # sector shift
    struct.pack_into("<H", header, 32, 6)        # mini sector shift
    struct.pack_into("<I", header, 44, n_fat_sectors)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, MINI_CUTOFF)
    struct.pack_into("<I", header, 60, ENDOFCHAIN)  # no minifat
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no difat chain
    struct.pack_into("<I", header, 72, 0)
    difat = [FREESECT] * 109
    for i in range(n_fat_sectors):
        difat[i] = fat_start + i
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + body
