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

* **UDF** — a genuinely separate filesystem (ECMA-167/OSTA UDF) carried
  alongside the ISO9660 tree on bridge-format discs.  The reader walks
  it from scratch: Anchor Volume Descriptor Pointer at sector 256 →
  main Volume Descriptor Sequence → Partition + Logical Volume
  Descriptors → File Set Descriptor → root directory File Entry → File
  Identifier Descriptors, with inline, short_ad and long_ad allocation
  types.  Payloads recorded only in the UDF tree (empty primary root)
  are recovered the way pycdlib's udf_path walk does (ISO.py:71-73).

Writer emits deterministic single-directory images for fixtures, with
optional Joliet and Rock Ridge name tables; ``build_udf_bridge`` writes
a bridge image whose files live only in the UDF filesystem.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

__all__ = ["IsoReader", "is_iso", "build_iso", "build_udf_bridge"]

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
        """True when a valid UDF anchor chain resolves to a file-set root
        (AVDP at sector 256 → VDS → PD+LVD → FSD, module docstring)."""
        return self._udf_root() is not None

    # -- UDF (ECMA-167 subset) ---------------------------------------------
    def _udf_tag_id(self, off: int) -> Optional[int]:
        """Descriptor tag id at ``off`` iff the tag checksum verifies."""
        if off + 16 > len(self.data):
            return None
        tag = self.data[off:off + 16]
        if sum(tag[i] for i in range(16) if i != 4) % 256 != tag[4]:
            return None
        return struct.unpack_from("<H", tag)[0]

    def _udf_root(self):
        """-> (partition_start_sector, root_icb_block) or None; memoized."""
        if hasattr(self, "_udf_root_cache"):
            return self._udf_root_cache
        self._udf_root_cache = self._udf_locate()
        return self._udf_root_cache

    @staticmethod
    def _u32(data: bytes, off: int) -> Optional[int]:
        """Bounds-guarded little-endian u32 — truncated images (carved /
        partial samples) must degrade to no-UDF, never raise out of the
        rule and abort the remaining name-view walks."""
        if off + 4 > len(data):
            return None
        return struct.unpack_from("<I", data, off)[0]

    def _udf_locate(self):
        data = self.data
        # Anchor Volume Descriptor Pointer (tag 2) at sector 256
        avdp = 256 * SECTOR
        if self._udf_tag_id(avdp) != 2:
            return None
        vds_len = self._u32(data, avdp + 16)
        vds_loc = self._u32(data, avdp + 20)
        if vds_len is None or vds_loc is None:
            return None
        part_start = None
        fsd_block = None
        block_size = SECTOR
        for i in range(min(vds_len // SECTOR, 32)):
            off = (vds_loc + i) * SECTOR
            tag = self._udf_tag_id(off)
            if tag == 5:    # Partition Descriptor
                part_start = self._u32(data, off + 188)
            elif tag == 6:  # Logical Volume Descriptor
                block_size = self._u32(data, off + 212)
                # logicalVolumeContentsUse = long_ad of the File Set Desc
                fsd_block = self._u32(data, off + 252)
            elif tag in (8, None):  # terminator / invalid
                break
        if part_start is None or fsd_block is None or block_size != SECTOR:
            return None
        fsd = (part_start + fsd_block) * SECTOR
        if self._udf_tag_id(fsd) != 256:  # File Set Descriptor
            return None
        root_block = self._u32(data, fsd + 404)
        if root_block is None:
            return None
        return part_start, root_block

    def _udf_file_entry(self, part_start: int, block: int):
        """File (261) / Extended File (266) Entry -> (file_type, content)."""
        off = (part_start + block) * SECTOR
        tag = self._udf_tag_id(off)
        if tag == 261:
            l_ea_off, l_ad_off, ad_base = off + 168, off + 172, off + 176
        elif tag == 266:
            l_ea_off, l_ad_off, ad_base = off + 208, off + 212, off + 216
        else:
            return None
        if off + 36 > len(self.data):
            return None
        file_type = self.data[off + 27]            # icbtag.fileType
        alloc = struct.unpack_from("<H", self.data, off + 34)[0] & 0x7
        l_ea = self._u32(self.data, l_ea_off)
        l_ad = self._u32(self.data, l_ad_off)
        if l_ea is None or l_ad is None:
            return None
        ad_off = ad_base + l_ea
        if alloc == 3:      # data inline in the allocation-descriptor area
            content = self.data[ad_off:ad_off + l_ad]
        elif alloc in (0, 1):  # short_ad (8 B) / long_ad (16 B) lists
            width = 8 if alloc == 0 else 16
            parts = []
            for pos in range(ad_off, min(ad_off + l_ad, len(self.data) - 7), width):
                elen = self._u32(self.data, pos)
                eblock = self._u32(self.data, pos + 4)
                if elen is None or eblock is None:
                    break
                elen &= 0x3FFFFFFF
                if elen == 0:
                    break
                start = (part_start + eblock) * SECTOR
                parts.append(self.data[start:start + elen])
            content = b"".join(parts)
        else:
            return None
        return file_type, content

    @staticmethod
    def _udf_fids(content: bytes):
        """File Identifier Descriptors (tag 257) in directory content ->
        (name, is_dir, icb_block) for non-parent, non-deleted entries."""
        pos = 0
        while pos + 38 <= len(content):
            if struct.unpack_from("<H", content, pos)[0] != 257:
                break
            chars = content[pos + 18]
            l_fi = content[pos + 19]
            icb_block = struct.unpack_from("<I", content, pos + 24)[0]
            l_iu = struct.unpack_from("<H", content, pos + 36)[0]
            fi = content[pos + 38 + l_iu:pos + 38 + l_iu + l_fi]
            total = 38 + l_iu + l_fi
            pos += total + (-total) % 4            # pad to 4-byte multiple
            if chars & 0x08 or chars & 0x04:       # parent / deleted
                continue
            if not fi:
                continue
            # d-string: leading compression id (8 = bytes, 16 = UTF-16BE)
            if fi[0] == 16:
                name = fi[1:].decode("utf-16-be", errors="replace")
            else:
                name = fi[1:].decode("latin1")
            yield name, bool(chars & 0x02), icb_block

    # -- walks ------------------------------------------------------------
    def walk(self, view: str = "iso") -> Iterator[Tuple[str, str, bytes]]:
        """Yields (dirname, filename, data) depth-first.

        ``view``: "iso" (primary 8.3 identifiers), "joliet" (UTF-16BE long
        names from the supplementary tree), "rr" (primary tree with
        Rock Ridge NM names), or "udf" (the separate UDF filesystem).
        """
        if view == "udf":
            root = self._udf_root()
            if root is None:
                return
            part_start, root_block = root
            dirs: List[Tuple[str, int]] = [("/", root_block)]
            # visited-ICB set: a crafted/corrupt image whose directory FID
            # points back at an already-walked directory block (every tag
            # checksum can still verify) must terminate, not hang the
            # extract executor on an adversarial sample
            seen_dirs = set()
            while dirs:
                dirname, block = dirs.pop()
                if block in seen_dirs:
                    continue
                seen_dirs.add(block)
                fe = self._udf_file_entry(part_start, block)
                if fe is None or fe[0] != 4:       # not a directory ICB
                    continue
                for name, is_dir, icb_block in self._udf_fids(fe[1]):
                    if is_dir:
                        dirs.append((dirname.rstrip("/") + "/" + name, icb_block))
                    else:
                        child = self._udf_file_entry(part_start, icb_block)
                        if child is not None and child[0] == 5:  # regular file
                            yield dirname, name, child[1]
            return
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


# -- UDF bridge writer (fixtures) -------------------------------------------------

def _crc_ccitt(data: bytes) -> int:
    """CRC-ITU-T (poly 0x1021, init 0) — UDF descriptor-tag CRC."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


def _udf_desc(tag_id: int, location: int, body: bytes,
              crc_len: Optional[int] = None) -> bytes:
    """Full descriptor sector: 16-byte tag (checksum + CRC computed) +
    body, zero-padded to one sector."""
    if crc_len is None:
        crc_len = len(body)
    tag = bytearray(16)
    struct.pack_into("<H", tag, 0, tag_id)
    struct.pack_into("<H", tag, 2, 2)                    # NSR02 version
    struct.pack_into("<H", tag, 8, _crc_ccitt(body[:crc_len]))
    struct.pack_into("<H", tag, 10, crc_len)
    struct.pack_into("<I", tag, 12, location)
    tag[4] = sum(tag[i] for i in range(16) if i != 4) % 256
    out = bytes(tag) + body
    return out + b"\x00" * (-len(out) % SECTOR)


def _udf_long_ad(length: int, block: int, partref: int = 0) -> bytes:
    ad = bytearray(16)
    struct.pack_into("<I", ad, 0, length)
    struct.pack_into("<I", ad, 4, block)
    struct.pack_into("<H", ad, 8, partref)
    return bytes(ad)


def _udf_file_entry_desc(block: int, file_type: int, alloc_flags: int,
                         info_len: int, alloc_descs: bytes) -> bytes:
    """File Entry (tag 261): icbtag + stat fields + allocation descriptors."""
    body = bytearray(176 - 16)
    # icbtag (offsets relative to descriptor start minus the 16-byte tag)
    struct.pack_into("<H", body, 4 - 0, 4)               # strategy type 4
    struct.pack_into("<H", body, 8, 1)                   # max entries
    body[11] = file_type                                 # 4 dir / 5 file
    struct.pack_into("<H", body, 18, alloc_flags)        # alloc desc type
    # stat block
    struct.pack_into("<I", body, 20, 0xFFFFFFFF)         # uid
    struct.pack_into("<I", body, 24, 0xFFFFFFFF)         # gid
    struct.pack_into("<H", body, 32, 1)                  # link count
    struct.pack_into("<Q", body, 40, info_len)           # information length
    struct.pack_into("<Q", body, 48, (info_len + SECTOR - 1) // SECTOR)
    struct.pack_into("<I", body, 92, 1)                  # checkpoint
    struct.pack_into("<I", body, 156, len(alloc_descs))  # L_AD (L_EA = 0)
    return _udf_desc(261, block, bytes(body) + alloc_descs)


def _udf_fid(name: Optional[str], chars: int, icb_block: int,
             location: int) -> bytes:
    """File Identifier Descriptor (tag 257); ``name=None`` -> parent FID."""
    fi = b"" if name is None else b"\x08" + name.encode("latin1")
    body = bytearray(38 - 16)
    body[2] = chars
    body[3] = len(fi)
    body[4:20] = _udf_long_ad(SECTOR, icb_block)
    raw = bytes(body) + fi
    total = 16 + len(raw)
    raw += b"\x00" * ((-total) % 4)
    # FIDs embed in directory data: tag CRC spans the padded body
    return _udf_desc(257, location, raw)[: 16 + len(raw)]


def build_udf_bridge(files: Dict[str, bytes],
                     volume_id: str = "KGMWCP") -> bytes:
    """Bridge-format image: a minimal ISO9660 PVD with an EMPTY primary
    root (so only the UDF tree carries payloads) + Volume Recognition
    Sequence (BEA01/NSR02/TEA01) + AVDP at sector 256 -> VDS (PD + LVD)
    -> FSD -> root directory File Entry (inline FIDs) -> per-file File
    Entries (short_ad) -> data extents."""
    def pad_sector(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % SECTOR)

    # ---- ISO9660 side: PVD + terminator + empty root dir at sector 21
    iso_root_extent = 21

    def dir_record(ident: bytes, extent: int, size: int, flags: int) -> bytes:
        su_off = 33 + len(ident) + (1 if len(ident) % 2 == 0 else 0)
        rec = bytearray(su_off + su_off % 2)
        rec[0] = len(rec)
        struct.pack_into("<I", rec, 2, extent)
        struct.pack_into(">I", rec, 6, extent)
        struct.pack_into("<I", rec, 10, size)
        struct.pack_into(">I", rec, 14, size)
        rec[18:25] = bytes([120, 1, 1, 0, 0, 0, 0])
        rec[25] = flags
        rec[28] = 1
        rec[31] = 1
        rec[32] = len(ident)
        rec[33:33 + len(ident)] = ident
        return bytes(rec)

    pvd = bytearray(SECTOR)
    pvd[0] = 1
    pvd[1:6] = MAGIC
    pvd[6] = 1
    pvd[40:40 + len(volume_id)] = volume_id.encode("ascii")
    pvd[120] = 1; pvd[123] = 1
    pvd[124] = 1; pvd[127] = 1
    struct.pack_into("<H", pvd, 128, SECTOR)
    struct.pack_into(">H", pvd, 130, SECTOR)
    root_rec = dir_record(b"\x00", iso_root_extent, SECTOR, 0x02)
    pvd[156:156 + len(root_rec)] = root_rec

    terminator = bytearray(SECTOR)
    terminator[0] = 255
    terminator[1:6] = MAGIC

    def vsd(ident: bytes) -> bytes:
        v = bytearray(SECTOR)
        v[0] = 0
        v[1:6] = ident
        v[6] = 1
        return bytes(v)

    iso_root = pad_sector(
        dir_record(b"\x00", iso_root_extent, SECTOR, 0x02)
        + dir_record(b"\x01", iso_root_extent, SECTOR, 0x02))

    # ---- UDF side: VDS at 32..34, partition at 260
    vds_loc, part_start = 32, 260

    pd_body = bytearray(512 - 16)
    struct.pack_into("<H", pd_body, 4, 1)                # flags: allocated
    _nsr = b"\x00+NSR02"                                 # contents regid
    pd_body[8:8 + len(_nsr)] = _nsr
    struct.pack_into("<I", pd_body, 168, 1)              # access: read-only
    struct.pack_into("<I", pd_body, 172, part_start)     # starting location
    struct.pack_into("<I", pd_body, 176, 4096)           # partition length
    pd = _udf_desc(5, vds_loc, bytes(pd_body))

    lvd_body = bytearray(446 - 16)
    lvd_body[4] = 0                                      # charset
    struct.pack_into("<I", lvd_body, 196, SECTOR)        # logical block size
    _domain = b"\x00*OSTA UDF Compliant"                 # domain regid
    lvd_body[200:200 + len(_domain)] = _domain
    lvd_body[232:248] = _udf_long_ad(SECTOR, 0)          # FSD at part block 0
    struct.pack_into("<I", lvd_body, 248, 6)             # map table length
    struct.pack_into("<I", lvd_body, 252, 1)             # one partition map
    # type-1 partition map at offset 424 (desc offset 440)
    lvd_body[424] = 1
    lvd_body[425] = 6
    struct.pack_into("<H", lvd_body, 426, 1)             # vol seq number
    struct.pack_into("<H", lvd_body, 428, 0)             # partition number
    lvd = _udf_desc(6, vds_loc + 1, bytes(lvd_body))

    vds_term = _udf_desc(8, vds_loc + 2, bytes(496))

    avdp_body = bytearray(512 - 16)
    struct.pack_into("<II", avdp_body, 0, 3 * SECTOR, vds_loc)
    avdp = _udf_desc(2, 256, bytes(avdp_body))

    # partition blocks: 0 = FSD, 1 = root dir FE, 2.. = file FEs + data
    fsd_body = bytearray(512 - 16)
    fsd_body[384:400] = _udf_long_ad(SECTOR, 1)          # root ICB at block 1
    fsd = _udf_desc(256, part_start, bytes(fsd_body))

    placements = {}
    next_block = 2
    for name, payload in files.items():
        n_sectors = max(1, (len(payload) + SECTOR - 1) // SECTOR)
        placements[name] = (next_block, next_block + 1)  # (FE, data start)
        next_block += 1 + n_sectors

    fids = _udf_fid(None, 0x0A, 1, part_start + 1)       # parent -> root
    for name in files:
        fids += _udf_fid(name, 0x00, placements[name][0], part_start + 1)
    root_fe = _udf_file_entry_desc(part_start + 1, 4, 3, len(fids), fids)

    part_blocks = [fsd, root_fe]
    for name, payload in files.items():
        fe_block, data_block = placements[name]
        short_ad = struct.pack("<II", len(payload), data_block)
        part_blocks.append(_udf_file_entry_desc(
            part_start + fe_block, 5, 0, len(payload), short_ad))
        # pad to the exact sector count the placements reserved — an
        # empty payload still occupies its one reserved sector, else
        # every later block lands one sector before its recorded address
        n_sectors = max(1, (len(payload) + SECTOR - 1) // SECTOR)
        part_blocks.append(payload + b"\x00" * (n_sectors * SECTOR - len(payload)))

    # ---- assemble
    image = bytearray(b"\x00" * (16 * SECTOR))
    image += pvd + bytes(terminator)
    image += vsd(b"BEA01") + vsd(b"NSR02") + vsd(b"TEA01")   # sectors 18-20
    image += iso_root                                        # sector 21
    image += b"\x00" * ((vds_loc - 22) * SECTOR)
    image += pd + lvd + vds_term                             # 32-34
    image += b"\x00" * ((256 - 35) * SECTOR)
    image += avdp                                            # 256
    image += b"\x00" * ((part_start - 257) * SECTOR)
    for blk in part_blocks:                                  # 260+
        image += blk
    return bytes(image)
