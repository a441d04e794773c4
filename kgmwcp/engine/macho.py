"""Minimal Mach-O reader — from scratch (no lief).

Covers the slice of the reference's Mach-O view the pipeline consumes
(mwcp/file_object.py:279-285 ``.macho`` via mwcp/utils/machoutils.py):
thin and fat binaries, per-slice CPU-type strings (the same enum names
``machoutils.get_cpu_type`` yields from lief, e.g. ``X86_64``/``ARM64``),
and section lookup by name across slices.

Note the reference's ``FileObject.architecture`` never consults the
Mach-O view (file_object.py:492-504 is PE/ELF only) — we keep that
behavior; the view exists for rules that need sections/CPU types.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

__all__ = ["parse_macho", "MachoFile", "MachoSlice", "is_macho"]

_MH_MAGIC_32 = 0xFEEDFACE
_MH_MAGIC_64 = 0xFEEDFACF
_FAT_MAGIC = 0xCAFEBABE

# cputype -> lief CPU_TYPES enum name (machoutils.get_cpu_type output)
_CPU_64 = 0x01000000
_CPU_NAMES = {
    7: "X86",
    7 | _CPU_64: "X86_64",
    12: "ARM",
    12 | _CPU_64: "ARM64",
    18: "POWERPC",
    18 | _CPU_64: "POWERPC64",
}

_LC_SEGMENT = 0x1
_LC_SEGMENT_64 = 0x19


def _thin_magic(data: bytes) -> Optional[Tuple[bool, str]]:
    """(is_64, endian) for a thin Mach-O header at offset 0, else None."""
    if len(data) < 28:
        return None
    magic_be = struct.unpack_from(">I", data)[0]
    magic_le = struct.unpack_from("<I", data)[0]
    for magic, endian in ((magic_le, "<"), (magic_be, ">")):
        if magic == _MH_MAGIC_32:
            return False, endian
        if magic == _MH_MAGIC_64:
            return True, endian
    return None


def is_macho(data: bytes) -> bool:
    if _thin_magic(data) is not None:
        return True
    return len(data) >= 8 and struct.unpack_from(">I", data)[0] == _FAT_MAGIC


class MachoSlice:
    """One architecture slice (a thin Mach-O image)."""

    def __init__(self, data: bytes):
        probe = _thin_magic(data)
        if probe is None:
            raise ValueError("not a thin Mach-O image")
        self.is_64, self.endian = probe
        self.data = data
        e = self.endian
        (_magic, self.cputype, self.cpusubtype, self.filetype,
         self.ncmds, self.sizeofcmds, _flags) = struct.unpack_from(e + "IiiIIII", data)
        self._header_size = 32 if self.is_64 else 28

    @property
    def cpu_type(self) -> str:
        """lief-style enum name (machoutils.get_cpu_type parity); unmapped
        types surface as the raw integer string."""
        return _CPU_NAMES.get(self.cputype, str(self.cputype))

    def sections(self) -> Iterator[Tuple[str, bytes]]:
        data, e = self.data, self.endian
        pos = self._header_size
        for _ in range(self.ncmds):
            if pos + 8 > len(data):
                break
            cmd, cmdsize = struct.unpack_from(e + "II", data, pos)
            if cmdsize < 8 or pos + cmdsize > len(data):
                break
            if cmd in (_LC_SEGMENT, _LC_SEGMENT_64):
                is64 = cmd == _LC_SEGMENT_64
                # segment_command(_64): cmd,cmdsize,segname[16],vmaddr,vmsize,
                # fileoff,filesize,maxprot,initprot,nsects,flags
                if is64:
                    nsects = struct.unpack_from(e + "I", data, pos + 64)[0]
                    sect_off, sect_size = pos + 72, 80
                else:
                    nsects = struct.unpack_from(e + "I", data, pos + 48)[0]
                    sect_off, sect_size = pos + 56, 68
                for i in range(nsects):
                    so = sect_off + i * sect_size
                    if so + sect_size > pos + cmdsize:
                        break
                    sectname = data[so:so + 16].rstrip(b"\x00").decode("latin1")
                    if is64:
                        _addr, size, offset = struct.unpack_from(e + "QQI", data, so + 32)
                    else:
                        _addr, size, offset = struct.unpack_from(e + "III", data, so + 32)
                    yield sectname, data[offset:offset + size]
            pos += cmdsize


class MachoFile:
    """Thin or fat Mach-O; ``slices`` mirrors lief FatBinary.at(i)."""

    def __init__(self, data: bytes):
        self.data = data
        self.slices: List[MachoSlice] = []
        if _thin_magic(data) is not None:
            self.slices.append(MachoSlice(data))
        elif len(data) >= 8 and struct.unpack_from(">I", data)[0] == _FAT_MAGIC:
            nfat = struct.unpack_from(">I", data, 4)[0]
            if nfat > 64:
                raise ValueError("implausible fat arch count")
            for i in range(nfat):
                off = 8 + i * 20
                _cputype, _sub, f_offset, f_size, _align = struct.unpack_from(
                    ">iiIII", data, off)
                self.slices.append(MachoSlice(data[f_offset:f_offset + f_size]))
        else:
            raise ValueError("not a Mach-O file")
        if not self.slices:
            raise ValueError("empty fat Mach-O")

    @property
    def size(self) -> int:
        return len(self.slices)

    def at(self, index: int) -> MachoSlice:
        return self.slices[index]

    def cpu_types(self) -> List[str]:
        return [s.cpu_type for s in self.slices]

    def section_data(self, name: str) -> Optional[bytes]:
        """First section with ``name`` across slices
        (machoutils.obtain_section_data analogue)."""
        for sl in self.slices:
            for sec_name, blob in sl.sections():
                if sec_name == name:
                    return blob
        return None


def parse_macho(data: bytes) -> Optional[MachoFile]:
    """Mach-O view or None (machoutils.obtain_macho contract)."""
    try:
        return MachoFile(data)
    except (ValueError, struct.error):
        return None
