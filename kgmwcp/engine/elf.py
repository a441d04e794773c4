"""Minimal ELF reader — from scratch (no pyelftools).

Covers the slice of the reference's ELF view the pipeline consumes
(mwcp/file_object.py:271-277 ``.elf`` via mwcp/utils/elffileutils.py and
mwcp/file_object.py:492-504 ``architecture``): header parse, the
machine-arch string (same names pyelftools' ``get_machine_arch`` returns
for the common machines, with ``None`` standing in for ``<unknown>`` as
the reference maps it), and section lookup by name.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

__all__ = ["parse_elf", "ElfFile", "is_elf"]

_MAGIC = b"\x7fELF"

# e_machine -> pyelftools get_machine_arch() string (common subset).
_MACHINE_ARCH = {
    0x03: "x86",
    0x08: "MIPS",
    0x14: "PowerPC",
    0x15: "PowerPC64",
    0x16: "IBM S/390",
    0x28: "ARM",
    0x2A: "SuperH",
    0x32: "IA-64",
    0x3E: "x64",
    0xB7: "AArch64",
    0xF3: "RISC-V",
}


def is_elf(data: bytes) -> bool:
    return data[:4] == _MAGIC and len(data) >= 52


class ElfFile:
    """Parsed ELF header + section table."""

    def __init__(self, data: bytes):
        if not is_elf(data):
            raise ValueError("not an ELF file")
        self.data = data
        ei_class = data[4]          # 1 = 32-bit, 2 = 64-bit
        ei_data = data[5]           # 1 = LE, 2 = BE
        if ei_class not in (1, 2) or ei_data not in (1, 2):
            raise ValueError("bad EI_CLASS/EI_DATA")
        self.is_64 = ei_class == 2
        self.endian = "<" if ei_data == 1 else ">"
        e = self.endian
        if self.is_64:
            (self.e_type, self.e_machine, _ver, self.e_entry, self.e_phoff,
             self.e_shoff, _flags, _ehsize, self.e_phentsize, self.e_phnum,
             self.e_shentsize, self.e_shnum, self.e_shstrndx) = struct.unpack_from(
                e + "HHIQQQIHHHHHH", data, 16)
        else:
            (self.e_type, self.e_machine, _ver, self.e_entry, self.e_phoff,
             self.e_shoff, _flags, _ehsize, self.e_phentsize, self.e_phnum,
             self.e_shentsize, self.e_shnum, self.e_shstrndx) = struct.unpack_from(
                e + "HHIIIIIHHHHHH", data, 16)
        self._sections: Optional[List[Tuple[str, int, int]]] = None
        self._segments: Optional[List[Tuple[int, int, int, int]]] = None

    # -- architecture -------------------------------------------------------
    @property
    def architecture(self) -> Optional[str]:
        """pyelftools-compatible arch string; None for unknown machines
        (the reference maps '<unknown>' to None, file_object.py:498-502)."""
        return _MACHINE_ARCH.get(self.e_machine)

    # -- sections ------------------------------------------------------------
    def _load_sections(self) -> List[Tuple[str, int, int]]:
        if self._sections is not None:
            return self._sections
        out: List[Tuple[str, int, int]] = []
        data, e = self.data, self.endian
        if not self.e_shoff or not self.e_shnum:
            self._sections = out
            return out
        ent = self.e_shentsize
        headers = []
        for i in range(self.e_shnum):
            off = self.e_shoff + i * ent
            if off + ent > len(data):
                break
            if self.is_64:
                name_off, _typ, _flags, _addr, sh_offset, sh_size = struct.unpack_from(
                    e + "IIQQQQ", data, off)
            else:
                name_off, _typ, _flags, _addr, sh_offset, sh_size = struct.unpack_from(
                    e + "IIIIII", data, off)
            headers.append((name_off, sh_offset, sh_size))
        # resolve names through the section-header string table
        strtab = b""
        if self.e_shstrndx < len(headers):
            _n, s_off, s_size = headers[self.e_shstrndx]
            strtab = data[s_off:s_off + s_size]
        for name_off, sh_offset, sh_size in headers:
            end = strtab.find(b"\x00", name_off)
            name = strtab[name_off:end if end >= 0 else None].decode(
                "latin1") if name_off < len(strtab) else ""
            out.append((name, sh_offset, sh_size))
        self._sections = out
        return out

    def sections(self) -> Iterator[Tuple[str, bytes]]:
        """(name, raw bytes) per section (elffileutils.obtain_section_data
        analogue)."""
        for name, off, size in self._load_sections():
            yield name, self.data[off:off + size]

    def section_data(self, name: str) -> Optional[bytes]:
        for sec_name, blob in self.sections():
            if sec_name == name:
                return blob
        return None

    # -- segments / address mapping (elffileutils.py:92-128) -------------------
    def segments(self) -> List[Tuple[int, int, int, int]]:
        """(p_type, p_offset, p_vaddr, p_filesz) per program header."""
        if self._segments is not None:
            return self._segments
        out: List[Tuple[int, int, int, int]] = []
        data, e = self.data, self.endian
        ent = self.e_phentsize
        for i in range(min(self.e_phnum, 128)):
            off = self.e_phoff + i * ent
            if not self.e_phoff or off + ent > len(data):
                break
            if self.is_64:
                p_type, _fl, p_offset, p_vaddr = struct.unpack_from(
                    e + "IIQQ", data, off)
                (p_filesz,) = struct.unpack_from(e + "Q", data, off + 32)
            else:
                p_type, p_offset, p_vaddr = struct.unpack_from(
                    e + "III", data, off)
                (p_filesz,) = struct.unpack_from(e + "I", data, off + 16)
            out.append((p_type, p_offset, p_vaddr, p_filesz))
        self._segments = out
        return out

    def vaddr_to_offset(self, vaddr: int) -> Optional[int]:
        """Memory address -> file offset via the first covering segment
        (elffileutils.obtain_physical_offset)."""
        for _t, p_offset, p_vaddr, p_filesz in self.segments():
            if p_vaddr <= vaddr < p_vaddr + p_filesz:
                return p_offset + (vaddr - p_vaddr)
        return None

    def offset_to_vaddr(self, offset: int) -> Optional[int]:
        """File offset -> memory address
        (elffileutils.obtain_memory_offset)."""
        for _t, p_offset, p_vaddr, p_filesz in self.segments():
            if p_offset <= offset < p_offset + p_filesz:
                return p_vaddr + (offset - p_offset)
        return None


def parse_elf(data: bytes) -> Optional[ElfFile]:
    """ELF view or None (elffileutils.obtain_elf contract: never raises)."""
    try:
        return ElfFile(data)
    except (ValueError, struct.error):
        return None
