"""Row-local sample file model for the extraction engine.

A drastically slimmed, from-scratch analogue of the reference's FileObject
(mwcp/file_object.py:45-230): immutable bytes + lazy hash identity + tree
links + description/derivation/tags.  Binary-format views (PE/ELF/Mach-O)
are intentionally absent in v0 (gated behind optional probes later).
"""

from __future__ import annotations

import hashlib
import pathlib
from typing import List, Optional

__all__ = ["SampleFile"]


class SampleFile:
    __slots__ = (
        "data", "_name", "description", "derivation", "tags", "parent",
        "children", "output_file", "rule", "rule_group", "origin_group",
        "depth", "_md5", "_sha1", "_sha256", "_pe", "_pe_attempted",
        "_elf", "_elf_attempted", "_macho", "_macho_attempted",
    )

    def __init__(
        self,
        data: bytes,
        name: Optional[str] = None,
        description: Optional[str] = None,
        derivation: Optional[str] = None,
        output_file: bool = True,
        ext: str = ".bin",
    ) -> None:
        if isinstance(data, bytearray):
            data = bytes(data)
        if not isinstance(data, bytes):
            raise TypeError("data must be bytes")
        self.data = data
        self._md5: Optional[str] = None
        self._sha1: Optional[str] = None
        self._sha256: Optional[str] = None
        self._pe = None
        self._pe_attempted = False
        self._elf = None
        self._elf_attempted = False
        self._macho = None
        self._macho_attempted = False
        # Default name mirrors the reference's stub naming
        # (mwcp/file_object.py:141-147 -> pefileutils.py:386-418):
        # non-PE -> "<md5>.bin"; PE -> recovered original filename
        # (export-dir DLL name, else version-info OriginalFilename),
        # else "<md5>_<arch><.exe|.dll>".
        if name:
            self._name = name
        elif self.pe is not None:
            self._name = self.pe.original_filename(self.md5)
        else:
            self._name = self.md5 + ext
        self.description = description
        self.derivation = derivation
        self.tags: set = set()
        self.parent: Optional["SampleFile"] = None
        self.children: List["SampleFile"] = []
        self.output_file = output_file
        self.rule = None           # rule that parsed this file (set by engine)
        self.rule_group = None     # group of the rule that parsed this file
        self.origin_group = None   # group that dispatched this file
        self.depth = 0

    # -- identity ----------------------------------------------------------
    @property
    def md5(self) -> str:
        if self._md5 is None:
            self._md5 = hashlib.md5(self.data).hexdigest()
        return self._md5

    @property
    def sha1(self) -> str:
        if self._sha1 is None:
            self._sha1 = hashlib.sha1(self.data).hexdigest()
        return self._sha1

    @property
    def sha256(self) -> str:
        if self._sha256 is None:
            self._sha256 = hashlib.sha256(self.data).hexdigest()
        return self._sha256

    # -- format views ---------------------------------------------------------
    @property
    def pe(self):
        """Lazy PE view, parsed once (mwcp/file_object.py:134,271-285)."""
        if not self._pe_attempted:
            self._pe_attempted = True
            from kgmwcp.engine.pe import parse_pe

            self._pe = parse_pe(self.data)
        return self._pe

    @property
    def elf(self):
        """Lazy ELF view (mwcp/file_object.py:271-277)."""
        if not self._elf_attempted:
            self._elf_attempted = True
            from kgmwcp.engine.elf import parse_elf

            self._elf = parse_elf(self.data)
        return self._elf

    @property
    def macho(self):
        """Lazy Mach-O view (mwcp/file_object.py:279-285)."""
        if not self._macho_attempted:
            self._macho_attempted = True
            from kgmwcp.engine.macho import parse_macho

            self._macho = parse_macho(self.data)
        return self._macho

    @property
    def architecture(self) -> Optional[str]:
        """PE arch, else ELF machine arch, else None — the reference never
        consults the Mach-O view here (mwcp/file_object.py:492-504)."""
        if self.pe is not None:
            return self.pe.architecture
        if self.elf is not None:
            return self.elf.architecture
        return None

    @property
    def compile_time(self) -> Optional[str]:
        """ISO-8601 UTC compile time (File.from_file_object serialization,
        mwcp/metadata.py:2873)."""
        if self.pe:
            return self.pe.compile_time().isoformat()
        return None

    # -- naming ------------------------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    @name.setter
    def name(self, value: str) -> None:
        self._name = value

    @property
    def ext(self) -> str:
        return pathlib.PurePath(self._name).suffix

    @ext.setter
    def ext(self, new_ext: str) -> None:
        # Matches reference ext setter (mwcp/file_object.py:321-326).
        if not new_ext.startswith("."):
            new_ext = "." + new_ext
        self._name = pathlib.PurePath(self._name).stem + new_ext

    @property
    def stem(self) -> str:
        return pathlib.PurePath(self._name).stem

    def add_tag(self, *tags: str) -> "SampleFile":
        for tag in tags:
            self.tags.add(tag)
        return self

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<SampleFile {self._name} ({self.md5}) : {self.description}>"
