"""Minimal PE (PE32/PE32+) reader + fixture builder — from scratch.

Covers what the dropper/metadata extractors need: header fields
(architecture, compile time, dll/exe), section table, RVA mapping,
overlay-offset computation (mirroring the reference's modified
get_overlay_data_start_offset, mwcp/utils/pefileutils.py:421-487), and
resource-directory walking.  The builder emits small, valid-enough PE
files (optionally with an overlay and RT_* resources) for deterministic
fixtures.

Format reference: the public PE/COFF specification.
"""

from __future__ import annotations

import datetime
import struct
from typing import Dict, List, Optional, Tuple

__all__ = ["MiniPE", "parse_pe", "build_pe", "RESOURCE_TYPES"]

MACHINE_I386 = 0x014C
MACHINE_AMD64 = 0x8664
PE32_MAGIC = 0x10B
PE32PLUS_MAGIC = 0x20B
CHAR_DLL = 0x2000
DIR_SECURITY = 4
DIR_RESOURCE = 2

RESOURCE_TYPES = {
    1: "RT_CURSOR", 2: "RT_BITMAP", 3: "RT_ICON", 4: "RT_MENU",
    5: "RT_DIALOG", 6: "RT_STRING", 7: "RT_FONTDIR", 8: "RT_FONT",
    9: "RT_ACCELERATOR", 10: "RT_RCDATA", 11: "RT_MESSAGETABLE",
    12: "RT_GROUP_CURSOR", 14: "RT_GROUP_ICON", 16: "RT_VERSION",
    17: "RT_DLGINCLUDE", 19: "RT_PLUGPLAY", 20: "RT_VXD",
    21: "RT_ANICURSOR", 22: "RT_ANIICON", 23: "RT_HTML", 24: "RT_MANIFEST",
}


class Section:
    __slots__ = ("name", "virtual_address", "virtual_size",
                 "raw_pointer", "raw_size")

    def __init__(self, name, va, vsize, raw_ptr, raw_size):
        self.name = name
        self.virtual_address = va
        self.virtual_size = vsize
        self.raw_pointer = raw_ptr
        self.raw_size = raw_size


class MiniPE:
    def __init__(self, data: bytes):
        self.data = data
        if len(data) < 0x40 or data[:2] != b"MZ":
            raise ValueError("not a PE: missing MZ")
        (e_lfanew,) = struct.unpack_from("<I", data, 0x3C)
        if e_lfanew + 24 > len(data) or data[e_lfanew:e_lfanew + 4] != b"PE\x00\x00":
            raise ValueError("not a PE: missing PE signature")
        coff = e_lfanew + 4
        (self.machine, n_sections, self.timestamp, _, _,
         size_opt, self.characteristics) = struct.unpack_from("<HHIIIHH", data, coff)
        self.opt_offset = coff + 20
        self.size_of_optional_header = size_opt
        (self.pe_type,) = struct.unpack_from("<H", data, self.opt_offset)
        if self.pe_type not in (PE32_MAGIC, PE32PLUS_MAGIC):
            raise ValueError("not a PE: bad optional-header magic")
        # data directories: after the standard+windows optional fields
        dd_offset = self.opt_offset + (112 if self.pe_type == PE32PLUS_MAGIC else 96)
        (n_dirs,) = struct.unpack_from("<I", data, dd_offset - 4)
        self.data_directories: List[Tuple[int, int]] = []
        for i in range(min(n_dirs, 16)):
            rva, size = struct.unpack_from("<II", data, dd_offset + i * 8)
            self.data_directories.append((rva, size))
        sec_offset = self.opt_offset + size_opt
        self.sections: List[Section] = []
        for i in range(n_sections):
            off = sec_offset + i * 40
            name = data[off:off + 8].rstrip(b"\x00").decode("latin1")
            vsize, va, raw_size, raw_ptr = struct.unpack_from("<IIII", data, off + 8)
            self.sections.append(Section(name, va, vsize, raw_ptr, raw_size))

    # -- identity ------------------------------------------------------------
    @property
    def is_64bit(self) -> bool:
        return self.pe_type == PE32PLUS_MAGIC

    @property
    def architecture(self) -> str:
        """bitterm=False form used by File metadata (pefileutils.py:318-343)."""
        return "x64" if self.is_64bit else "x86"

    @property
    def is_dll(self) -> bool:
        return bool(self.characteristics & CHAR_DLL)

    def file_ext(self) -> str:
        """pefileutils.obtain_file_ext analogue (driver detection omitted)."""
        return ".dll" if self.is_dll else ".exe"

    def compile_time(self) -> datetime.datetime:
        return datetime.datetime.fromtimestamp(self.timestamp, datetime.timezone.utc)

    # -- address mapping ---------------------------------------------------------
    def rva_to_offset(self, rva: int) -> Optional[int]:
        for s in self.sections:
            size = max(s.virtual_size, s.raw_size)
            if s.virtual_address <= rva < s.virtual_address + size:
                return s.raw_pointer + (rva - s.virtual_address)
        if rva < (self.sections[0].raw_pointer if self.sections else len(self.data)):
            return rva  # header region maps 1:1
        return None

    # -- overlay (reference-parity computation) ------------------------------------
    def overlay_offset(self, include_data_directories: bool = True) -> Optional[int]:
        largest = (0, 0)
        file_size = len(self.data)

        def grow(candidate):
            nonlocal largest
            if sum(candidate) <= file_size and sum(candidate) > sum(largest):
                largest = candidate

        grow((self.opt_offset, self.size_of_optional_header))
        for s in self.sections:
            grow((s.raw_pointer, s.raw_size))
        if include_data_directories:
            for idx, (rva, size) in enumerate(self.data_directories):
                if not rva and not size:
                    continue
                if idx == DIR_SECURITY:
                    grow((rva, size))  # security dir stores a file offset
                else:
                    offset = self.rva_to_offset(rva)
                    if offset is not None:
                        grow((offset, size))
        end = sum(largest)
        return end if file_size > end else None

    def overlay(self) -> Optional[bytes]:
        offset = self.overlay_offset()
        return self.data[offset:] if offset is not None else None

    # -- resources --------------------------------------------------------------
    def resources(self) -> List[Tuple[str, str, bytes]]:
        """[(dirtype, idname, data)] — flattened type/name level walk."""
        if len(self.data_directories) <= DIR_RESOURCE:
            return []
        rsrc_rva, rsrc_size = self.data_directories[DIR_RESOURCE]
        if not rsrc_rva or not rsrc_size:
            return []
        base = self.rva_to_offset(rsrc_rva)
        if base is None:
            return []
        out = []

        def read_dir(offset: int):
            n_named, n_id = struct.unpack_from("<HH", self.data, offset + 12)
            entries = []
            for i in range(n_named + n_id):
                name, value = struct.unpack_from("<II", self.data, offset + 16 + i * 8)
                entries.append((name, value))
            return entries

        try:
            for type_id, type_val in read_dir(base):
                dirtype = RESOURCE_TYPES.get(type_id & 0x7FFFFFFF, str(type_id & 0x7FFFFFFF))
                if not type_val & 0x80000000:
                    continue
                for res_id, res_val in read_dir(base + (type_val & 0x7FFFFFFF)):
                    idname = str(res_id & 0x7FFFFFFF)
                    if res_val & 0x80000000:
                        lang_entries = read_dir(base + (res_val & 0x7FFFFFFF))
                        if not lang_entries:
                            continue
                        data_entry_off = base + (lang_entries[0][1] & 0x7FFFFFFF)
                    else:
                        data_entry_off = base + res_val
                    data_rva, size = struct.unpack_from("<II", self.data, data_entry_off)
                    data_off = self.rva_to_offset(data_rva)
                    if data_off is None:
                        continue
                    out.append((dirtype, idname, self.data[data_off:data_off + size]))
        except struct.error:
            return out
        return out


    # -- sections / address mapping extras (pefileutils.py:32-144) -------------
    def section_data(self, name: str) -> Optional[bytes]:
        """Raw bytes of the named section (pefileutils.obtain_section_data)."""
        for s in self.sections:
            if s.name == name:
                return self.data[s.raw_pointer:s.raw_pointer + s.raw_size]
        return None

    def offset_to_rva(self, offset: int) -> Optional[int]:
        """File offset -> memory RVA (pefileutils.obtain_memory_offset)."""
        for s in self.sections:
            if s.raw_pointer <= offset < s.raw_pointer + s.raw_size:
                return s.virtual_address + (offset - s.raw_pointer)
        return None

    def _cstr_at_rva(self, rva: int) -> Optional[str]:
        off = self.rva_to_offset(rva)
        if off is None:
            return None
        end = self.data.find(b"\x00", off)
        if end <= off:
            return None
        return self.data[off:end].decode("ascii", "backslashreplace")

    # -- export / import tables (pefileutils.py:170-268) -----------------------
    def exports(self) -> List[str]:
        """Export names (pefileutils.obtain_exports_list)."""
        if not self.data_directories:
            return []
        rva, size = self.data_directories[0]
        off = self.rva_to_offset(rva) if rva and size else None
        if off is None or off + 40 > len(self.data):
            return []
        # +24 NumberOfNames, +28 AddressOfFunctions (skipped), +32 AddressOfNames
        n_names, names_rva = struct.unpack_from("<I4xI", self.data, off + 24)
        names_off = self.rva_to_offset(names_rva)
        if names_off is None:
            return []
        out = []
        for i in range(min(n_names, 8192)):
            pos = names_off + 4 * i
            if pos + 4 > len(self.data):
                break
            (name_rva,) = struct.unpack_from("<I", self.data, pos)
            name = self._cstr_at_rva(name_rva)
            if name:
                out.append(name)
        return out

    def imports(self) -> Dict[str, List[str]]:
        """{dll: [imported names]} from the import directory
        (pefileutils.obtain_imported_dlls / obtain_imports_list)."""
        out: Dict[str, List[str]] = {}
        if len(self.data_directories) <= 1:
            return out
        rva, size = self.data_directories[1]
        base = self.rva_to_offset(rva) if rva and size else None
        if base is None:
            return out
        ptr = 8 if self.is_64bit else 4
        ordinal_flag = 1 << (ptr * 8 - 1)
        for i in range(256):  # descriptor walk, zero-terminated
            d = base + i * 20
            if d + 20 > len(self.data):
                break
            oft, _ts, _fwd, name_rva, ft = struct.unpack_from("<IIIII", self.data, d)
            if not (oft or name_rva or ft):
                break
            dll = self._cstr_at_rva(name_rva)
            if not dll:
                continue
            names: List[str] = []
            thunk_off = self.rva_to_offset(oft or ft)
            if thunk_off is not None:
                for j in range(8192):
                    t = thunk_off + j * ptr
                    if t + ptr > len(self.data):
                        break
                    (entry,) = struct.unpack_from(
                        "<Q" if self.is_64bit else "<I", self.data, t)
                    if not entry:
                        break
                    if entry & ordinal_flag:
                        names.append(f"ordinal_{entry & 0xFFFF}")
                        continue
                    # hint/name: 2-byte hint then the NUL-terminated name
                    name = self._cstr_at_rva((entry & (ordinal_flag - 1)) + 2)
                    if name:
                        names.append(name)
            out[dll] = names
        return out

    def is_imported(self, dll_name: str, func_name: str) -> bool:
        """pefileutils.is_imported (case-insensitive dll match)."""
        for dll, names in self.imports().items():
            if dll.lower() == dll_name.lower():
                return func_name in names
        return False

    # -- original filename recovery (pefileutils.py:350-418) -------------------
    def export_name(self) -> Optional[str]:
        """DLL name from the export directory
        (pefileutils._obtain_exportdir_fname)."""
        if not self.data_directories:
            return None
        rva, size = self.data_directories[0]  # IMAGE_DIRECTORY_ENTRY_EXPORT
        if not rva or not size:
            return None
        off = self.rva_to_offset(rva)
        if off is None or off + 40 > len(self.data):
            return None
        (name_rva,) = struct.unpack_from("<I", self.data, off + 12)
        noff = self.rva_to_offset(name_rva)
        if noff is None:
            return None
        end = self.data.find(b"\x00", noff)
        if end <= noff:
            return None
        return self.data[noff:end].decode("ascii", "backslashreplace")

    def version_original_filename(self) -> Optional[str]:
        """OriginalFilename from the RT_VERSION StringFileInfo
        (pefileutils._obtain_exif_fname)."""
        for dirtype, _idname, blob in self.resources():
            if dirtype != "RT_VERSION":
                continue
            found = _vs_find_string(blob, 0, len(blob), "OriginalFilename")
            if found:
                return found
        return None

    def original_filename(self, def_stub: str, use_arch: bool = False) -> str:
        """pefileutils.obtain_original_filename (pefileutils.py:386-418):
        export-dir name, else version-info OriginalFilename, else
        '<def_stub>_<arch><ext>'."""
        import pathlib

        filename = self.export_name() or self.version_original_filename()
        if filename:
            if use_arch:
                p = pathlib.PurePath(filename)
                return f"{p.stem}_{self.architecture}{p.suffix}"
            return filename
        return f"{def_stub}_{self.architecture}{self.file_ext()}"


def _vs_find_string(data: bytes, start: int, end: int, target: str) -> Optional[str]:
    """Depth-first search of the VS_VERSIONINFO block tree for a string
    value named ``target`` (wLength/wValueLength/wType/szKey layout;
    32-bit padding relative to the resource data start)."""
    offset = start
    while offset + 6 <= end:
        w_length, w_value_length, w_type = struct.unpack_from("<HHH", data, offset)
        if w_length < 6 or offset + w_length > end:
            return None
        block_end = offset + w_length
        k_end = offset + 6
        while k_end + 2 <= block_end and data[k_end:k_end + 2] != b"\x00\x00":
            k_end += 2
        key = data[offset + 6:k_end].decode("utf-16-le", "replace")
        val_off = k_end + 2
        val_off += (-val_off) % 4
        val_bytes = w_value_length * 2 if w_type == 1 else w_value_length
        if key == target and w_type == 1 and w_value_length:
            raw = data[val_off:val_off + val_bytes]
            return raw.decode("utf-16-le", "replace").rstrip("\x00") or None
        child_start = val_off + val_bytes
        child_start += (-child_start) % 4
        found = _vs_find_string(data, child_start, block_end, target)
        if found:
            return found
        offset = block_end + ((-block_end) % 4)
    return None


def build_version_info(original_filename: str) -> bytes:
    """Fixture: minimal VS_VERSIONINFO carrying one StringFileInfo ->
    StringTable -> String(OriginalFilename) chain (RT_VERSION payload)."""
    def block(key: str, w_type: int, value: bytes, children: bytes,
              value_words: Optional[int] = None) -> bytes:
        szkey = key.encode("utf-16-le") + b"\x00\x00"
        head_len = 6 + len(szkey)
        pad1 = (-head_len) % 4
        val_pad = (-(head_len + pad1 + len(value))) % 4
        total = head_len + pad1 + len(value) + val_pad + len(children)
        w_value = value_words if value_words is not None else len(value)
        return (struct.pack("<HHH", total, w_value, w_type) + szkey
                + b"\x00" * pad1 + value + b"\x00" * val_pad + children)

    val = original_filename.encode("utf-16-le") + b"\x00\x00"
    s = block("OriginalFilename", 1, val, b"", value_words=len(val) // 2)
    table = block("040904b0", 1, b"", s, value_words=0)
    sfi = block("StringFileInfo", 1, b"", table, value_words=0)
    return block("VS_VERSION_INFO", 0, b"", sfi, value_words=0)


def parse_pe(data: bytes) -> Optional[MiniPE]:
    try:
        return MiniPE(data)
    except (ValueError, struct.error, IndexError):
        return None


# -- fixture builder -----------------------------------------------------------

def build_pe(
    payload: bytes = b"\x90" * 64,
    machine: int = MACHINE_I386,
    timestamp: int = 1577836800,  # 2020-01-01T00:00:00Z
    dll: bool = False,
    overlay: bytes = b"",
    resources: Optional[List[Tuple[int, int, bytes]]] = None,
    export_name: Optional[bytes] = None,
    exports: Optional[List[bytes]] = None,
    imports: Optional[Dict[bytes, List[bytes]]] = None,
) -> bytes:
    """Deterministic minimal PE: one .text section with ``payload``,
    optional .rsrc section with [(type_id, res_id, data)], optional
    .edata section carrying ``export_name`` as the export-dir DLL name
    plus an ``exports`` name table, optional .idata import directory
    {dll: [func, ...]}, optional overlay."""
    is64 = machine == MACHINE_AMD64
    align = 0x200
    valign = 0x1000

    def pad(b: bytes, n: int) -> bytes:
        return b + b"\x00" * (-len(b) % n)

    sections = [(b".text", pad(payload, align))]
    rsrc_raw = b""
    if resources:
        rsrc_raw = _build_rsrc(resources, rsrc_rva=valign * 2)
        sections.append((b".rsrc", pad(rsrc_raw, align)))
    edata_raw = b""
    edata_va = 0
    if export_name or exports:
        edata_va = valign * (len(sections) + 1)
        names = list(exports or [])
        n = len(names)
        funcs_off = 40
        names_off = funcs_off + 4 * n
        ords_off = names_off + 4 * n
        dllname_off = ords_off + 2 * n
        body = bytearray()
        body += b"\x00" * (4 * n)                       # AddressOfFunctions
        names_array_pos = len(body)
        body += b"\x00" * (4 * n)                       # AddressOfNames (patched)
        for i in range(n):
            body += struct.pack("<H", i)                # ordinals
        body += (export_name or b"lib.dll") + b"\x00"
        for i, nm in enumerate(names):
            struct.pack_into("<I", body, names_array_pos + 4 * i,
                             edata_va + 40 + len(body))
            body += nm + b"\x00"
        # IMAGE_EXPORT_DIRECTORY (40 bytes)
        edata_raw = struct.pack(
            "<IIHHIIIIIII", 0, 0, 0, 0,
            edata_va + 40 + dllname_off - 40,           # Name RVA
            1, n, n,
            edata_va + 40 + funcs_off - 40,             # AddressOfFunctions
            edata_va + 40 + names_off - 40,             # AddressOfNames
            edata_va + 40 + ords_off - 40,              # AddressOfNameOrdinals
        ) + bytes(body)
        sections.append((b".edata", pad(edata_raw, align)))
    idata_raw = b""
    idata_va = 0
    if imports:
        idata_va = valign * (len(sections) + 1)
        ptr = 8 if is64 else 4
        dlls = list(imports.items())
        descs_size = (len(dlls) + 1) * 20
        body = bytearray(descs_size)
        thunk_rvas = []
        for dll, funcs in dlls:
            thunk_rvas.append(idata_va + len(body))
            body += b"\x00" * ((len(funcs) + 1) * ptr)
        hint_rvas = {}
        for dll, funcs in dlls:
            for fn in funcs:
                hint_rvas[(dll, fn)] = idata_va + len(body)
                body += b"\x00\x00" + fn + b"\x00"
        dll_rvas = {}
        for dll, _funcs in dlls:
            dll_rvas[dll] = idata_va + len(body)
            body += dll + b"\x00"
        for i, (dll, funcs) in enumerate(dlls):
            struct.pack_into("<IIIII", body, i * 20,
                             thunk_rvas[i], 0, 0, dll_rvas[dll], thunk_rvas[i])
            toff = thunk_rvas[i] - idata_va
            for j, fn in enumerate(funcs):
                struct.pack_into("<Q" if is64 else "<I", body, toff + j * ptr,
                                 hint_rvas[(dll, fn)])
        idata_raw = bytes(body)
        sections.append((b".idata", pad(idata_raw, align)))

    n_sections = len(sections)
    size_opt = 240 if is64 else 224
    headers_size = 0x80 + 24 + size_opt + n_sections * 40
    headers_size = (headers_size + align - 1) // align * align

    # section table + raw layout
    raw_ptr = headers_size
    sec_entries = []
    raws = []
    for i, (name, raw) in enumerate(sections):
        va = valign * (i + 1)
        sec_entries.append((name, len(raw), va, len(raw), raw_ptr))
        raws.append(raw)
        raw_ptr += len(raw)

    dos = bytearray(0x80)
    dos[:2] = b"MZ"
    struct.pack_into("<I", dos, 0x3C, 0x80)
    coff = struct.pack(
        "<4sHHIIIHH", b"PE\x00\x00", machine, n_sections, timestamp, 0, 0,
        size_opt, (CHAR_DLL if dll else 0) | 0x0102,  # executable | 32bit-ish
    )
    opt = bytearray(size_opt)
    struct.pack_into("<H", opt, 0, PE32PLUS_MAGIC if is64 else PE32_MAGIC)
    # entry point / image base / alignments (loader plausibility)
    struct.pack_into("<I", opt, 16, valign)              # AddressOfEntryPoint
    struct.pack_into("<I", opt, 32, valign)              # SectionAlignment
    struct.pack_into("<I", opt, 36, align)               # FileAlignment
    size_of_image = valign * (n_sections + 1)
    struct.pack_into("<I", opt, 56, size_of_image)
    struct.pack_into("<I", opt, 60, headers_size)        # SizeOfHeaders
    dd_offset = 112 if is64 else 96
    struct.pack_into("<I", opt, dd_offset - 4, 16)       # NumberOfRvaAndSizes
    if resources:
        struct.pack_into("<II", opt, dd_offset + DIR_RESOURCE * 8,
                         valign * 2, len(rsrc_raw))
    if export_name or exports:
        struct.pack_into("<II", opt, dd_offset + 0 * 8,
                         edata_va, len(edata_raw))
    if imports:
        struct.pack_into("<II", opt, dd_offset + 1 * 8,
                         idata_va, len(idata_raw))

    sec_table = b""
    for name, vsize, va, raw_size, ptr in sec_entries:
        entry = bytearray(40)
        entry[:len(name)] = name
        struct.pack_into("<IIII", entry, 8, vsize, va, raw_size, ptr)
        struct.pack_into("<I", entry, 36, 0x60000020)  # code|exec|read
        sec_table += bytes(entry)

    header = pad(bytes(dos) + coff + bytes(opt) + sec_table, align)
    header = header + b"\x00" * (headers_size - len(header))
    return header + b"".join(raws) + overlay


def _build_rsrc(resources: List[Tuple[int, int, bytes]], rsrc_rva: int) -> bytes:
    """Three-level resource directory (type -> id -> lang) + data blobs."""
    def directory(entries: List[Tuple[int, int]]) -> bytes:
        head = struct.pack("<IIHHHH", 0, 0, 0, 0, 0, len(entries))
        return head + b"".join(struct.pack("<II", i, v) for i, v in entries)

    n = len(resources)
    root_size = 16 + n * 8
    type_dir_size = 16 + 8
    lang_dir_size = 16 + 8
    data_entry_size = 16

    type_dirs_base = root_size
    lang_dirs_base = type_dirs_base + n * type_dir_size
    data_entries_base = lang_dirs_base + n * lang_dir_size
    blobs_base = data_entries_base + n * data_entry_size

    root_entries = []
    type_dirs = b""
    lang_dirs = b""
    data_entries = b""
    blobs = b""
    blob_off = blobs_base
    for i, (type_id, res_id, blob) in enumerate(resources):
        root_entries.append((type_id, 0x80000000 | (type_dirs_base + i * type_dir_size)))
        type_dirs += directory(
            [(res_id, 0x80000000 | (lang_dirs_base + i * lang_dir_size))])
        lang_dirs += directory([(0x409, data_entries_base + i * data_entry_size)])
        data_entries += struct.pack("<IIII", rsrc_rva + blob_off, len(blob), 0, 0)
        blobs += blob
        blob_off += len(blob)
    return directory(root_entries) + type_dirs + lang_dirs + data_entries + blobs
