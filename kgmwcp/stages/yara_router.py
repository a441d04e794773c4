"""Real YARA rule-file ingestion (P10 full form) — a subset compiler.

The reference routes files by compiling a YARA rule repo and matching
every input: rule files carrying an ``mwcp = "Parser"`` meta field map a
signature hit to the parsers to run (``mwcp/runner.py:158-209``
``compile_rules`` / ``iter_parsers``; files without any ``mwcp=`` meta
are ignored, rule files that fail to compile are warned and skipped).

Spark-first re-expression: instead of shipping a YARA engine to every
executor, each rule's strings+condition are COMPILED INTO COLUMN
PREDICATES over the raw payload — the whole match runs inside
whole-stage codegen, exactly like the built-in signature router
(stages/router.py), and a repo with thousands of rules would become a
broadcast join against a prefix-keyed signature dim at the same stage
boundary.

Supported subset (everything a magic/at-offset routing rule uses):

- ``strings``: text strings (``ascii`` / ``wide`` / ``nocase``
  modifiers), hex strings with ``??`` wildcards (wildcards only under an
  anchored ``$x at N`` condition, where the fixed fragments become
  byte-at-offset checks), and ``/regex/`` strings (matched over the
  latin-1 decode of the payload — a bijective byte<->char mapping, so
  byte patterns survive).
- ``condition``: ``$x``, ``$x at N``, ``and`` / ``or`` / ``not``,
  parentheses, ``any of them`` / ``all of them`` / ``N of them``,
  ``uint8/16/32(N) ==/!= V`` (little-endian, as in YARA), ``filesize``
  comparisons, ``true`` / ``false``.

Anything else — ``[n-m]`` jumps, hex alternatives, ``fullword``,
``xor``/``base64`` modifiers, ``#count``/``@offset``/``!length``
expressions, ``for`` loops, external variables, module imports — makes
the RULE warn-and-skip (reported in the compile result), mirroring the
reference's warn-and-skip of uncompilable rule files.  A skipped rule
never silently degrades routing: rows simply keep a NULL route and fall
back to the engine's full identify cascade, the same fallback every
routed row already has.
"""

from __future__ import annotations

import logging
import os
import re
import struct
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgmwcp.schema import ROUTE_COLUMN

__all__ = ["compile_yara_repo", "route_samples_yara", "CompiledYara"]

logger = logging.getLogger(__name__)


class UnsupportedYara(Exception):
    """Raised during compilation when a rule uses syntax outside the
    supported subset; the rule is skipped with this reason."""


# -- string specs --------------------------------------------------------------


@dataclass
class _StringSpec:
    ident: str
    kind: str                      # "text" | "hex" | "regex"
    # text: raw python string; regex: pattern source
    text: str = ""
    # hex: fragments of (offset_delta, bytes) between ?? wildcards
    fragments: List[Tuple[int, bytes]] = field(default_factory=list)
    total_len: int = 0             # hex: full pattern length incl. wildcards
    nocase: bool = False
    wide: bool = False
    ascii_: bool = True

    @property
    def has_wildcards(self) -> bool:
        return self.kind == "hex" and (
            len(self.fragments) != 1 or self.fragments[0][0] != 0
            or len(self.fragments[0][1]) != self.total_len)


@dataclass
class CompiledYara:
    """One routable rule: name, the mwcp parser mapping, and a Column
    builder (content, path) -> BooleanColumn."""
    name: str
    parsers: List[str]
    build: Callable[[Column, Column], Column]
    source_file: str


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"'}


def _unescape(raw: str) -> str:
    out, i = [], 0
    while i < len(raw):
        ch = raw[i]
        if ch == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt == "x" and i + 3 < len(raw):
                out.append(chr(int(raw[i + 2:i + 4], 16)))
                i += 4
                continue
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def _parse_hex_body(body: str) -> Tuple[List[Tuple[int, bytes]], int]:
    """'AA BB ?? CC' -> fragments [(0, b'\\xaa\\xbb'), (3, b'\\xcc')], 4."""
    toks = body.split()
    frags: List[Tuple[int, bytes]] = []
    cur: List[int] = []
    cur_start = 0
    pos = 0
    for tok in toks:
        if tok == "??":
            if cur:
                frags.append((cur_start, bytes(cur)))
                cur = []
            pos += 1
            continue
        if re.fullmatch(r"[0-9A-Fa-f]{2}", tok):
            if not cur:
                cur_start = pos
            cur.append(int(tok, 16))
            pos += 1
            continue
        # jumps [n-m], alternatives ( | ), nibble wildcards A? — out of subset
        raise UnsupportedYara(f"hex token {tok!r}")
    if cur:
        frags.append((cur_start, bytes(cur)))
    if not frags:
        raise UnsupportedYara("hex string with no fixed bytes")
    return frags, pos


def _parse_strings(section: str) -> Dict[str, _StringSpec]:
    specs: Dict[str, _StringSpec] = {}
    # one declaration per line is the conventional layout
    for line in section.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        m = re.match(r"\$(\w*)\s*=\s*(.*)$", line)
        if not m:
            raise UnsupportedYara(f"unparseable strings line: {line!r}")
        ident, rhs = m.group(1), m.group(2).strip()
        spec = _StringSpec(ident=ident, kind="")
        if rhs.startswith('"'):
            em = re.match(r'"((?:\\.|[^"\\])*)"\s*(.*)$', rhs)
            if not em:
                raise UnsupportedYara(f"unterminated text string: {line!r}")
            spec.kind = "text"
            spec.text = _unescape(em.group(1))
            mods = em.group(2).split()
        elif rhs.startswith("{"):
            em = re.match(r"\{([^}]*)\}\s*(.*)$", rhs)
            if not em:
                raise UnsupportedYara(f"unterminated hex string: {line!r}")
            spec.kind = "hex"
            spec.fragments, spec.total_len = _parse_hex_body(em.group(1))
            mods = em.group(2).split()
        elif rhs.startswith("/"):
            em = re.match(r"/((?:\\.|[^/\\])+)/\s*(.*)$", rhs)
            if not em:
                raise UnsupportedYara(f"unterminated regex string: {line!r}")
            spec.kind = "regex"
            spec.text = em.group(1)
            mods = em.group(2).split()
        else:
            raise UnsupportedYara(f"unknown string form: {line!r}")
        # collect the full modifier SET before applying: the one-pass
        # version made 'ascii wide' order-dependent ('wide' clobbered
        # ascii_=True set a token earlier — review finding)
        mods_clean = []
        for mod in mods:
            mod = mod.strip()
            if not mod or mod.startswith("//"):
                break
            mods_clean.append(mod)
        unknown = [m for m in mods_clean
                   if m not in ("nocase", "wide", "ascii")]
        if unknown:
            raise UnsupportedYara(f"string modifier {unknown[0]!r}")
        spec.nocase = "nocase" in mods_clean
        if "wide" in mods_clean:
            # YARA: 'wide' alone matches only utf-16le; 'wide ascii' (in
            # either order) matches both
            spec.wide = True
            spec.ascii_ = "ascii" in mods_clean
        specs[ident] = spec
    return specs


# -- per-string Column builders -------------------------------------------------


def _latin1(c: Column) -> Column:
    # bijective bytes<->chars: regex/nocase matching over bytes
    return F.decode(c, "ISO-8859-1")


def _text_needles(spec: _StringSpec) -> List[bytes]:
    needles = []
    if spec.ascii_:
        needles.append(spec.text.encode("latin-1"))
    if spec.wide:
        needles.append(spec.text.encode("utf-16-le"))
    return needles


def _check_containable(spec: _StringSpec) -> None:
    """Parse-time guard: specs a plain contains cannot express must skip
    the rule at COMPILE time (no SparkSession involved), not when the
    plan is built."""
    if spec.kind == "hex" and spec.has_wildcards:
        raise UnsupportedYara(
            f"${spec.ident}: wildcard hex string used unanchored "
            f"(only '$x at N' conditions support ??)")


def _contains_col(c: Column, spec: _StringSpec) -> Column:
    if spec.kind == "hex":
        return F.contains(c, F.lit(spec.fragments[0][1]))
    if spec.kind == "regex":
        pat = ("(?is)" if spec.nocase else "(?s)") + spec.text
        return _latin1(c).rlike(pat)
    # text
    if spec.nocase:
        hay = F.lower(_latin1(c))
        conds = [
            F.contains(hay, F.lit(n.decode("latin-1").lower()))
            for n in _text_needles(spec)
        ]
    else:
        conds = [F.contains(c, F.lit(n)) for n in _text_needles(spec)]
    out = conds[0]
    for extra in conds[1:]:
        out = out | extra
    return out


def _at_col(c: Column, spec: _StringSpec, offset: int) -> Column:
    """``$x at N`` — byte-at-offset equality (1-based substring)."""
    if spec.kind == "hex":
        cond = None
        for delta, frag in spec.fragments:
            piece = F.substring(c, offset + delta + 1, len(frag)) == F.lit(frag)
            cond = piece if cond is None else (cond & piece)
        return cond
    if spec.kind == "regex":
        raise UnsupportedYara(f"${spec.ident}: regex string with 'at'")
    if spec.nocase:
        conds = [
            F.lower(F.substring(_latin1(c), offset + 1, len(n)))
            == F.lit(n.decode("latin-1").lower())
            for n in _text_needles(spec)
        ]
    else:
        conds = [
            F.substring(c, offset + 1, len(n)) == F.lit(n)
            for n in _text_needles(spec)
        ]
    out = conds[0]
    for extra in conds[1:]:
        out = out | extra
    return out


# -- condition compiler ----------------------------------------------------------

_TOKEN_RX = re.compile(
    r"\$\w*|\(|\)|==|!=|<=|>=|<|>|0x[0-9A-Fa-f]+|\d+|\w+"
)

_CMPS = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


class _CondParser:
    """Recursive-descent compiler: condition tokens -> Column builder.

    The result is a closure over (content, path) so one parsed rule can
    be applied to any DataFrame's columns.
    """

    def __init__(self, tokens: List[str], specs: Dict[str, _StringSpec]):
        self.toks = tokens
        self.i = 0
        self.specs = specs

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise UnsupportedYara("unexpected end of condition")
        self.i += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise UnsupportedYara(f"expected {tok!r}, got {got!r}")

    def _int(self) -> int:
        tok = self.next()
        try:
            return int(tok, 0)
        except ValueError:
            raise UnsupportedYara(f"expected integer, got {tok!r}")

    def _spec(self, tok: str) -> _StringSpec:
        ident = tok[1:]
        if ident not in self.specs:
            raise UnsupportedYara(f"undefined string {tok}")
        return self.specs[ident]

    # expr := and_expr ('or' and_expr)*
    def parse(self):
        out = self._and()
        while self.peek() == "or":
            self.next()
            rhs = self._and()
            out = (lambda a, b: lambda c, p: a(c, p) | b(c, p))(out, rhs)
        return out

    def _and(self):
        out = self._unary()
        while self.peek() == "and":
            self.next()
            rhs = self._unary()
            out = (lambda a, b: lambda c, p: a(c, p) & b(c, p))(out, rhs)
        return out

    def _unary(self):
        if self.peek() == "not":
            self.next()
            inner = self._unary()
            return lambda c, p: ~inner(c, p)
        return self._primary()

    def _of_them(self, quant) -> Callable[[Column, Column], Column]:
        """any/all/N of them — quant is 'any' | 'all' | int."""
        self.expect("of")
        if self.next() != "them":
            raise UnsupportedYara("only 'of them' sets are supported")
        specs = list(self.specs.values())
        if not specs:
            raise UnsupportedYara("'of them' with no strings")
        for s in specs:
            _check_containable(s)

        def build(c: Column, p: Column) -> Column:
            conds = [_contains_col(c, s) for s in specs]
            if quant == "any":
                out = conds[0]
                for x in conds[1:]:
                    out = out | x
                return out
            if quant == "all":
                out = conds[0]
                for x in conds[1:]:
                    out = out & x
                return out
            # N of them: sum the boolean ints
            total = conds[0].cast("int")
            for x in conds[1:]:
                total = total + x.cast("int")
            return total >= F.lit(int(quant))

        return build

    def _primary(self):
        tok = self.next()
        if tok == "(":
            inner = self.parse()
            self.expect(")")
            return inner
        if tok == "true":
            return lambda c, p: F.lit(True)
        if tok == "false":
            return lambda c, p: F.lit(False)
        if tok in ("any", "all"):
            return self._of_them(tok)
        if tok.startswith("$"):
            spec = self._spec(tok)
            if self.peek() == "at":
                self.next()
                offset = self._int()
                if spec.kind == "regex":
                    raise UnsupportedYara(
                        f"${spec.ident}: regex string with 'at'")
                return lambda c, p, s=spec, o=offset: _at_col(c, s, o)
            _check_containable(spec)
            return lambda c, p, s=spec: _contains_col(c, s)
        if tok in ("uint8", "uint16", "uint32"):
            width = {"uint8": 1, "uint16": 2, "uint32": 4}[tok]
            self.expect("(")
            offset = self._int()
            self.expect(")")
            op = self.next()
            if op not in ("==", "!="):
                raise UnsupportedYara(f"uint comparison {op!r} (only ==/!=)")
            value = self._int()
            if value >= (1 << (8 * width)):
                # YARA: a uint8 can never equal 0x4142 — the comparison
                # is statically false, not a truncated-byte match
                # (review finding: struct.pack()[:width] silently
                # truncated and matched the wrong files)
                return (lambda c, p: F.lit(False)) if op == "==" else (
                    # != an impossible value is true ONLY for a defined
                    # read (YARA undefined-at-EOF semantics, below)
                    lambda c, p: F.length(c) >= offset + width)
            magic = struct.pack("<I", value)[:width]  # little-endian, as YARA
            # a read past EOF is UNDEFINED in YARA and makes the whole
            # comparison false — for both == and !=.  F.substring on a
            # short blob yields a short/empty slice, which would make
            # ~eq() spuriously TRUE on truncated files (review finding),
            # so both arms carry the defined-read guard.
            defined = lambda c: F.length(c) >= offset + width  # noqa: E731
            eq = lambda c, p: (  # noqa: E731
                defined(c)
                & (F.substring(c, offset + 1, width) == F.lit(magic)))
            if op == "==":
                return eq
            return lambda c, p: (
                defined(c)
                & (F.substring(c, offset + 1, width) != F.lit(magic)))
        if tok == "filesize":
            op = self.next()
            if op not in _CMPS:
                raise UnsupportedYara(f"filesize comparison {op!r}")
            value = self._int()
            cmp_fn = _CMPS[op]
            return lambda c, p: cmp_fn(F.length(c), F.lit(value))
        if re.fullmatch(r"\d+|0x[0-9A-Fa-f]+", tok):
            return self._of_them(int(tok, 0))
        raise UnsupportedYara(f"condition token {tok!r}")


# -- rule-file scanner -----------------------------------------------------------


def _strip_comments(src: str) -> str:
    """Remove // and /* */ comments, preserving string/regex literals.

    A ``/`` directly after ``=`` (the only place a YARA regex literal
    can start in the subset we read: ``$r = /…/``) opens a regex
    literal scanned to its unescaped closing ``/`` — otherwise a
    pattern like ``/evil\\.com\\/*/`` would read as a block comment
    opener and swallow every later rule in the file (review finding)."""
    out, i, n = [], 0, len(src)
    prev = ""  # last non-whitespace char emitted
    while i < n:
        ch = src[i]
        if ch == '"':
            j = i + 1
            while j < n and src[j] != '"':
                j += 2 if src[j] == "\\" else 1
            out.append(src[i:j + 1])
            prev = '"'
            i = j + 1
        elif ch == "/" and prev == "=":
            j = i + 1
            while j < n and src[j] != "/" and src[j] != "\n":
                j += 2 if src[j] == "\\" else 1
            out.append(src[i:j + 1])
            prev = "/"
            i = j + 1
        elif ch == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
        elif ch == "/" and i + 1 < n and src[i + 1] == "*":
            i = src.find("*/", i + 2)
            i = n if i < 0 else i + 2
        else:
            out.append(ch)
            if not ch.isspace():
                prev = ch
            i += 1
    return "".join(out)


def _split_rules(src: str) -> List[Tuple[str, str]]:
    """-> [(rule_name, body)] with brace matching that skips string
    literals (a text string may contain '{')."""
    rules = []
    for m in re.finditer(r"\brule\s+(\w+)[^{]*\{", src):
        name = m.group(1)
        depth, i, n = 1, m.end(), len(src)
        while i < n and depth:
            ch = src[i]
            if ch == '"':
                i += 1
                while i < n and src[i] != '"':
                    i += 2 if src[i] == "\\" else 1
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
            i += 1
        rules.append((name, src[m.end():i - 1]))
    return rules


_SECTION_RX = re.compile(r"^\s*(meta|strings|condition)\s*:\s*$|"
                         r"\b(meta|strings|condition)\s*:", re.M)


def _split_sections(body: str) -> Dict[str, str]:
    marks = [(m.start(), (m.group(1) or m.group(2)), m.end())
             for m in _SECTION_RX.finditer(body)]
    sections: Dict[str, str] = {}
    for idx, (_, name, end) in enumerate(marks):
        stop = marks[idx + 1][0] if idx + 1 < len(marks) else len(body)
        sections[name] = body[end:stop]
    return sections


def _compile_rule(name: str, body: str, source_file: str
                  ) -> Optional[CompiledYara]:
    sections = _split_sections(body)
    meta = sections.get("meta", "")
    mm = re.search(r'\bmwcp\s*=\s*"([^"]*)"', meta)
    if not mm:
        return None  # reference ignores rules without mwcp meta
    parsers = [p.strip() for p in mm.group(1).split(",") if p.strip()]
    if not parsers:
        # mwcp = "" names no parser: nothing to route to — ignore like a
        # missing meta (a [] would crash route_samples_yara on
        # parsers[0] at plan build, review finding)
        return None
    specs = _parse_strings(sections.get("strings", ""))
    cond_src = sections.get("condition", "").strip()
    if not cond_src:
        raise UnsupportedYara("missing condition")
    parser = _CondParser(_TOKEN_RX.findall(cond_src), specs)
    builder = parser.parse()
    if parser.peek() is not None:
        raise UnsupportedYara(
            f"trailing condition tokens from {parser.peek()!r}")
    return CompiledYara(name=name, parsers=parsers, build=builder,
                        source_file=source_file)


def compile_yara_repo(yara_repo: str
                      ) -> Tuple[List[CompiledYara], List[Tuple[str, str]]]:
    """Compile every ``*.yara`` / ``*.yar`` under ``yara_repo``.

    Returns (compiled rules in file-then-declaration order,
    [(rule_or_file, skip reason)]).  Files without any ``mwcp=`` text are
    ignored outright, like the reference (runner.py:165-169).
    """
    if not os.path.isdir(yara_repo):
        # reference error string, mwcp/runner.py:159-160
        raise RuntimeError(f"Unable to locate: {yara_repo}")
    compiled: List[CompiledYara] = []
    skipped: List[Tuple[str, str]] = []
    paths = sorted(
        os.path.join(root, fn)
        for root, _, files in os.walk(yara_repo)
        for fn in files if fn.endswith((".yara", ".yar"))
    )
    for path in paths:
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError as e:
            skipped.append((path, f"unreadable: {e}"))
            continue
        if not re.search(r"mwcp\s*=", text):
            logger.debug("Ignoring rule file without 'mwcp' metadata: %s",
                         path)
            continue
        for name, body in _split_rules(_strip_comments(text)):
            try:
                rule = _compile_rule(name, body, path)
            except UnsupportedYara as e:
                logger.warning("[Skipping rule] %s (%s): %s", name, path, e)
                skipped.append((name, str(e)))
                continue
            except (ValueError, struct.error) as e:
                # malformed literals inside an otherwise-parsed rule
                # (bad \xGG escape, uint value >= 2^32) must warn-and-
                # skip like any other out-of-subset rule, not abort the
                # whole repo compile (review finding)
                logger.warning("[Skipping rule] %s (%s): malformed: %s",
                               name, path, e)
                skipped.append((name, f"malformed: {e}"))
                continue
            if rule is not None:
                compiled.append(rule)
    return compiled, skipped


def route_samples_yara(samples: DataFrame, rules: List[CompiledYara],
                       content_col: str = "content_bin",
                       path_col: str = "path") -> DataFrame:
    """Add ``sig_matches`` (matching rule names, declaration order — the
    YARA multi-match analogue) and fill a NULL ``route`` with the FIRST
    matching rule's first mwcp parser.  Same contract as the built-in
    router: an input-supplied route wins, no match keeps NULL and auto-
    dispatches, and the whole evaluation is codegen'd Columns."""
    c, p = F.col(content_col), F.col(path_col)
    if rules:
        parts = [
            F.when(r.build(c, p), F.array(F.lit(r.name)))
            .otherwise(F.array().cast("array<string>"))
            for r in rules
        ]
        matches = F.concat(*parts)
        first = None
        for r in rules:
            hit = F.when(r.build(c, p), F.lit(r.parsers[0]))
            first = hit if first is None else F.coalesce(first, hit)
    else:
        matches = F.array().cast("array<string>")
        first = F.lit(None).cast("string")
    out = samples.withColumn("sig_matches", matches)
    if ROUTE_COLUMN in samples.columns:
        routed = F.coalesce(F.col(ROUTE_COLUMN), first)
    else:
        routed = first
    return out.withColumn(ROUTE_COLUMN, routed)
