"""PowerShell string deobfuscation (SURVEY.md T14) — from scratch.

A hand-written recursive-descent parser re-expressing the grammar of the
reference's pyparsing-based ``poshdeob`` (mwcp/utils/poshdeob.py:103-288):

* atoms: quoted strings (backtick escape, doubled-quote escape),
  ``[char]N`` literals, the probable-value ``$variable`` lookup, and
  suppressed ``[string]`` casts
* ``+`` concatenation with arbitrary paren nesting
* ``-f`` format-operator chains
* ``-replace`` / ``-creplace`` / ``.replace()`` chains — regex semantics,
  IGNORECASE except for creplace, only backslash escaped
  (mwcp/utils/poshdeob.py:54-61)
* ``-split`` / ``.split()`` (regex ``re.split``) producing lists
* binary ``-join`` over a (optionally parenthesized) comma list, unary
  ``-join (...)`` and ``[string]::join(...)``
* integer indexing ``expr[i]`` / ``expr[i,j,...]``

Like the reference it is an explicitly best-effort scan-and-rewrite
fixpoint ("makes no promises", mwcp/utils/poshdeob.py:6-7): every
parseable span is replaced by its canonical literal form and the code is
re-scanned until it stops changing (depth bound 32, same as the
reference).  Deliberate divergences from the reference, for stability:

* emitted literals double embedded backticks so a rewritten string
  round-trips through the backtick-escape rule unchanged (the reference
  can corrupt values that contain backticks on the next pass)
* ``str.format`` errors leave the span untouched instead of raising
"""

from __future__ import annotations

import re
from typing import List, Tuple, Union

__all__ = ["deobfuscate", "parse_value"]

MAX_ITERATIONS = 32  # same fixpoint bound as the reference (depth 32)

# Probable values for variables commonly abused by obfuscators — the same
# public lookup the reference ships (mwcp/utils/poshdeob.py:28-37).
_VARIABLE_LOOKUP = {
    "pshome": r"C:\Windows\System32\WindowsPowerShell\v1.0",
    "shellid": "Microsoft.PowerShell",
    "env:public": r"C:\Users\Public",
    "env:comspec": r"C:\Windows\system32\cmd.exe",
    "verbosepreference.tostring()": "SilentlyContinue",
}
# longest-first so $env:comspec wins over a hypothetical shorter prefix
_VARIABLE_KEYS = sorted(_VARIABLE_LOOKUP, key=len, reverse=True)

_WS = " \t\r\n"
_WORD_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")

_Value = Union[str, List[str]]


class _NoMatch(Exception):
    """Internal backtracking signal."""


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in _WS:
        i += 1
    return i


def _match_kw(s: str, i: int, word: str) -> int:
    """Caseless keyword match with a word boundary; returns end or raises."""
    j = i + len(word)
    if s[i:j].lower() != word:
        raise _NoMatch
    if j < len(s) and s[j] in _WORD_CHARS:
        raise _NoMatch  # '-splits' must not match '-split'
    return j


def _parse_string_literal(s: str, i: int) -> Tuple[str, int]:
    """Quoted string: backtick escapes the next char (stripped, matching the
    reference's convertWhitespaceEscapes=False), quote doubling escapes the
    quote, and a lone ``'`'`` / ``"`"`` is the one-backtick string."""
    if i >= len(s) or s[i] not in "'\"":
        raise _NoMatch
    q = s[i]
    if s[i : i + 3] == q + "`" + q:  # reference special case (poshdeob.py:124-126)
        return "`", i + 3
    out = []
    j = i + 1
    while j < len(s):
        c = s[j]
        if c == "`" and j + 1 < len(s):
            out.append(s[j + 1])
            j += 2
            continue
        if c == q:
            if j + 1 < len(s) and s[j + 1] == q:
                out.append(q)
                j += 2
                continue
            return "".join(out), j + 1
        out.append(c)
        j += 1
    raise _NoMatch


def _parse_char(s: str, i: int) -> Tuple[str, int]:
    """``[char]N`` (caseless, whitespace-tolerant) -> chr(N)."""
    if i >= len(s) or s[i] != "[":
        raise _NoMatch
    j = _skip_ws(s, i + 1)
    j = _match_kw(s, j, "char")
    j = _skip_ws(s, j)
    if j >= len(s) or s[j] != "]":
        raise _NoMatch
    j = _skip_ws(s, j + 1)
    k = j
    while k < len(s) and s[k].isdigit():
        k += 1
    if k == j:
        raise _NoMatch
    return chr(int(s[j:k])), k


def _parse_variable(s: str, i: int) -> Tuple[str, int]:
    if i >= len(s) or s[i] != "$":
        raise _NoMatch
    rest = s[i + 1 :]
    low = rest.lower()
    for key in _VARIABLE_KEYS:
        if low.startswith(key):
            return _VARIABLE_LOOKUP[key], i + 1 + len(key)
    raise _NoMatch


def _skip_string_casts(s: str, i: int) -> int:
    """Consume any number of ``[string]`` casts (but not ``[string]::``)."""
    while True:
        j = _skip_ws(s, i)
        if j >= len(s) or s[j] != "[":
            return i
        try:
            k = _skip_ws(s, j + 1)
            k = _match_kw(s, k, "string")
            k = _skip_ws(s, k)
            if k >= len(s) or s[k] != "]":
                return i
            k += 1
            if s[k : k + 2] == "::":
                return i  # [string]::join — not a cast
            i = k
        except _NoMatch:
            return i


def _parse_primary(s: str, i: int) -> Tuple[str, int]:
    """One string-valued atom, optionally [string]-cast and parenthesized."""
    i = _skip_ws(s, i)
    i = _skip_string_casts(s, i)
    i = _skip_ws(s, i)
    if i >= len(s):
        raise _NoMatch
    if s[i] == "(":
        value, j = _parse_expr(s, i + 1)
        if not isinstance(value, str):
            raise _NoMatch  # lists are only valid where the grammar says so
        j = _skip_ws(s, j)
        if j >= len(s) or s[j] != ")":
            raise _NoMatch
        return value, j + 1
    if s[i] in "'\"":
        return _parse_string_literal(s, i)
    if s[i] == "[":
        return _parse_char(s, i)
    if s[i] == "$":
        return _parse_variable(s, i)
    raise _NoMatch


def _parse_concat(s: str, i: int) -> Tuple[str, int]:
    value, i = _parse_primary(s, i)
    while True:
        j = _skip_ws(s, i)
        if j >= len(s) or s[j] != "+":
            return value, i
        try:
            part, k = _parse_primary(s, j + 1)
        except _NoMatch:
            return value, i
        value += part
        i = k


def _parse_comma_list(s: str, i: int) -> Tuple[List[str], int]:
    """``OptionalParen(delimitedList(concat_string))``."""
    i = _skip_ws(s, i)
    if i < len(s) and s[i] == "(":
        try:
            items, j = _parse_comma_list(s, i + 1)
            j = _skip_ws(s, j)
            if j < len(s) and s[j] == ")":
                return items, j + 1
        except _NoMatch:
            pass
    items = []
    value, i = _parse_concat(s, i)
    items.append(value)
    while True:
        j = _skip_ws(s, i)
        if j >= len(s) or s[j] != ",":
            return items, i
        try:
            value, k = _parse_concat(s, j + 1)
        except _NoMatch:
            return items, i
        items.append(value)
        i = k


def _parse_index_suffix(s: str, i: int) -> Tuple[List[int], int]:
    if i >= len(s) or s[i] != "[":
        raise _NoMatch
    j = _skip_ws(s, i + 1)
    indices = []
    while True:
        k = j
        while k < len(s) and s[k].isdigit():
            k += 1
        if k == j:
            raise _NoMatch
        indices.append(int(s[j:k]))
        j = _skip_ws(s, k)
        if j < len(s) and s[j] == ",":
            j = _skip_ws(s, j + 1)
            continue
        break
    if j >= len(s) or s[j] != "]":
        raise _NoMatch
    return indices, j + 1


def _regex_replace(data: str, old: str, new: str, *, creplace: bool) -> str:
    # reference escapes only "\" and uses regex semantics otherwise
    # (mwcp/utils/poshdeob.py:54-61)
    old = old.replace("\\", "\\\\")
    new = new.replace("\\", "\\\\")
    try:
        return re.sub(old, new, data, flags=0 if creplace else re.IGNORECASE)
    except re.error:
        raise _NoMatch


def _parse_method_call(s: str, i: int):
    """``.replace(old, new)`` / ``.creplace`` / ``.split(delim)`` with the
    method name optionally quoted (reference allows ``.'replace'(...)``)."""
    if i >= len(s) or s[i] != ".":
        raise _NoMatch
    j = _skip_ws(s, i + 1)
    quote = ""
    if j < len(s) and s[j] in "'\"":
        quote = s[j]
        j += 1
    for name in ("creplace", "replace", "split"):
        try:
            k = _match_kw(s, j, name)
            break
        except _NoMatch:
            continue
    else:
        raise _NoMatch
    if quote:
        if k >= len(s) or s[k] != quote:
            raise _NoMatch
        k += 1
    k = _skip_ws(s, k)
    if k >= len(s) or s[k] != "(":
        raise _NoMatch
    first, k = _parse_concat(s, k + 1)
    second = None
    if name in ("replace", "creplace"):
        k = _skip_ws(s, k)
        if k >= len(s) or s[k] != ",":
            raise _NoMatch
        second, k = _parse_concat(s, k + 1)
    k = _skip_ws(s, k)
    if k >= len(s) or s[k] != ")":
        raise _NoMatch
    return name, first, second, k + 1


def _parse_expr(s: str, i: int) -> Tuple[_Value, int]:
    """Top-level expression: the reference's ``poss_elements`` alternation
    folded into one operand + postfix-chain loop (each homogeneous chain the
    reference matches per scan pass is a special case of this loop)."""
    i = _skip_ws(s, i)
    if i >= len(s):
        raise _NoMatch

    # unary joins: -join (...) and [string]::join(...)
    for kw in ("-join", "[string]::join"):
        if s[i : i + len(kw)].lower() == kw:
            try:
                j = _match_kw(s, i, kw) if kw == "-join" else i + len(kw)
                j = _skip_ws(s, j)
                if j >= len(s) or s[j] != "(":
                    raise _NoMatch
                items, j = _parse_comma_list(s, j + 1)
                j = _skip_ws(s, j)
                if j >= len(s) or s[j] != ")":
                    raise _NoMatch
                return _chain("".join(items), s, j + 1)
            except _NoMatch:
                pass

    # parenthesized or bare comma list followed by binary -join
    try:
        items, j = _parse_comma_list(s, i)
        if len(items) > 1:
            j2 = _skip_ws(s, j)
            j2 = _match_kw(s, j2, "-join")
            sep, j2 = _parse_concat(s, j2)
            return _chain(sep.join(items), s, j2)
    except _NoMatch:
        pass

    value, i = _parse_concat(s, i)
    return _chain(value, s, i)


def _chain(value: _Value, s: str, i: int) -> Tuple[_Value, int]:
    """Postfix operator chain: -f / -replace / -split / -join / .method / [i]."""
    while True:
        j = _skip_ws(s, i)
        if j >= len(s):
            return value, i
        c = s[j]
        try:
            if c == "-":
                for kw in ("-f", "-creplace", "-replace", "-split", "-join"):
                    try:
                        k = _match_kw(s, j, kw)
                    except _NoMatch:
                        continue
                    if kw == "-f":
                        if not isinstance(value, str):
                            raise _NoMatch
                        params, k = _parse_comma_list(s, k)
                        try:
                            value = value.format(*params)
                        except (IndexError, KeyError, ValueError):
                            raise _NoMatch
                    elif kw in ("-creplace", "-replace"):
                        if not isinstance(value, str):
                            raise _NoMatch
                        old, k = _parse_concat(s, k)
                        k2 = _skip_ws(s, k)
                        if k2 >= len(s) or s[k2] != ",":
                            raise _NoMatch
                        new, k = _parse_concat(s, k2 + 1)
                        value = _regex_replace(
                            value, old, new, creplace=(kw == "-creplace")
                        )
                    elif kw == "-split":
                        delim, k = _parse_concat(s, k)
                        parts = value if isinstance(value, list) else [value]
                        try:
                            value = [p for part in parts for p in re.split(delim, part)]
                        except re.error:
                            raise _NoMatch
                    else:  # -join on the current value
                        sep, k = _parse_concat(s, k)
                        if isinstance(value, list):
                            value = sep.join(value)
                        # a lone string -join sep is the string itself
                    i = k
                    break
                else:
                    return value, i
            elif c == ".":
                name, first, second, k = _parse_method_call(s, j)
                if name in ("replace", "creplace"):
                    if not isinstance(value, str):
                        raise _NoMatch
                    value = _regex_replace(
                        value, first, second, creplace=(name == "creplace")
                    )
                else:  # split
                    parts = value if isinstance(value, list) else [value]
                    try:
                        value = [p for part in parts for p in re.split(first, part)]
                    except re.error:
                        raise _NoMatch
                i = k
            elif c == "[":
                indices, k = _parse_index_suffix(s, j)
                data = value
                try:
                    picked = [data[idx] for idx in indices]
                except IndexError:
                    raise _NoMatch
                value = picked[0] if len(picked) == 1 else picked
                i = k
            else:
                return value, i
        except _NoMatch:
            return value, i


def parse_value(code: str) -> _Value:
    """Parse one expression and return its value (str, or list for splits)
    — the analogue of the reference parser's ``parseString`` doctests."""
    value, end = _parse_expr(code, 0)
    if _skip_ws(code, end) != len(code):
        raise ValueError("trailing unparsed input")
    return value


# --------------------------------------------------------------------------
# scan + rewrite fixpoint
# --------------------------------------------------------------------------

_SCAN_START = set("'\"([$-")


def _format_code_string(string: str) -> str:
    """Emit a value as a PS literal: least-used quote (like the reference's
    _format_code_string), doubled quotes, doubled backticks (stability)."""
    quote = '"' if string.count("'") > string.count('"') else "'"
    body = string.replace("`", "``").replace(quote, quote + quote)
    return quote + body + quote


def _format_result(value: _Value) -> str:
    if isinstance(value, list):
        return "({})".format(", ".join(_format_code_string(v) for v in value))
    return _format_code_string(value)


def _scan(code: str):
    """Yield (start, end, value) for every parseable span, left to right —
    the analogue of the reference's scanString loop."""
    out = []
    i, n = 0, len(code)
    while i < n:
        if code[i] not in _SCAN_START:
            i += 1
            continue
        try:
            value, j = _parse_expr(code, i)
        except _NoMatch:
            i += 1
            continue
        out.append((i, j, value))
        i = j
    return out


def _iter_literals(code: str):
    """All string literals in code, as (raw_span, value)."""
    i, n = 0, len(code)
    while i < n:
        if code[i] in "'\"":
            try:
                value, j = _parse_string_literal(code, i)
                yield code[i:j], value
                i = j
                continue
            except _NoMatch:
                pass
        i += 1


def deobfuscate(code) -> Tuple[str, List[str]]:
    """Rewrite obfuscated constructs to plain literals; collect strings.

    Returns (deobfuscated_code, sorted unique decoded strings that did not
    appear literally in the original code).
    """
    if isinstance(code, bytes):  # reference accepts bytes as latin1
        code = code.decode("latin1")
    original = code
    current = code
    for _ in range(MAX_ITERATIONS):
        matches = _scan(current)
        if not matches:
            break
        pieces = []
        index = 0
        for start, end, value in matches:
            pieces.append(current[index:start])
            pieces.append(_format_result(value))
            index = end
        pieces.append(current[index:])
        rewritten = "".join(pieces)
        if rewritten == current:
            break
        current = rewritten
    decoded = []
    for raw, value in _iter_literals(current):
        if value and raw not in original and value not in original:
            decoded.append(value)
    return current, sorted(set(decoded))
