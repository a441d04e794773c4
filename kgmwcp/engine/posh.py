"""PowerShell string deobfuscation (SURVEY.md T14) — from scratch.

A regex-driven fixpoint rewriter covering the common obfuscation idioms
the reference's pyparsing-based ``poshdeob`` targets (string concat,
``-f`` format operator, ``.replace()`` chains, backtick stripping); like
the reference it is explicitly best-effort ("makes no promises",
mwcp/utils/poshdeob.py:6-7).  Returns the rewritten code plus the decoded
string constants discovered along the way.
"""

from __future__ import annotations

import re
from typing import List, Tuple

__all__ = ["deobfuscate"]

MAX_ITERATIONS = 32  # same fixpoint bound as the reference (depth 32)

# a single-quoted or double-quoted PS string literal
_SQ = r"'(?:[^'])*'"
_DQ = r'"(?:`.|[^"`])*"'
_STR = rf"(?:{_SQ}|{_DQ})"

_CONCAT_RE = re.compile(rf"\(\s*({_STR})(\s*\+\s*{_STR})+\s*\)")
_CONCAT_INNER_RE = re.compile(rf"{_STR}")
_FORMAT_RE = re.compile(
    rf"\(\s*({_STR})\s*-[fF]\s*({_STR}(?:\s*,\s*{_STR})*)\s*\)"
)
# parens must be balanced — an optional unmatched \)? would swallow the
# closing paren of an enclosing expression mid-rewrite
_REPLACE_RE = re.compile(
    rf"(?:\(\s*({_STR})\s*\)|({_STR}))"
    rf"\.replace\(\s*({_STR})\s*,\s*({_STR})\s*\)",
    flags=re.IGNORECASE,
)


def _unquote(literal: str) -> str:
    body = literal[1:-1]
    if literal.startswith('"'):
        # strip backticks (PS escape char) before ordinary characters;
        # keep common escapes meaningful
        body = re.sub(r"`([^nrt0])", r"\1", body)
        body = (body.replace("`n", "\n").replace("`r", "\r")
                .replace("`t", "\t").replace("`0", "\0"))
    else:
        body = body.replace("''", "'")
    return body


def _quote(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def _apply_concat(code: str) -> str:
    def repl(match: re.Match) -> str:
        parts = _CONCAT_INNER_RE.findall(match.group(0))
        return _quote("".join(_unquote(p) for p in parts))
    return _CONCAT_RE.sub(repl, code)


def _apply_format(code: str) -> str:
    def repl(match: re.Match) -> str:
        template = _unquote(match.group(1))
        params = [_unquote(p) for p in _CONCAT_INNER_RE.findall(match.group(2))]
        try:
            return _quote(template.format(*params))
        except (IndexError, KeyError, ValueError):
            return match.group(0)
    return _FORMAT_RE.sub(repl, code)


def _apply_replace(code: str) -> str:
    def repl(match: re.Match) -> str:
        data = _unquote(match.group(1) or match.group(2))
        old = _unquote(match.group(3))
        new = _unquote(match.group(4))
        return _quote(data.replace(old, new))
    return _REPLACE_RE.sub(repl, code)


_DQ_RE = re.compile(_DQ)


def _apply_dq_normalize(code: str) -> str:
    """Rewrite non-interpolating double-quoted literals to single-quoted
    canonical form (resolves backtick obfuscation like "htt`p")."""
    def repl(match: re.Match) -> str:
        literal = match.group(0)
        if "$" in literal:  # may interpolate variables; leave alone
            return literal
        return _quote(_unquote(literal))
    return _DQ_RE.sub(repl, code)


def deobfuscate(code: str) -> Tuple[str, List[str]]:
    """Rewrite obfuscated constructs to plain literals; collect strings.

    Returns (deobfuscated_code, sorted unique decoded strings that did not
    appear literally in the original code).
    """
    current = code
    for _ in range(MAX_ITERATIONS):
        rewritten = _apply_replace(_apply_format(_apply_concat(_apply_dq_normalize(current))))
        if rewritten == current:
            break
        current = rewritten
    decoded = []
    for literal in _CONCAT_INNER_RE.findall(current):
        value = _unquote(literal)
        if value and literal not in code and value not in code:
            decoded.append(value)
    return current, sorted(set(decoded))
