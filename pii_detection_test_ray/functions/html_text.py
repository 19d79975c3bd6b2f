"""Deterministic HTML → plain-text extraction.

Pure function of the input bytes: no locale, no randomness, no library whose
output could drift between versions — so the extracted ``text`` is
byte-identical per ``url`` run-to-run (the invariant required of the
extraction stage; cf. FIXTURES.md §1). Text-node whitespace is preserved
verbatim (PII strings, including spacing-obfuscated ones, must survive
extraction unmodified); block-level tags contribute newlines; runs of 3+
newlines collapse to exactly two.
"""

from __future__ import annotations

import html as _htmllib
import re

# Tags whose boundaries imply a line break in the extracted text.
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|table|tr|h1|h2|h3|h4|h5|h6|title|section|article|"
    "header|footer|nav|main|blockquote|pre|hr|form"
)

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_BLOCK_TAG_RE = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*/?>", re.IGNORECASE)
_ANY_TAG_RE = re.compile(r"</?[a-zA-Z][^>]*>")
_DOCTYPE_RE = re.compile(r"<!DOCTYPE[^>]*>", re.IGNORECASE)
_MANY_NEWLINES_RE = re.compile(r"\n{3,}")
_TRAILING_SPACE_RE = re.compile(r"[ \t]+\n")


def extract_text(html_bytes: bytes | str) -> str:
    """Extract visible text from an HTML page, deterministically."""
    if isinstance(html_bytes, (bytes, bytearray, memoryview)):
        raw = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    s = _DOCTYPE_RE.sub("", raw)
    s = _COMMENT_RE.sub("", s)
    s = _SCRIPT_STYLE_RE.sub("", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _ANY_TAG_RE.sub("", s)
    s = _htmllib.unescape(s)
    s = _TRAILING_SPACE_RE.sub("\n", s)
    s = _MANY_NEWLINES_RE.sub("\n\n", s)
    return s.strip()
