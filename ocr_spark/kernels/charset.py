"""Charset detection + decoding for raw HTML bytes.

Common-Crawl payloads are NOT uniformly UTF-8: legacy pages declare
windows-1252/latin-1/shift_jis/gb2312 via ``<meta charset=...>`` or the
http-equiv Content-Type form, and some carry BOMs. Detection order follows
the WHATWG encoding sniff:

1. BOM (UTF-8 / UTF-16 LE/BE).
2. ``<meta charset="...">`` or ``<meta http-equiv="Content-Type"
   content="...; charset=...">`` within the first 1024 bytes (scanned as
   latin-1, per spec — it is ASCII-compatible byte-wise).
3. Fallback: UTF-8 with replacement (never raises — one undecodable page
   must not kill a task).

Deterministic, stdlib-only. The reference never faces this (its inputs are
images); for a web-text engine it is part of the scan contract.
"""

from __future__ import annotations

import codecs
import re

# charset attribute inside a meta tag; the lookbehind requires a real
# attribute/parameter boundary (space, ';' of a content-type value, or a
# quote) so '...?charset=big5...' inside an og:url value cannot match
_META_RE = re.compile(
    rb"""<meta[^>]+?(?<=[\s;"'])charset\s*=\s*["']?\s*([a-zA-Z0-9_][a-zA-Z0-9_.:-]*)""",
    re.IGNORECASE,
)
_COMMENT_RE = re.compile(rb"<!--.*?(?:-->|$)", re.DOTALL)

# label → python codec, WHATWG-style normalizations for the common web set.
# utf-16 labels map to utf-8 per spec: a meta tag the byte-wise prescan
# could read proves the document is NOT utf-16 (common authoring error).
_ALIASES = {
    "iso-8859-1": "windows-1252",  # WHATWG maps latin-1 to cp1252
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "gb2312": "gb18030",
    "gbk": "gb18030",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "utf-16": "utf-8",
    "utf16": "utf-8",
    "utf-16le": "utf-8",
    "utf-16be": "utf-8",
}


def sniff_charset(html_bytes: bytes) -> str:
    """Returns the python codec name to decode with (never raises)."""
    if html_bytes.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if html_bytes.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le"
    if html_bytes.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be"
    # the WHATWG prescan skips comments: a commented-out meta must not win
    m = _META_RE.search(_COMMENT_RE.sub(b"", html_bytes[:1024]))
    if m:
        label = m.group(1).decode("ascii", "ignore").strip().lower()
        codec = _ALIASES.get(label, label)
        try:
            codecs.lookup(codec)
            return codec
        except LookupError:
            pass  # bogus declared charset: fall through
    return "utf-8"


def decode_html(html_bytes: bytes | bytearray) -> str:
    """bytes → text via sniffed charset, replacement on errors. BOM bytes
    are consumed by the codec (utf-8-sig / utf-16 variants)."""
    b = bytes(html_bytes)
    codec = sniff_charset(b)
    if codec.startswith("utf-16-") and b[:2] in (
        codecs.BOM_UTF16_LE,
        codecs.BOM_UTF16_BE,
    ):
        b = b[2:]
    return b.decode(codec, errors="replace")
