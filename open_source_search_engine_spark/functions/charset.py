"""Charset sniffing + decoding for fetched page bytes (F-parse stage).

The reference converts every downloaded page to UTF-8 before parsing
(``XmlDoc.cpp`` getCharset → ``iana_charset.cpp`` alias table →
``Unicode.cpp`` conversion); link harvest and indexing run on the decoded
text.  This module rebuilds that pipeline from public knowledge (the
WHATWG/HTML5 encoding-sniffing order and the IANA alias registry), as a
pure function so it runs identically in tests, the oracle, and inside the
Spark ``mapInPandas`` stage.

Detection precedence (highest wins):
  1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE / UTF-32)
  2. HTTP ``Content-Type: ...; charset=X`` header parameter
  3. in-document ``<meta charset=X>`` or
     ``<meta http-equiv=content-type content="...; charset=X">``
     within the first 16 KiB (scanned as latin-1, like browsers)
  4. strict-UTF-8 probe of the body
  5. windows-1252 fallback (the de-facto web default; superset of
     iso-8859-1 — every byte decodes, so the pipeline never drops a page
     for encoding reasons, matching the reference's best-effort behavior)

Decoding itself is ``errors="replace"`` so a mislabeled page yields
replacement characters rather than an exception.
"""

from __future__ import annotations

import codecs
import re

# IANA alias normalization (iana_charset.cpp analogue) for labels whose
# common web spellings differ from Python codec names; everything else
# goes through codecs.lookup which already knows the registry aliases.
_ALIASES = {
    "iso-8859-1": "windows-1252",   # HTML5: latin-1 label means cp1252
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",     # ascii label: cp1252 superset, HTML5
    "ascii": "windows-1252",
    "shift-jis": "shift_jis",
    "x-sjis": "shift_jis",
    "gb2312": "gb18030",            # HTML5 maps the gb2312 label to gb18030
    "gbk": "gb18030",
    "unicode": "utf-16",
    "utf8": "utf-8",
}

_BOMS = [
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]

_HTTP_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9_.:-]+)",
                              re.IGNORECASE)
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)""",
    re.IGNORECASE)

_SNIFF_LIMIT = 16 * 1024


def normalize_label(label: str) -> str | None:
    """IANA label → Python codec name, or None if unknown."""
    lab = label.strip().strip("\"'").lower()
    lab = _ALIASES.get(lab, lab)
    try:
        return codecs.lookup(lab).name
    except LookupError:
        return None


def sniff_charset(raw: bytes,
                  http_content_type: str | None = None) -> tuple[str, str]:
    """(codec, source) per the precedence above; source in
    {'bom','http','meta','utf8-probe','fallback'}."""
    for bom, codec in _BOMS:
        if raw.startswith(bom):
            return codec, "bom"
    if http_content_type:
        m = _HTTP_CHARSET_RE.search(http_content_type)
        if m:
            codec = normalize_label(m.group(1))
            if codec:
                return codec, "http"
    m = _META_CHARSET_RE.search(raw[:_SNIFF_LIMIT])
    if m:
        codec = normalize_label(m.group(1).decode("latin-1"))
        if codec:
            return codec, "meta"
    try:
        raw.decode("utf-8", errors="strict")
        return "utf-8", "utf8-probe"
    except UnicodeDecodeError:
        return "cp1252", "fallback"


def decode_content(raw: bytes | None,
                   http_content_type: str | None = None
                   ) -> tuple[str, str, str]:
    """(text, codec, source).  Never raises: detection picks the codec,
    decoding replaces undecodable sequences (best-effort like the
    reference's Unicode.cpp conversion)."""
    if not raw:
        return "", "utf-8", "empty"
    codec, source = sniff_charset(raw, http_content_type)
    text = raw.decode(codec, errors="replace")
    # BOM codecs other than utf-8-sig leave no marker; strip a leading
    # ZWNBSP that utf-16/32 decoding turns the BOM into
    if text and text[0] == "﻿":
        text = text[1:]
    return text, codec, source


def decode_batch(raws, content_types) -> dict[str, list]:
    """Batch API for the mapInPandas stage: parallel lists in, column
    dict out."""
    cols: dict[str, list] = {"text": [], "charset": [], "charset_source": []}
    for raw, ctype in zip(raws, content_types):
        text, codec, source = decode_content(raw, ctype)
        cols["text"].append(text)
        cols["charset"].append(codec)
        cols["charset_source"].append(source)
    return cols
