"""Language id ↔ abbreviation tables (Lang.cpp / Lang.h).

The reference keys every per-doc language datum on a one-byte langId
(Lang.h:13-69 enum, 0=Unknown .. 55=Estonian) and exposes two string
forms: the display name (Lang.cpp:11 s_langStrings) and the abbreviation
(Lang.cpp:56 s_langAbbr) that is both what `gblang:` queries accept and
what hashLanguageString indexes (XmlDoc_Indexing.cpp:1884-1902).  This
module carries both tables verbatim plus the lookup semantics:

* ``lang_id_from_abbr`` — Lang.cpp:91 getLangIdFromAbbr: case-insensitive
  scan of the abbr table, with the two hard-coded aliases en_uk/en_us →
  langEnglish, everything else → langUnknown (0).
* ``lang_abbr`` — Lang.cpp:111 getLanguageAbbr (table index, None past
  the end; id 0 is the real entry "xx").

The trigram language identifier (training/textqual.py) emits bare
ISO-639-1 codes; ``lang_id_from_detector`` maps its output into this id
space ("zh" → zh_cn, the reference's mandarin slot, since script
detection alone cannot split simplified/traditional).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Lang.cpp:56-90 s_langAbbr, index == langId.  Entries the reference
# comments as "MADE UP!" (go/ag/vv) are kept verbatim — gblang: queries
# against them must resolve to the same ids.
LANG_ABBR: tuple[str, ...] = (
    "xx", "en", "fr", "es", "ru", "tr", "ja", "zh_tw", "zh_cn", "ko",
    "de", "nl", "it", "fi", "sv", "no", "pt", "vi", "ar", "he", "id",
    "el", "th", "hi", "bn", "pl", "tl", "la", "eo", "ca", "bg", "tx",
    "sr", "hu", "da", "lt", "cs", "gl", "ka", "gd", "go", "ro", "ga",
    "lv", "hy", "is", "ag", "gv", "io", "fa", "te", "vv", "mg", "ku",
    "lb", "et",
)

# Lang.cpp:11-48 s_langStrings, index == langId.
LANG_NAMES: tuple[str, ...] = (
    "Unknown", "English", "French", "Spanish", "Russian", "Turkish",
    "Japanese", "Chinese Traditional", "Chinese Simplified", "Korean",
    "German", "Dutch", "Italian", "Finnish", "Swedish", "Norwegian",
    "Portuguese", "Vietnamese", "Arabic", "Hebrew", "Indonesian",
    "Greek", "Thai", "Hindi", "Bengala", "Polish", "Tagalog", "Latin",
    "Esperanto", "Catalan", "Bulgarian", "Translingual",
    "Serbo-Croatian", "Hungarian", "Danish", "Lithuanian", "Czech",
    "Galician", "Georgian", "Scottish Gaelic", "Gothic", "Romanian",
    "Irish", "Latvian", "Armenian", "Icelandic", "Ancient Greek",
    "Manx", "Ido", "Persian", "Telugu", "Venetian", "Malagasy",
    "Kurdish", "Luxembourgish", "Estonian",
)

LANG_ID: dict[str, int] = {a: i for i, a in enumerate(LANG_ABBR)}

LANG_UNKNOWN = 0
LANG_ENGLISH = 1


def lang_id_from_abbr(abbr: str | None) -> int:
    """Lang.cpp:91 getLangIdFromAbbr: case-insensitive table scan, then
    the en_uk/en_us hard aliases, else langUnknown."""
    if not abbr:
        return LANG_UNKNOWN
    low = abbr.lower()
    got = LANG_ID.get(low)
    if got is not None:
        return got
    if low in ("en_uk", "en_us"):
        return LANG_ENGLISH
    return LANG_UNKNOWN


def lang_abbr(lang_id: int) -> str | None:
    """Lang.cpp:111 getLanguageAbbr — None past the table end, like the
    reference's bounds check (id 0 is a real entry, 'xx')."""
    if 0 <= lang_id < len(LANG_ABBR):
        return LANG_ABBR[lang_id]
    return None


# training/textqual.py trigram_langid emits bare ISO codes; zh has no
# simplified/traditional split at the script level so it lands on the
# reference's mandarin slot (langChineseSimp=8).
_DETECTOR_ALIASES = {"zh": "zh_cn"}


def lang_id_from_detector(code: str | None) -> int:
    if not code:
        return LANG_UNKNOWN
    return lang_id_from_abbr(_DETECTOR_ALIASES.get(code, code))


def lang_abbr_col(lang_id: Column | str) -> Column:
    """Pure-Catalyst langId → abbr literal map (out-of-range → 'xx',
    the indexing paths' practical fallback)."""
    c = F.col(lang_id) if isinstance(lang_id, str) else lang_id
    expr = F.lit(LANG_ABBR[0])
    for i, a in enumerate(LANG_ABBR):
        if i:
            expr = F.when(c == i, F.lit(a)).otherwise(expr)
    return expr


def lang_id_from_detector_col(code: Column | str) -> Column:
    """Pure-Catalyst detector-code → langId literal map (unknown → 0)."""
    c = F.col(code) if isinstance(code, str) else code
    low = F.lower(c)
    expr = F.lit(LANG_UNKNOWN)
    for abbr, i in LANG_ID.items():
        if i:
            expr = F.when(low == abbr, F.lit(i)).otherwise(expr)
    for alias, target in _DETECTOR_ALIASES.items():
        expr = F.when(low == alias, F.lit(LANG_ID[target])).otherwise(expr)
    for alias in ("en_uk", "en_us"):
        expr = F.when(low == alias, F.lit(LANG_ENGLISH)).otherwise(expr)
    return expr.cast("int")
