"""Sentence segmentation — the Sections.cpp sentence machine
(Sections.cpp:1460-1780 addSentences) over the Words.cpp token stream,
with the reference's abbreviation table (Abbreviations.cpp:20-227
s_abbrs99, keyed by hash64Lower so lookups are case-insensitive; later
duplicate entries overwrite like HashTableX addKey).

Core break rules kept (the reference's site-specific colon/hyphen
heuristics are deliberately out of scope and documented as such):

- ``.`` ``;`` ``!`` ``?`` ``|`` ``>`` and the bullet char end a
  sentence (Sections.cpp:1686-1694);
- a ``.`` immediately followed by an alnum char does NOT break —
  hostnames / IPs / phone numbers (Sections.cpp:1700-1706);
- a ``.`` after an abbreviation does NOT break, with the double-duty
  escape hatch: an abbr that REQUIRES a word after (``vs.``, ``Mr.``)
  never breaks; otherwise if the abbr was lower-case and the next word
  is capitalized the period ends the sentence after all
  (Sections.cpp:1708-1738);
- a ``.`` after a leading enumeration number ("1. library name") does
  NOT break (Sections.cpp:1740-1744);
- breaking tags end sentences; non-breaking tags (``<font>``, ``<b>``,
  ``<span>`` is breaking in the reference) are skipped
  (Sections.cpp:1560-1572);
- a sentence never ends on a tag: the end is pulled back to its last
  alnum word (Sections.cpp:1752-1755).

Spark-side: ``sentences_batch`` is the Arrow-batch kernel; summary /
position builders consume the per-doc sentence spans.
"""

from __future__ import annotations

from .words import Token, segment

# Abbreviations.cpp:20-227 s_abbrs99 — {lowercased: has_word_after}.
# Later duplicates overwrite (HashTableX addKey semantics): "Ft",1 then
# "ft",0 -> 0; "St",0 / "st",0 -> 0; "fig",1 overwrites "Fig",0.
_ABBR_PAIRS = [
    ("hghway", 0), ("hway", 0), ("hwy", 0), ("ln", 0), ("mil", 0),
    ("pkway", 0), ("pkwy", 0), ("lp", 0), ("phd", 0), ("demon", 0),
    ("alz", 0), ("lang", 0), ("gr", 0), ("vars", 0), ("avg", 0),
    ("amer", 0), ("bet", 0), ("nr", 0), ("appt", 0), ("tel", 1),
    ("intl", 0), ("div", 1), ("int", 1), ("beg", 1), ("adv", 1),
    ("feat", 1), ("tdlr", 0), ("schl", 0),
    ("am", 0), ("pm", 0), ("mon", 0), ("tue", 0), ("tues", 0),
    ("wed", 0), ("wednes", 0), ("thu", 0), ("thur", 0), ("thurs", 0),
    ("fri", 0), ("sat", 0), ("sun", 0),
    ("ala", 0), ("ariz", 0), ("assn", 0), ("assoc", 0), ("asst", 0),
    ("atty", 0), ("attn", 1), ("aug", 0), ("ave", 0), ("bldg", 0),
    ("bros", 0), ("blvd", 0), ("calif", 0), ("capt", 1), ("cf", 0),
    ("ch", 0), ("co", 0), ("col", 0), ("colo", 0), ("conn", 0),
    ("mfg", 0), ("corp", 0), ("dr", 0), ("dec", 0), ("dept", 0),
    ("dist", 0), ("drs", 0), ("ed", 0), ("eq", 0), ("ext", 0),
    ("feb", 0), ("fig", 0), ("figs", 0), ("fla", 0), ("ft", 1),
    ("ga", 0), ("gen", 0), ("gov", 0), ("hon", 0), ("ill", 0),
    ("inc", 0), ("jr", 0), ("jan", 0), ("kan", 0), ("la", 0),
    ("lt", 0), ("ltd", 0), ("mr", 1), ("mrs", 1), ("mar", 0),
    ("mass", 0), ("md", 0), ("messrs", 1), ("mich", 0), ("minn", 0),
    ("miss", 0), ("mmes", 0), ("ms", 1), ("msgr", 1), ("mt", 1),
    ("no", 0), ("nov", 0), ("oct", 0), ("okla", 0), ("op", 0),
    ("ore", 0), ("pp", 0), ("prof", 1), ("prop", 0), ("rd", 0),
    ("ref", 0), ("rep", 0), ("reps", 0), ("rev", 0), ("rte", 0),
    ("sen", 0), ("sept", 0), ("sr", 0), ("st", 0), ("ste", 0),
    ("stat", 0), ("supt", 0), ("tech", 0), ("tex", 0), ("va", 0),
    ("vol", 0), ("wash", 0), ("av", 0), ("ca", 0), ("cc", 0),
    ("chap", 0), ("cm", 0), ("cu", 0), ("dia", 0), ("eqn", 0),
    ("etc", 0), ("fig", 1), ("figs", 1), ("ft", 0), ("hr", 0),
    ("lb", 0), ("lbs", 0), ("mg", 0), ("ml", 0), ("mm", 0),
    ("mv", 0), ("oz", 0), ("pl", 0), ("sec", 0), ("sq", 0),
    ("vs", 1), ("yr", 0), ("yrs", 0),
    # middle initials a-z ("v" = versus requires a word after)
    *((c, 0) for c in "abcdefghijklmnopqrstu"),
    ("v", 1), ("w", 0), ("x", 0), ("y", 0), ("z", 0),
]
ABBREVIATIONS: dict[str, bool] = {}
for _k, _v in _ABBR_PAIRS:
    ABBREVIATIONS[_k] = bool(_v)      # last duplicate wins


def is_abbr(word: str) -> tuple[bool, bool]:
    """isAbbr (Abbreviations.cpp:232): (is abbreviation, must have a
    word after).  Case-insensitive like the hash64Lower key."""
    v = ABBREVIATIONS.get(word.lower())
    return (v is not None, bool(v))


# isBreakingTagId: the standard block-level set + <span> (which the
# reference deliberately breaks on, Sections.cpp:1560-1562) + <title>
_BREAKING_TAGS = frozenset((
    "p", "br", "div", "table", "td", "tr", "th", "li", "ul", "ol",
    "dl", "dt", "dd", "h1", "h2", "h3", "h4", "h5", "h6", "title",
    "blockquote", "pre", "form", "hr", "center", "address", "section",
    "article", "header", "footer", "aside", "nav", "span",
))

_BULLET = "•"
_EMDASH = "—"
_BREAK_CHARS = frozenset(".;!?|>" + _BULLET + _EMDASH)


def _is_breaking_tag(tag: str | None) -> bool:
    if not tag:
        return False
    return tag.lstrip("/") in _BREAKING_TAGS


def _capitalized(word: str) -> bool:
    return bool(word) and word[0].isupper()


def _is_num(word: str) -> bool:
    return bool(word) and all("0" <= c <= "9" for c in word)


def sentence_spans(tokens: list[Token]) -> list[tuple[int, int]]:
    """Token index spans [a, b) of each sentence; a sentence starts at
    an alnum word and ends at its LAST alnum word (tags/punct trimmed,
    Sections.cpp:1752-1755)."""
    n = len(tokens)
    spans: list[tuple[int, int]] = []
    i = 0
    while i < n:
        # find the sentence's first alnum word
        while i < n and not (tokens[i].kind == "alnum" and tokens[i].text):
            i += 1
        if i >= n:
            break
        first = i
        last_word = i            # index of last alnum word seen
        j = i + 1
        while j < n:
            t = tokens[j]
            if t.kind == "alnum":
                if t.text:
                    last_word = j
                j += 1
                continue
            if t.kind == "tag":
                if _is_breaking_tag(t.tag):
                    break
                j += 1
                continue
            # punct token: scan chars for a sentence breaker
            broke = False
            text = t.text
            for ci, ch in enumerate(text):
                if ch not in _BREAK_CHARS:
                    continue
                if ch == ".":
                    # alnum right after the '.': hostname/ip/phone
                    nxt = (text[ci + 1] if ci + 1 < len(text)
                           else (tokens[j + 1].text[:1]
                                 if j + 1 < n and tokens[j + 1].text
                                 else ""))
                    if nxt and nxt.isalnum():
                        continue
                    prev_word = tokens[last_word].text
                    ab, word_after = is_abbr(prev_word)
                    if ab:
                        if word_after:
                            continue          # "vs." never ends
                        if _capitalized(prev_word):
                            continue          # "Oct. 15" keeps going
                        # lower-case abbr + capitalized next word:
                        # the period does double duty -> sentence ends
                        nw = j + 1
                        while nw < n and tokens[nw].kind != "alnum":
                            nw += 1
                        if nw < n and not _capitalized(tokens[nw].text):
                            continue
                        if nw >= n:
                            continue
                    elif _is_num(prev_word) and last_word == first:
                        continue              # "1. library name"
                broke = True
                break
            if broke:
                break
            j += 1
        spans.append((first, last_word + 1))
        i = max(j, last_word + 1)
        # skip past the breaker token so the next sentence starts clean
        if i < n and tokens[i].kind != "alnum":
            i += 1
    return spans


def sentences(text: str, has_tags: bool = True) -> list[str]:
    """The document's sentences, each the exact source slice from its
    first to last alnum word."""
    toks = segment(text, has_tags=has_tags)
    out = []
    for a, b in sentence_spans(toks):
        out.append("".join(t.text for t in toks[a:b]))
    return out


def sentences_batch(texts, has_tags: bool = True):
    """pandas.Series[str] -> pandas.Series[list[str]] — Arrow-batch
    kernel for pandas_udf / mapInPandas."""
    return texts.map(lambda t: sentences(t or "", has_tags))
