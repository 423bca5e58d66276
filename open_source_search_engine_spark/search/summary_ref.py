"""Reference-faithful search-result summaries — the Summary.cpp engine.

Port of the reference's summary generator, stage for stage:

- ``setSummaryFromTags`` (Summary.cpp:84-141): itemprop=description >
  og:description > meta description, each accepted only when its length
  is in [maxLen/3, maxLen] and it is not a substring-duplicate of the
  title (``verifySummary``, :54-77).
- ``setSummary`` (Summary.cpp:142-595): greedy loop — per excerpt, score
  the best window around every query-term match (``getBestWindow``,
  :596-1013) and take the max; mark the window ``D_USED`` (dead zone),
  fold its query words into the ``retired`` vector so later excerpts
  prefer OTHER terms, join excerpts with … ellipses (capital-letter /
  sentence-start suppression rules), and retry with a half-length budget
  when an excerpt came up short.
- ``getBestWindow``: expand left within the char budget to a sentence
  start / used zone / LI-TR-P-DIV tag (falling back to a fragment
  start), expand right with the LI/TR and P/DIV(':' wikipedia exception)
  tag rules, then score: 100/alnum word (halved in
  parens/sup/list, doubled in bold/italics), 100 000 per query-term
  match (0 for query stopwords, /15 for a repeat inside the window,
  −200 000 past two repeats, /12 if the term is already retired),
  sentence/fragment-start and near-start bonuses (+8000/+4000/+1000 when
  >7 words), −20 000 when under 7 words, −20 000 per extra tag crossed,
  −8000 if a URL appears in the window.
- ``getDefaultSummary`` (Summary.cpp:1015-1119): no matches → the
  longest run of consecutive alnum words outside links/bad sections.
- Word bits are ``Bits::setForSummary`` (Bits.cpp:196-393): sentence /
  fragment starts, quotes, parens, strong connectors (' - & . * /),
  in-title/bold/list/sup accumulation flags with breaking-tag resets.

The kernel is a pure function over one document's HTML text, applied in
Spark through a batch pandas UDF (``summarize_ref``) — per-doc work,
zero shuffle, identical in the pytest oracle and the executor.

Deviations (documented, pinned by tests): character positions are raw
content offsets (the reference measures in ``Pos``-filtered output
space); ``pos->filter`` is re-expressed as tag-strip + entity-decode +
whitespace-collapse over the window.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

# ------------------------------------------------------------- constants
D_IS_STRONG_CONNECTOR = 0x0001     # Bits.h:57-77
D_STARTS_SENTENCE = 0x0002
D_STARTS_FRAG = 0x0004
D_IN_QUOTES = 0x0008
D_IN_TITLE = 0x0010
D_IN_PARENS = 0x0020
D_IN_BOLDORITALICS = 0x0080
D_IN_LIST = 0x0100
D_IN_SUP = 0x0200
D_USED = 0x1000

MAX_SUMMARY_LEN = 180              # Parms.cpp:7653 "sml" default
MAX_NUM_LINES = 1                  # Parms.cpp:7665 "smnl" default
MAX_CHARS_PER_LINE = 180           # Parms.cpp:7678 "smxcpl" default

ELLIPSIS = "…"

# tags whose interior is never summarized (badFlags, Summary.cpp:635)
_BAD_SECTIONS = ("script", "style", "select", "title")

# g_nodes m_isBreaking (the common subset that matters for sentences)
_BREAKING = frozenset(
    """p div br li ul ol tr td th table h1 h2 h3 h4 h5 h6 blockquote
       title hr form dl dt dd pre center section article header footer
       nav aside""".split())

_ACCUM_TAG_BITS = {                # Bits.cpp:211-219 s_bt[]
    "title": D_IN_TITLE,
    "b": D_IN_BOLDORITALICS, "i": D_IN_BOLDORITALICS,
    "strong": D_IN_BOLDORITALICS, "em": D_IN_BOLDORITALICS,
    "li": D_IN_LIST, "sup": D_IN_SUP,
}

# query stopwords (QueryStopWords, StopWords.cpp — the high-frequency
# function words the scorer zeroes, Summary.cpp:922-925)
QUERY_STOPWORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on or
       that the to was were will with this these those i you your""".split())

_TOKEN_RE = re.compile(r"<[^>]*>|[A-Za-z0-9À-￿]+|[^A-Za-z0-9<À-￿]+")
_TAG_NAME_RE = re.compile(r"^<\s*(/?)([a-zA-Z][a-zA-Z0-9-]*)")


@dataclass
class _Words:
    """Words.cpp analogue: parallel arrays over one document."""
    toks: list[str]           # raw token text
    starts: list[int]         # char offset of token start
    wids: list[bool]          # alnum word? (wordId != 0)
    tags: list[str | None]    # tag name for tag tokens, else None
    backs: list[bool]         # back tag?
    bits: list[int]           # swbits
    bad: list[bool]           # inside script/style/select/title


def tokenize(content: str) -> _Words:
    toks, starts, wids, tags, backs = [], [], [], [], []
    for m in _TOKEN_RE.finditer(content):
        t = m.group(0)
        toks.append(t)
        starts.append(m.start())
        if t.startswith("<"):
            tm = _TAG_NAME_RE.match(t)
            tags.append(tm.group(2).lower() if tm else None)
            backs.append(bool(tm and tm.group(1)))
            wids.append(False)
        else:
            tags.append(None)
            backs.append(False)
            wids.append(t[0].isalnum())
    w = _Words(toks, starts, wids, tags, backs, [], [])
    _set_bits(w)
    return w


def _set_bits(w: _Words) -> None:
    """Bits::setForSummary (Bits.cpp:196-393)."""
    start_sent = True
    start_frag = True
    in_quote = False
    in_parens = False
    flags = 0
    bad_depth = {s: 0 for s in _BAD_SECTIONS}
    n = len(w.toks)
    w.bits = [0] * n
    w.bad = [False] * n
    for i in range(n):
        tag = w.tags[i]
        if tag is not None:
            if tag in bad_depth:
                bad_depth[tag] += -1 if w.backs[i] else 1
                if bad_depth[tag] < 0:
                    bad_depth[tag] = 0
            if tag in _BREAKING:
                start_sent = True
                in_quote = False
            bit = _ACCUM_TAG_BITS.get(tag)
            if bit:
                if w.backs[i]:
                    flags &= ~bit
                else:
                    flags |= bit
            w.bits[i] |= flags
            w.bad[i] = any(v > 0 for v in bad_depth.values())
            continue
        w.bad[i] = any(v > 0 for v in bad_depth.values())
        if w.wids[i]:
            if start_frag:
                w.bits[i] |= D_STARTS_FRAG
                start_frag = False
            if start_sent:
                w.bits[i] |= D_STARTS_SENTENCE
                start_sent = False
            if in_quote:
                w.bits[i] |= D_IN_QUOTES
                in_quote = False
            if in_parens:
                w.bits[i] |= D_IN_PARENS
            w.bits[i] |= flags
            continue
        # punct token
        t = w.toks[i]
        if "(" in t:
            in_parens = True
            flags |= D_IN_PARENS
        elif ")" in t:
            in_parens = False
            flags &= ~D_IN_PARENS
        w.bits[i] |= flags
        if t.endswith('"') or "&quot;" in t:
            in_quote = True
        if len(t) == 2 and t.isspace():
            continue                       # double space: not a starter
        if len(t) != 1 or not t.isspace():
            start_frag = True
        if len(t) >= 2 and t[0] == "." and t[1].isspace():
            # ". " ends a sentence — unless after a single-char initial
            if not (i > 0 and w.wids[i - 1] and len(w.toks[i - 1]) == 1):
                start_sent = True
        if t in ("&#146;", "&#8217;") or (
                len(t) == 1 and t in "'-&.*/"):
            w.bits[i] |= D_IS_STRONG_CONNECTOR


# --------------------------------------------------------------- matches
@dataclass
class _Match:
    word_num: int
    qword_num: int
    num_words: int = 1


def _find_matches(w: _Words, terms: list[str]) -> list[_Match]:
    lows = [t.lower() for t in terms]
    out = []
    for i in range(len(w.toks)):
        if not w.wids[i]:
            continue
        tl = w.toks[i].lower()
        for q, term in enumerate(lows):
            if tl == term:
                out.append(_Match(i, q))
                break
    return out


# ---------------------------------------------------------- word filter
_WS_RE = re.compile(r"\s+")


def filter_window(w: _Words, a: int, b: int) -> str:
    """pos->filter (Pos.cpp): tags dropped, entities decoded, space runs
    collapsed, ends trimmed."""
    parts = []
    for i in range(a, min(b, len(w.toks))):
        if w.tags[i] is not None:
            parts.append(" ")
            continue
        if w.bad[i]:
            continue
        parts.append(w.toks[i])
    # entities span token boundaries ("&"+"amp"+";") — decode the joined
    # window, not per token
    return _WS_RE.sub(" ", _html.unescape("".join(parts))).strip()


# ------------------------------------------------------- getBestWindow
def _get_best_window(w: _Words, matches: list[_Match], mm: int,
                     lasta: int, got_it: list[int], retired: list[int],
                     max_excerpt_len: int, n_qwords: int,
                     stop_flags: list[bool]) -> tuple[int, int, int, int]:
    """Summary.cpp:596-1013.  Returns (score, a, b, new_lasta)."""
    m = matches[mm]
    mw = m.word_num
    n = len(w.toks)
    if mw >= n:
        return 0, -1, -1, mw
    if (w.bits[mw] & D_USED) or w.bad[mw]:
        return 0, -1, -1, mw

    pos = w.starts

    def _end(i: int) -> int:         # char pos of END of word i
        return pos[i + 1] if i + 1 < n else pos[i] + len(w.toks[i])

    # ---- expand left (Summary.cpp:647-715)
    a = mw
    posa = _end(a)
    first_frag = -1
    start_on_quote = False
    good_start = False
    word_count = 0
    while a > 0 and posa - pos[a - 1] < max_excerpt_len and a > lasta:
        if (w.bits[a - 1] & D_USED) or (w.bits[a] & D_STARTS_SENTENCE) \
                or (w.bits[a - 1] & D_IN_TITLE):
            good_start = True
            break
        if w.tags[a - 1] in ("li", "tr", "p", "div") and not w.backs[a - 1]:
            good_start = True
            break
        if a + 1 < n and (w.bits[a + 1] & D_IN_QUOTES) \
                and w.toks[a].startswith('"'):
            start_on_quote = True
            good_start = True
            break
        if (w.bits[a] & D_STARTS_FRAG) \
                and not (w.bits[a - 1] & D_IS_STRONG_CONNECTOR) \
                and first_frag == -1:
            first_frag = a
        if w.wids[a]:
            word_count += 1
        a -= 1
    if not good_start and first_frag != -1:
        a = first_frag
    # don't let punct/tag start the line (unless a quote)
    if a < mw and not w.wids[a] and not w.toks[a].startswith('"'):
        while a < mw and not w.wids[a]:
            a += 1
        while mw > a > 0 and (w.bits[a - 1] & D_IS_STRONG_CONNECTOR):
            a += 1
        while a < mw and not w.wids[a]:
            a += 1

    # ---- expand right (Summary.cpp:720-772)
    b = mw + m.num_words
    end_quote = -1
    tags_crossed = 0
    while b <= n:
        if b == n:
            break
        if _end(b) - pos[a] >= max_excerpt_len:
            break
        if start_on_quote and w.toks[b].startswith('"'):
            end_quote = b
        if w.bits[b] & D_USED:
            break
        if w.bits[b] & D_IN_TITLE:
            break
        if w.wids[b]:
            word_count += 1
        if w.tags[b] in ("li", "tr") and w.backs[b]:
            tags_crossed += 1
            if word_count > 10:
                break
        if w.tags[b] in ("p", "div") and w.backs[b]:
            tags_crossed += 1
            if word_count > 10 and not w.toks[b - 1].endswith(":"):
                break
        b += 1
    # trim trailing punct (Summary.cpp:775-787)
    if b > mw and b - 1 < n and not w.wids[b - 1]:
        while b > mw and b - 2 >= 0 and not w.wids[b - 2] \
                and end_quote != -1 and b > end_quote:
            b -= 1
        while b > mw and b - 2 >= 0 \
                and (w.bits[b - 2] & D_IS_STRONG_CONNECTOR):
            b -= 1

    # first match inside [a,b)
    mi = mm
    while mi > 0 and matches[mi - 1].word_num >= a:
        mi -= 1

    # ---- score (Summary.cpp:800-1010)
    score = 0
    has_url = False
    word_count = 0
    b = min(b, n)
    for i in range(a, b):
        if w.bad[i]:
            continue
        if w.wids[i] and w.toks[i].isdigit():
            continue                       # don't count pure numbers
        if not w.wids[i] and "://" in w.toks[i]:
            has_url = True
        if not w.wids[i]:
            continue
        t = 100
        if w.bits[i] & (D_IN_PARENS | D_IN_SUP | D_IN_LIST):
            t //= 2
        if w.bits[i] & D_IN_BOLDORITALICS:
            t *= 2
        score += t
        word_count += 1
        if mi >= len(matches):
            continue
        nxt = matches[mi]
        if i != nxt.word_num:
            continue
        mi += 1
        qwn = nxt.qword_num
        score -= t
        t = 100_000                        # flat word weight (ww=1.0)
        if stop_flags[qwn]:
            t = 0
        if w.bits[i] & (D_IN_PARENS | D_IN_SUP | D_IN_LIST):
            t //= 2
        if got_it[qwn] > 0:
            if got_it[qwn] == 1:
                t //= 15
            else:
                t -= 200_000
        elif retired[qwn] > 0:
            t //= 12
        score += t
        if got_it[qwn] < 100:
            got_it[qwn] += 1

    if score > 0 and word_count > 7:
        if w.bits[a] & D_STARTS_SENTENCE:
            score += 8000
        elif w.bits[a] & D_STARTS_FRAG:
            score += 4000
        if mw - a < 7:
            score += 1000
    if word_count < 7:
        score -= 20_000
    if tags_crossed > 1:
        score -= tags_crossed * 20_000
    if has_url:
        score -= 8000
    return score, a, b, a


# --------------------------------------------------------- tag summaries
_META_RES = (
    re.compile(r"""<[^>]*\bitemprop\s*=\s*["']?description["']?[^>]*\bcontent\s*=\s*("([^"]*)"|'([^']*)')""", re.IGNORECASE),
    re.compile(r"""<meta\b[^>]*\bproperty\s*=\s*["']?og:description["']?[^>]*\bcontent\s*=\s*("([^"]*)"|'([^']*)')""", re.IGNORECASE),
    re.compile(r"""<meta\b[^>]*\bname\s*=\s*["']?description["']?[^>]*\bcontent\s*=\s*("([^"]*)"|'([^']*)')""", re.IGNORECASE),
)


def summary_from_tags(content: str, title: str,
                      max_len: int = MAX_SUMMARY_LEN) -> str | None:
    """setSummaryFromTags (Summary.cpp:84-141) + verifySummary (:54-77):
    description tags in priority order, length-gated to [max_len/3,
    max_len], rejected when the title contains it."""
    min_len = max_len // 3
    t = (title or "").strip()
    if t.endswith(" ..."):
        t = t[:-4]
    for rx in _META_RES:
        m = rx.search(content)
        if not m:
            continue
        text = _html.unescape(m.group(2) or m.group(3) or "").strip()
        if not (min_len <= len(text) <= max_len):
            continue
        if t and text.lower() in t.lower():
            continue
        return text
    return None


# ----------------------------------------------------------- main driver
def make_summary(content: str, query_terms: list[str],
                 title: str = "",
                 max_summary_len: int = MAX_SUMMARY_LEN,
                 max_num_lines: int = MAX_NUM_LINES,
                 max_chars_per_line: int = MAX_CHARS_PER_LINE,
                 from_tags_first: bool = True) -> str:
    """The full reference ladder: description tags, then the greedy
    best-window loop, then the default (longest alnum run) summary."""
    if from_tags_first:
        s = summary_from_tags(content, title, max_summary_len)
        if s is not None:
            return s
    w = tokenize(content)
    matches = _find_matches(w, query_terms)
    if not matches or max_num_lines <= 0:
        return default_summary(w, max_summary_len)
    n_q = len(query_terms)
    stop_flags = [t.lower() in QUERY_STOPWORDS for t in query_terms]
    retired = [0] * n_q
    # query words already in the title start retired (MF_TITLEGEN)
    title_low = (title or "").lower()
    tw = set(re.findall(r"\w+", title_low))
    for q, term in enumerate(query_terms):
        if term.lower() in tw:
            retired[q] = 1

    out: list[str] = []
    out_len = 0
    had_ellipsis = False
    max_excerpt_len = max_chars_per_line
    num_final = 0
    loops = 0
    while num_final < max_num_lines and loops < 1024:
        loops += 1
        best = (0, -1, -1, None)           # score, a, b, got_it
        lasta = -1
        prev_words_class = None
        for i in range(len(matches)):
            got_it = [0] * n_q
            score, a, b, lasta = _get_best_window(
                w, matches, i, lasta, got_it, retired,
                max_excerpt_len, n_q, stop_flags)
            if score <= 0:
                continue
            if best[3] is not None and score <= best[0]:
                continue
            best = (score, a, b, got_it)
        if best[3] is None:
            break
        _, maxa, maxb, max_got = best

        text = filter_window(w, maxa, maxb)
        for j in range(maxa, maxb):        # dead zone, both paths
            w.bits[j] |= D_USED
        if len(text) < 5:
            continue
        if title and len(text) == len(title) \
                and text.lower() in title.lower():
            continue

        piece = ""
        c = w.toks[maxa][:1]
        need_lead = not (not c.isalpha() or c.isupper()
                         or (w.bits[maxa] & D_STARTS_SENTENCE)
                         or (out and had_ellipsis))
        if need_lead:
            piece += ELLIPSIS + " "
        if w.bits[maxa] & D_IN_QUOTES:
            piece += '"'
        piece += text + " " + ELLIPSIS
        had_ellipsis = True
        if out_len + len(piece) + 1 > max_summary_len:
            break
        out.append(piece)
        out_len += len(piece) + 1
        for q in range(n_q):
            if retired[q] < 100:
                retired[q] += max_got[q]
        # short excerpt → retry once at half budget (Summary.cpp:539-550)
        if max_excerpt_len == max_chars_per_line \
                and len(text) <= max_chars_per_line // 2 + 1:
            max_excerpt_len = max_chars_per_line // 2
        else:
            max_excerpt_len = max_chars_per_line
            num_final += 1
    if not out:
        return default_summary(w, max_summary_len)
    return " ".join(out)


def default_summary(w: _Words, max_summary_len: int = MAX_SUMMARY_LEN
                    ) -> str:
    """getDefaultSummary (Summary.cpp:1015-1119): longest run of
    consecutive alnum words outside links and bad sections; a run that
    reaches the length budget wins immediately."""
    in_link = False
    start = -1
    best_start = best_end = -1
    longest = 0
    consec = 0
    last_alnum = -1
    n = len(w.toks)
    for i in range(n):
        if w.bad[i]:
            continue
        if start > 0 and best_start == start \
                and w.starts[i] - w.starts[start] >= max_summary_len - 8:
            best_end = last_alnum
            break
        if w.wids[i]:
            if not in_link:
                consec += 1
            last_alnum = i
            if start < 0:
                start = i
            continue
        tag = w.tags[i]
        if tag is not None:
            if tag == "p":
                continue
            if tag == "a":
                in_link = not w.backs[i]
            if tag not in _BREAKING:
                continue
        else:
            continue                       # punct never breaks a run
        if consec > longest:
            longest = consec
            best_start = start
            best_end = i - 1
        start = -1
        consec = 0
    if consec > longest:
        best_start, best_end = start, n - 1
    if best_start >= 0 and best_end > best_start:
        return filter_window(w, best_start, best_end + 1)[
            :max_summary_len]
    return ""


# ------------------------------------------------------------- Spark op
def summarize_ref(docs, text_col: str = "text", title_col: str | None = None,
                  query_terms: list[str] | None = None,
                  max_summary_len: int = MAX_SUMMARY_LEN,
                  max_num_lines: int = MAX_NUM_LINES):
    """Batch pandas-UDF wrapper: adds a ``summary`` column.  Per-doc
    kernel work, zero shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F

    terms = query_terms or []

    def _sum_batch(text, title):
        return pd.Series([
            make_summary(t or "", terms, title=ti or "",
                         max_summary_len=max_summary_len,
                         max_num_lines=max_num_lines)
            for t, ti in zip(text, title)])

    _sum = F.pandas_udf(_sum_batch, "string")

    title = F.col(title_col) if title_col else F.lit("")
    return docs.withColumn("summary", _sum(F.col(text_col), title))
