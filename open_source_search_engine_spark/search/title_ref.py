"""Reference-faithful page-title generation — the Title.cpp engine.

Port of the reference's two-stage title generator:

- ``setTitleFromTags`` (Title.cpp:59-111): meta property=og:title >
  meta name=title > <title> tag, each entity-decoded / whitespace-
  collapsed and length-gated to [3, maxTitleLen] chars.
- ``setTitle`` (Title.cpp:163-1436) when no tag title: gather up to 100
  candidates —
    * inlink anchor texts (score 1.05 same-host / 0.80 remote,
      TT_LINKTEXT*, first ~19 each; Title.cpp:225-280) and RSS item
      titles (5.0 / 2.0, TT_RSSITEM*, :283-317),
    * ``title=`` attributes of self-links (3.0, TT_TITLEATT,
      :404-466 — skipped when they contain permalink/permanent/share
      or exceed 400 bytes; an onclick attr disqualifies the self-link),
    * self-link anchor texts from the body (1.5, TT_ATAG, :476-692 —
      words inside non-self links are flagged ineligible, at most 4
      <a> candidates, candidate must stay within 200 tokens / 300
      words / 1000 bytes, breaking tags except <span> end it),
    * the first line for text documents (0.5, TT_FIRSTLINE, :697-760),
    * the last URL path component containing '_'/'-' (1.0, TT_URLPATH,
      :763-827 — boosts others via similarity but can never win),
  then split candidates into subtitle children on root-site-title
  matches landing on qualified punctuation (:830-1000; the split
  parent's score drops to 0.001), apply the query-term boost (x1.5 per
  matching non-stop word, :1003-1080; the no-caps penalty is x1.00 —
  inert — in this reference, :1062-1066; http:// candidates x0.10),
  cross-boost candidates by pairwise ``getSimilarity`` (:1082-1230 —
  boost ladder 3.0/2.0/1.5/1.4/1.3/1.2/1.1/1.08/1.04 at fp >= .95/.90/
  .85/.80/.75/.70/.60/.50/.40, total capped at 100, with the
  type-pair exclusion rules), and pick the max-score candidate
  (URL paths excluded, :1270-1305).
- ``getSimilarity`` (Title.cpp:1438-1620): popularity-weighted word +
  bigram-phrase containment — needle words/phrases hashed with score
  1-pop/0x7fff (phrases at half weight), haystack scan accumulates
  2x the score per hit, fp = found/sum.
- ``copyTitle`` (Title.cpp:1624-1767): include a leading quote, strip
  trailing ':'/' '/'-'/'\\n'/'\\r'/'|', drop unwanted symbol/emoji
  codepoints (Unicode.h:166-196), escape < >, cut at maxTitleLen chars
  with "..." placed at the last punctuation.

The kernel is a pure per-document function, applied in Spark through a
batch pandas UDF (``title_ref``) — zero shuffle.  Word popularity
(Pops.cpp over the Speller unified dict) is an optional broadcastable
``{word: pop}`` dict; absent words get pop 1 exactly like Pops.cpp:50-52.

Documented deviations, pinned by tests: the reference's Url::equals is
re-expressed as normalized absolute-URL string equality; candidate word
ids are lowercased tokens (hash64d is injective on this fixture space).
In THIS reference fork the body candidate scan admits only <a> tags
(Title.cpp:519-521 "@todo ALC we should allow more tags than just
link"), so TT_BOLDTAG/TT_HTAG/TT_TITLETAG body candidates and the
root-picks-title-tag override (:1309-1311) are unreachable; we mirror
that.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlsplit

MAX_TITLE_LEN = 80                 # XmlDoc.cpp:17527 titleMaxLen default
MAX_TIT_CANDIDATES = 100

# candidate types (Title.cpp:113-129)
TT_LINKTEXTLOCAL = 1
TT_LINKTEXTREMOTE = 2
TT_RSSITEMLOCAL = 3
TT_RSSITEMREMOTE = 4
TT_TITLETAG = 7
TT_FIRSTLINE = 9
TT_ATAG = 12
TT_URLPATH = 15
TT_TITLEATT = 16

MAX_POP = 0x7FFF                   # Pops.h:8

_BODY_TYPES = frozenset({TT_ATAG, TT_FIRSTLINE, TT_TITLETAG})

from .summary_ref import QUERY_STOPWORDS, _BREAKING  # shared grammar

_WORD_RE = re.compile(r"[A-Za-z0-9À-￿]+|[^A-Za-z0-9À-￿]+")
_TOKEN_RE = re.compile(r"<[^>]*>|[A-Za-z0-9À-￿]+|[^A-Za-z0-9<À-￿]+")
_TAG_NAME_RE = re.compile(r"^<\s*(/?)([a-zA-Z][a-zA-Z0-9-]*)")
_WS_RE = re.compile(r"\s+")

# Unicode.h:166-196 isUtf8UnwantedSymbols, as codepoint ranges
_UNWANTED = (
    (0x25A0, 0x25BF), (0x25C0, 0x27BF), (0x1F000, 0x1F0FF),
    (0x1F1E6, 0x1F1FF), (0x1F300, 0x1F6FF), (0x1F900, 0x1F9FF),
)


def _unwanted(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _UNWANTED)


# ---------------------------------------------------------------- tokens
@dataclass
class _Toks:
    """Words.cpp analogue over one candidate string or the body HTML."""
    toks: list[str]
    starts: list[int]
    wids: list[bool]                    # alnum word?
    tags: list[str | None] = field(default_factory=list)
    backs: list[bool] = field(default_factory=list)
    raws: list[str] = field(default_factory=list)   # raw tag text

    @property
    def n(self) -> int:
        return len(self.toks)


def _tok_plain(s: str) -> _Toks:
    toks, starts, wids = [], [], []
    for m in _WORD_RE.finditer(s or ""):
        toks.append(m.group(0))
        starts.append(m.start())
        wids.append(m.group(0)[0].isalnum())
    t = _Toks(toks, starts, wids)
    t.tags = [None] * len(toks)
    t.backs = [False] * len(toks)
    return t


def _tok_html(s: str) -> _Toks:
    toks, starts, wids, tags, backs, raws = [], [], [], [], [], []
    for m in _TOKEN_RE.finditer(s or ""):
        t = m.group(0)
        toks.append(t)
        starts.append(m.start())
        if t.startswith("<"):
            tm = _TAG_NAME_RE.match(t)
            tags.append(tm.group(2).lower() if tm else None)
            backs.append(bool(tm and tm.group(1)))
            wids.append(False)
            raws.append(t)
        else:
            tags.append(None)
            backs.append(False)
            wids.append(t[0].isalnum())
            raws.append("")
    return _Toks(toks, starts, wids, tags, backs, raws)


# ------------------------------------------------------------ candidates
@dataclass
class _Cand:
    toks: _Toks
    a: int
    b: int                              # [a, b) token interval
    score: float
    type: int
    parent: int = -1


@dataclass
class Inlink:
    """One incoming link's harvest (LinkInfo/Inlink analogue)."""
    link_text: str = ""
    rss_title: str = ""
    same_host: bool = True


def _attr(tag_raw: str, name: str) -> str | None:
    m = re.search(
        name + r"""\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
        tag_raw, re.IGNORECASE)
    if not m:
        return None
    return m.group(2) if m.group(2) is not None else (
        m.group(3) if m.group(3) is not None else m.group(4))


def _norm_url(u: str) -> str:
    try:
        p = urlsplit(u)
    except ValueError:
        return u
    host = (p.netloc or "").lower()
    path = p.path or "/"
    q = ("?" + p.query) if p.query else ""
    return f"{(p.scheme or 'http').lower()}://{host}{path}{q}"


def title_from_tags(content: str, max_title_len: int = MAX_TITLE_LEN,
                    content_type: str = "html") -> str | None:
    """setTitleFromTags (Title.cpp:59-111): og:title > meta name=title >
    <title>, entity-decoded, length in [3, max_title_len] chars."""
    if content_type not in ("html", "pdf"):
        return None
    pats = []
    if content_type == "html":
        pats.append(r"""(?is)<meta\b[^>]*\bproperty\s*=\s*["']?og:title["']?[^>]*\bcontent\s*=\s*(?:"(?P<c>[^"]*)"|'(?P<d>[^']*)')""")
        pats.append(r"""(?is)<meta\b[^>]*\bname\s*=\s*["']?title["']?[^>]*\bcontent\s*=\s*(?:"(?P<c>[^"]*)"|'(?P<d>[^']*)')""")
    pats.append(r"(?is)<title[^>]*>(?P<c>.*?)</title>")
    for pat in pats:
        m = re.search(pat, content or "")
        if not m:
            continue
        gd = m.groupdict()
        raw = gd.get("c") if gd.get("c") is not None else gd.get("d")
        if raw is None:
            continue
        text = _WS_RE.sub(" ", _html.unescape(
            re.sub(r"<[^>]*>", " ", raw))).strip()
        if 3 <= len(text) <= max_title_len:
            return text
    return None


def _gather_inlink_cands(inlinks: list[Inlink], cands: list[_Cand]) -> None:
    """Title.cpp:225-317 — anchor-text and RSS-title candidates.  The
    reference's quirky ++kcount>=20 guard admits the first 19 of each."""
    kcount = 0
    rcount = 0
    for k in inlinks or []:
        skip_text = False
        if len(k.link_text or "") >= 3:
            kcount += 1
            if kcount >= 20:
                skip_text = True
        skip_rss = False
        if len(k.rss_title or "") > 10:
            rcount += 1
            if rcount >= 20:
                skip_rss = True
        if not skip_text and len(k.link_text or "") >= 3:
            tw = _tok_plain(k.link_text)
            cands.append(_Cand(
                tw, 0, tw.n,
                1.05 if k.same_host else 0.80,
                TT_LINKTEXTLOCAL if k.same_host else TT_LINKTEXTREMOTE))
            if len(cands) + 30 >= MAX_TIT_CANDIDATES:
                break
        if skip_rss or len(k.rss_title or "") <= 10:
            continue
        tw = _tok_plain(k.rss_title)
        cands.append(_Cand(
            tw, 0, tw.n,
            5.0 if k.same_host else 2.0,
            TT_RSSITEMLOCAL if k.same_host else TT_RSSITEMREMOTE))
        if len(cands) + 30 >= MAX_TIT_CANDIDATES:
            break


def _set_link_flags(w: _Toks, url: str, cands: list[_Cand]) -> list[int]:
    """Title.cpp:326-466 — flag words inside non-self links (0x02) and
    harvest self-link ``title=`` attributes as TT_TITLEATT."""
    flags = [0] * w.n
    page = _norm_url(url) if url else ""
    in_link = False
    self_link = False
    for i in range(w.n):
        if in_link and not self_link:
            flags[i] |= 0x02
        if w.tags[i] == "a" and w.backs[i]:
            in_link = False
            continue
        if w.tags[i] != "a" or w.backs[i]:
            continue
        in_link = True
        href = _attr(w.raws[i], "href") or ""
        try:
            target = _norm_url(urljoin(url, href)) if url else ""
        except ValueError:
            target = ""
        self_link = bool(page) and target == page
        if not self_link:
            continue
        # Mixx fix: an onclick attr disqualifies the self link
        if _attr(w.raws[i], "onclick") is not None:
            self_link = False
        atitle = _attr(w.raws[i], "title")
        if not atitle:
            continue
        if len(atitle) > 400:
            continue
        low = atitle.lower()
        if "permalink" in low or "permanent" in low or "share" in low:
            continue
        self_link = False              # do not also harvest the text
        if len(cands) >= MAX_TIT_CANDIDATES:
            continue
        tw = _tok_plain(atitle)
        cands.append(_Cand(tw, 0, tw.n, 3.0, TT_TITLEATT))
        if len(cands) + 20 >= MAX_TIT_CANDIDATES:
            break
    return flags


def _gather_body_cands(w: _Toks, flags: list[int],
                       cands: list[_Cand]) -> None:
    """Title.cpp:476-692 — self-link anchor-text candidates.  Only <a>
    tags are admitted in this reference fork (:519-521)."""
    a_count = 0
    i = 0
    in_bad = 0
    while i < w.n and len(cands) + 10 < MAX_TIT_CANDIDATES:
        tag = w.tags[i]
        if tag in ("script", "style"):
            in_bad += -1 if w.backs[i] else 1
            in_bad = max(in_bad, 0)
        if in_bad or tag != "a" or w.backs[i] or a_count >= 4:
            i += 1
            continue
        i += 1
        if i < w.n and (flags[i] & 0x02):
            continue                    # words of a non-self link
        start = -1
        max_i = i + 200
        restart = False
        while i < w.n and i < max_i:
            ti = w.tags[i]
            if ti == "a" and w.backs[i] and start == -1:
                restart = True          # empty link: goto subloop
                break
            if ti in ("title", "a"):
                if start == -1:
                    restart = True
                break
            if ti is not None and ti in _BREAKING and ti != "span":
                break
            if w.wids[i] and start == -1:
                start = i
            i += 1
        if restart:
            continue
        if start == -1:
            i += 1
            continue
        if i >= w.n:
            break
        if i >= max_i or i - start > 300:
            continue
        size = w.starts[i] - w.starts[start]
        if size > 1000:
            continue
        a_count += 1
        cands.append(_Cand(w, start, i, 1.5, TT_ATAG))


def _first_line_cand(w: _Toks, cands: list[_Cand], content: str) -> None:
    """Title.cpp:697-760 — text docs: the first \\n-terminated line."""
    i = 0
    while i < w.n and not (w.wids[i] and w.toks[i][0].isalpha()):
        i += 1
    if i >= w.n or len(cands) >= MAX_TIT_CANDIDATES:
        return
    t0 = i
    num_words = 0
    while i < w.n and num_words < 128 and \
            (w.wids[i] or "\n" not in w.toks[i]):
        if w.wids[i]:
            num_words += 1
        i += 1
    if i <= w.n and num_words < 128 and i > t0:
        # the \n must exist to terminate the line
        if i < w.n and "\n" in w.toks[i]:
            cands.append(_Cand(w, t0, i, 0.5, TT_FIRSTLINE))


def _url_path_cand(url: str, cands: list[_Cand]) -> None:
    """Title.cpp:763-827 — last path component containing '_' or '-'."""
    try:
        path = urlsplit(url or "").path or ""
    except ValueError:
        return
    for seg in reversed([s for s in path.split("/") if s]):
        if "_" in seg or "-" in seg:
            tw = _tok_plain(seg)
            if tw.n:
                cands.append(_Cand(tw, 0, tw.n, 1.0, TT_URLPATH))
            return


def _is_word_qualified(tok: str) -> bool:
    """isWordQualified (Title.cpp:132-161): a punct token with some
    non-space char; single-char tokens never qualify (amazon fix)."""
    if tok[0].isalnum():
        return False
    if len(tok) == 1:
        return False
    return any(not c.isspace() for c in tok)


def _split_on_root_titles(cands: list[_Cand], root_titles: list[str],
                          query_terms: list[str], is_root: bool) -> None:
    """Title.cpp:830-1000 — subtitle children split on root-title
    matches landing on qualified punctuation."""
    oldn = -2 if is_root else len(cands)
    roots = []
    qset = {t.lower() for t in (query_terms or [])}
    for rt in (root_titles or [])[:20]:
        rt = rt.strip()
        if not rt:
            continue
        # a root segment containing a query term is not used (MF_TITLEGEN)
        if qset and any(tok.lower() in qset
                        for tok in re.findall(r"\w+", rt)):
            continue
        roots.append(rt)
    if not roots:
        return
    for i in range(min(oldn, len(cands))):
        if len(cands) + 3 >= MAX_TIT_CANDIDATES:
            break
        c = cands[i]
        w = c.toks
        text = "".join(w.toks)          # candidate's flat text
        # rebuild offsets relative to the flat text
        offs, acc = [], 0
        for t in w.toks:
            offs.append(acc)
            acc += len(t)
        lasta = c.a
        prev = False
        added = 0
        skip_to = -1
        qualified = True
        k = c.a
        while k < c.b and len(cands) + 3 < MAX_TIT_CANDIDATES:
            if not w.wids[k]:
                qualified = _is_word_qualified(w.toks[k])
                k += 1
                continue
            if not qualified:
                k += 1
                continue
            if skip_to >= 0 and offs[k] < skip_to:
                k += 1
                continue
            hit = None
            for rt in roots:
                if text.startswith(rt, offs[k]):
                    hit = rt
                    break
            if hit is None:
                k += 1
                continue
            skip_to = offs[k] + len(hit)
            e = k + 1
            while e < c.b and offs[e] < skip_to:
                e += 1
            if e < c.b and not _is_word_qualified(w.toks[e]):
                k += 1
                continue
            if prev:
                cands[-2].b = k
                cands[-1].b = k
            if not prev:
                cands.append(_Cand(w, lasta, k, c.score, c.type, parent=i))
                added += 1
            cands.append(_Cand(w, e + 1, c.b, c.score, c.type, parent=i))
            added += 1
            cands.append(_Cand(w, lasta, c.b, c.score, c.type, parent=i))
            added += 1
            lasta = k + 1
            prev = True
            k += 1
        if added:
            c.score = 0.001
        if added == 3:
            cands.pop()


# ------------------------------------------------------------ similarity
def _sim_scores(w: _Toks, a: int, b: int,
                pop: dict[str, int] | None) -> list[tuple[str, float]]:
    out = []
    for i in range(a, min(b, w.n)):
        if not w.wids[i]:
            continue
        wid = w.toks[i].lower()
        p = (pop or {}).get(wid, 0) or 1   # Pops.cpp:50-52 (0 -> 1)
        out.append((wid, 1.0 - p / MAX_POP))
    return out


def get_similarity(w1: _Toks, i0: int, i1: int, w2: _Toks, t0: int,
                   t1: int, pop: dict[str, int] | None = None) -> float:
    """Title.cpp:1438-1620 — popularity-weighted word+phrase
    containment of needle w1[i0:i1) in haystack w2[t0:t1)."""
    if w1.n <= 0 or w2.n <= 0 or i0 >= i1 or t0 >= t1 or i0 < 0 or t0 < 0:
        return 0.0
    table: dict[object, float] = {}
    s1 = _sim_scores(w1, i0, i1, pop)
    total = 0.0
    last = None
    count = 0
    for wid, sc in s1:
        count += 1
        if count > 21:                  # maxCount guard (:1492-1496)
            break
        total += sc
        table[wid] = sc
        if last is not None:
            phr = 0.5 * (sc + last[1])
            total += phr
            table[(last[0], wid)] = phr
        last = (wid, sc)
    found = 0.0
    last = None
    for wid, sc in _sim_scores(w2, t0, t1, pop):
        total += sc
        if wid in table:
            found += 2.0 * sc
        if last is not None:
            phr = 0.5 * (sc + last[1])
            total += phr
            if (last[0], wid) in table:
                found += 2.0 * phr
        last = (wid, sc)
    if total == 0.0:
        return 0.0
    return found / total


_SIM_BOOSTS = ((0.95, 3.0), (0.90, 2.0), (0.85, 1.5), (0.80, 1.4),
               (0.75, 1.3), (0.70, 1.2), (0.60, 1.1), (0.50, 1.08),
               (0.40, 1.04))

_MUTEX_TYPES = frozenset({TT_ATAG})     # body-tag same-type exclusions


def _cross_boost(cands: list[_Cand],
                 pop: dict[str, int] | None) -> None:
    """Title.cpp:1082-1230 — pairwise similarity boosts."""
    n = len(cands)
    for i in range(n):
        ci = cands[i]
        local1 = False
        local2 = False
        total = 1.0
        for j in range(n):
            if j == i:
                continue
            cj = cands[j]
            if cj.parent == i or ci.parent == j:
                continue
            if ci.type == TT_TITLETAG and cj.type == TT_TITLETAG:
                continue
            if ci.type in _MUTEX_TYPES and cj.type == ci.type:
                continue
            if cj.parent != -1 and ci.parent != -1:
                continue
            if ci.type == TT_LINKTEXTLOCAL and cj.type == TT_LINKTEXTLOCAL:
                continue
            if ci.type == TT_RSSITEMLOCAL and cj.type == TT_RSSITEMLOCAL:
                continue
            if cj.type == TT_LINKTEXTLOCAL:
                if local1:
                    continue
                local1 = True
            if cj.type == TT_RSSITEMLOCAL:
                if local2:
                    continue
                local2 = True
            if ci.type == TT_TITLEATT and cj.type == TT_TITLEATT:
                continue
            fp = get_similarity(cj.toks, cj.a, cj.b, ci.toks, ci.a, ci.b,
                                pop)
            boost = 1.0
            for thr, bv in _SIM_BOOSTS:
                if fp >= thr:
                    boost = bv
                    break
            total *= boost
            if total > 100.0:
                break
            ci.score *= boost


# -------------------------------------------------------------- copyTitle
def copy_title(w: _Toks, t0: int, t1: int, src_text: str | None = None,
               max_title_len: int = MAX_TITLE_LEN) -> str:
    """Title.cpp:1624-1767 — transcribe the winner's word span."""
    t1 = min(t1, w.n)
    if w.n == 0 or t0 >= t1:
        return ""
    if src_text is None:
        src_text = "".join(w.toks)
        offs, acc = [], 0
        for t in w.toks:
            offs.append(acc)
            acc += len(t)
    else:
        offs = w.starts
    start = offs[t0]
    end = offs[t1 - 1] + len(w.toks[t1 - 1])
    # include a leading quote (:1672-1675)
    if start > 0 and src_text[start - 1] in ("'", '"'):
        start -= 1
    # strip trailing : space - \n \r | (:1677-1687)
    while end > start and src_text[end - 1] in ":- \n\r|":
        end -= 1
    out = []
    lastp = 0
    char_count = 0
    truncated = False
    i = start
    while i < end:
        ch = src_text[i]
        if char_count >= max_title_len:
            truncated = True
            break
        char_count += 1
        if _unwanted(ch):
            i += 1
            char_count -= 1
            continue
        if not ch.isalnum():
            lastp = len(out)
        if ch == "<":
            out.append("&lt;")
        elif ch == ">":
            out.append("&gt;")
        else:
            out.append(ch)
        i += 1
    if truncated:
        del out[lastp:]
        out.append("...")
    return "".join(out)


# ----------------------------------------------------------- main driver
def make_title(content: str, url: str = "",
               query_terms: list[str] | None = None,
               inlinks: list[Inlink] | None = None,
               root_titles: list[str] | None = None,
               pop: dict[str, int] | None = None,
               content_type: str = "html",
               max_title_len: int = MAX_TITLE_LEN) -> str:
    """The full reference ladder: tag titles, else candidate scoring."""
    s = title_from_tags(content, max_title_len, content_type)
    if s is not None:
        return s
    if max_title_len <= 0:
        return ""
    w = _tok_html(content or "")
    cands: list[_Cand] = []
    _gather_inlink_cands(inlinks or [], cands)
    flags = _set_link_flags(w, url, cands)
    _gather_body_cands(w, flags, cands)
    if content_type in ("text", "unknown"):
        _first_line_cand(w, cands, content or "")
    _url_path_cand(url, cands)

    is_root = False
    if url:
        try:
            p = urlsplit(url)
            is_root = (p.path or "/") == "/" and not p.query
        except ValueError:
            pass
    _split_on_root_titles(cands, root_titles or [], query_terms or [],
                          is_root)

    # query-term boost + http:// penalty (Title.cpp:1003-1080)
    qset = {t.lower() for t in (query_terms or [])}
    for c in cands:
        if c.toks.n <= 0:
            continue
        for j in range(c.a, min(c.b, c.toks.n)):
            if not c.toks.wids[j]:
                continue
            wid = c.toks.toks[j].lower()
            if wid in QUERY_STOPWORDS:
                continue
            if wid in qset:
                c.score *= 1.5
        flat = "".join(c.toks.toks[c.a:min(c.b, c.toks.n)])
        if flat.startswith("http://"):
            c.score *= 0.10

    _cross_boost(cands, pop)

    best = None
    best_score = -1.0
    for c in cands:
        if best is not None and c.score <= best_score:
            continue
        if c.type == TT_URLPATH:
            continue
        if c.a >= c.b:
            continue
        best = c
        best_score = c.score
    if best is None:
        return ""
    src = content if best.toks is w else None
    return copy_title(best.toks, best.a, best.b, src_text=src,
                      max_title_len=max_title_len)


# --------------------------------------------------------------- Spark op
def title_ref(docs, text_col: str = "text", url_col: str | None = None,
              anchors_col: str | None = None,
              query_terms: list[str] | None = None,
              content_type: str = "html",
              max_title_len: int = MAX_TITLE_LEN,
              out_col: str = "title"):
    """Batch pandas-UDF wrapper: adds a title column.  ``anchors_col``
    is an optional array<struct<link_text:string, rss_title:string,
    same_host:boolean>> of harvested inlinks (Msg25 LinkInfo analogue).
    Per-doc kernel work, zero shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F

    terms = query_terms or []

    def _title_batch(text, urlc, anchors):
        out = []
        for t, u, an in zip(text, urlc, anchors):
            inl = []
            rows = [] if an is None else list(an)   # numpy array under Arrow
            for row in rows:
                d = row if isinstance(row, dict) else row.asDict()
                inl.append(Inlink(d.get("link_text") or "",
                                  d.get("rss_title") or "",
                                  bool(d.get("same_host", True))))
            out.append(make_title(t or "", u or "", terms, inl,
                                  content_type=content_type,
                                  max_title_len=max_title_len))
        return pd.Series(out)

    _title = F.pandas_udf(_title_batch, "string")
    urlc = F.col(url_col) if url_col else F.lit("")
    anchors = (F.col(anchors_col) if anchors_col else
               F.array().cast("array<struct<link_text:string,"
                              "rss_title:string,same_host:boolean>>"))
    return docs.withColumn(out_col,
                           _title(F.col(text_col), urlc, anchors))
