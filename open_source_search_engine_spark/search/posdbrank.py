"""The FULL Posdb ranking algorithm: index-time rank vectors + the
min-term-pair sliding-window scorer.

This is the reference's core relevance model, re-expressed for Spark:

Index time (``build_posdb_index``) — every posting carries the four
rank fields a posdb key packs into its 18 bytes (``Posdb.h:3-10``):

* **word position** (``XmlDoc.cpp:21133 getWordPosVec``): alnum words
  advance the cursor by 1, single spaces/dashes by 1, other punct runs
  by 2, tags by 1 (+30 "tag distance" for breaking tags, capped 120 and
  folded in at the next sentence start), sentences are separated by
  ``SENT_UNITS`` = 30 (``XmlDoc.cpp:48``). Consecutive words in a
  sentence are therefore 2 units apart — which is why the scorer's
  default query distance is 2.
* **density rank** (``XmlDoc.cpp:21226 getDensityRanks``): per sentence
  for body/heading, per whole string for title/inurl/inlinktext —
  ``31 - (alnum_words - 1)`` clamped to [1, 31].
* **diversity rank** (``XmlDoc.cpp:21305 getDiversityVec`` +
  ``XmlDoc.cpp:21640 getWordToPhraseRatioWeights``): the word-to-phrase
  ratio kernel — a word that always appears inside the same repeated
  bigram is demoted; the slider parm default is 90 (``Parms.cpp:6588``).
* **word spam rank** (``XmlDoc.cpp:20674 getWordSpamVec`` +
  ``21065 setSpam`` + ``21095 getProbSpam``): repeated-word profiles;
  evenly spaced repeats (low spacing deviation) are probabilistically
  spam; rank = ``15*(100-spam%)/100`` so unspammed = 15.
  NOTE the reference's repeated-fragment vector (``getFragVec``,
  ``XmlDoc.cpp:21381``) is all-ones in this version: the demote path
  does ``ww[j]=(int32)(ww[j]*demote); if (ww[j]<=0) ww[j]=2;``
  (``XmlDoc.cpp:21472-21474``) so ``ww`` can never end ``<= 0`` and
  ``ff[i]=0`` is unreachable — we mirror that by not fragging.

Query time (``posdb_rank_search``) — the PosdbTable.cpp intersection
score, faithful to the shipped defaults:

* per-occurrence weights: hashgroup (``Parms.cpp:4234-4364``), density
  ``scale_quadratic(i,0,31,0.35,1.0)``, diversity
  ``scale_quadratic(i,0,15,1.0,1.0)`` (identity by default), word spam
  ``scale_linear(i,0,15,1/15,1.0)``, linker ``sqrt(1+i)`` for
  inlink-text (``PosdbTable.cpp:492-516 initWeights``), synonym 0.9,
  term-frequency weight ``scale_linear(df/N,0,.5,.5,1.0)``
  (``PosdbTable.cpp:606-629``).
* ``getSingleTermScore`` (``PosdbTable.cpp:876``): top-10 occurrences,
  one per mapped hashgroup (inlink text exempt), each
  ``100*div²*hg²*dens²*spam²[*syn²]``, summed then ×freqWeight².
* non-body pair score matrix (``PosdbTable.cpp:1059
  getTermPairScoreForNonBody`` filled at ``4012-4090``).
* the sliding window over body positions (``PosdbTable.cpp:4184-4330``)
  maximizing the MINIMUM pair score in the window
  (``evalSlidingWindow``, ``PosdbTable.cpp:636``), with title/linktext
  sub-outs at ``FIXED_DISTANCE`` = 400 (``PosdbTable.h:280``).
* Zak's algorithm (``PosdbTable.cpp:4335-4383``): per pair, top-10
  occurrence-pair scores with body terms pinned to the winning window
  (``getTermPairScoreForAny``, ``PosdbTable.cpp:1380``); the doc score
  is the MINIMUM over pairs — the worst-connected pair decides.
* final: ``minScore * (effectiveSiteRank*0.33333+1)`` where a higher
  inlinker site rank pulls the site rank 1/3 of the way up, ×20 when
  the doc language matches the query language or either is unknown
  (``PosdbTable.cpp:4405-4430``).

Spark shape: the index build is one ``mapInPandas`` pass over the raw
documents (Arrow-batched, per-doc NumPy/Python kernels — the same
per-document work the reference does in ``XmlDoc``, distributed by doc
partition, no shuffle).  The query is: termlist scan (bucket-prunable
by term, like the Posdb shard layout) → one hash exchange on doc_id →
per-doc scoring kernel via ``applyInPandas`` (the per-docid inner loop
of PosdbTable, distributed) → ``orderBy().limit(k)``
(TakeOrderedAndProject).  At 100 TB the candidate set is bounded by the
rarest termlist; the only shuffle is the doc_id exchange of the matched
postings, and the kernel is O(total positions × nterms) per doc.
"""

from __future__ import annotations

import math
import re
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# constants (reference file:line in comments)
# ---------------------------------------------------------------------------

# hashgroups, Posdb.h:76-86
HG_BODY = 0
HG_TITLE = 1
HG_HEADING = 2
HG_INLIST = 3
HG_INMETATAG = 4
HG_INLINKTEXT = 5
HG_INTAG = 6
HG_NEIGHBORHOOD = 7
HG_INTERNALINLINKTEXT = 8
HG_INURL = 9
HG_INMENU = 10
HG_END = 11

# Parms.cpp:4234-4364 defaults
HG_W = np.array([1.0, 8.0, 1.5, 0.3, 0.1, 16.0, 1.0, 0.0, 4.0, 1.0, 0.2])

# PosdbTable.cpp:520-526 initWeights s_inBody
IN_BODY = np.zeros(HG_END, dtype=bool)
IN_BODY[[HG_BODY, HG_HEADING, HG_INLIST, HG_INMENU]] = True

MAXDENSITYRANK = 31       # Posdb.h:68
MAXDIVERSITYRANK = 15     # Posdb.h:70
MAXWORDSPAMRANK = 15      # Posdb.h:69
SENT_UNITS = 30           # XmlDoc.cpp:48
FIXED_DISTANCE = 400      # PosdbTable.h:280
MAX_TOP = 10              # PosdbTable.h:335; SearchInput default Parms.cpp:3999
WIKI_WEIGHT = 0.10        # PosdbTable.h:15
WIKI_BIGRAM_WEIGHT = 1.40  # PosdbTable.h:32
SYNONYM_WEIGHT = 0.9      # Parms.cpp:4369-4374
SITE_RANK_MULTIPLIER = 0.33333333  # PosdbTable.h:17
SAME_LANG_WEIGHT = 20.0   # Parms.cpp:4134 default
SLIDER_PARM = 90          # Parms.cpp:6588 (word-to-phrase ratio slider)


def scale_linear(x: float, min_x: float, max_x: float,
                 min_y: float, max_y: float) -> float:
    """ScalingFunctions.cpp:3-12."""
    x = min(max(x, min_x), max_x)
    r = (x - min_x) / (max_x - min_x)
    return min_y + r * (max_y - min_y)


def scale_quadratic(x: float, min_x: float, max_x: float,
                    min_y: float, max_y: float) -> float:
    """ScalingFunctions.cpp:26-37 (including its admitted 'Friday
    afternoon' curve: ((r+1)^2-1)/3)."""
    x = min(max(x, min_x), max_x)
    r = (x - min_x) / (max_x - min_x)
    return ((r + 1.0) * (r + 1.0) - 1.0) / 3.0 * (max_y - min_y) + min_y


# PosdbTable.cpp:495-516 initWeights with Parms defaults
DENSITY_W = np.array([scale_quadratic(i, 0, MAXDENSITYRANK, 0.35, 1.0)
                      for i in range(MAXDENSITYRANK + 1)])
DIVERSITY_W = np.array([scale_quadratic(i, 0, MAXDIVERSITYRANK, 1.0, 1.0)
                        for i in range(MAXDIVERSITYRANK + 1)])
SPAM_W = np.array([scale_linear(i, 0, MAXWORDSPAMRANK,
                                1.0 / MAXWORDSPAMRANK, 1.0)
                   for i in range(MAXWORDSPAMRANK + 1)])
LINKER_W = np.array([math.sqrt(1.0 + i)
                     for i in range(MAXWORDSPAMRANK + 1)])


def term_freq_weight(term_freq: int, num_docs: int) -> float:
    """getTermFreqWeight, PosdbTable.cpp:606-629: df-ratio [0,0.5] →
    weight [0.5,1.0] — frequent terms deliberately weigh MORE."""
    fw = term_freq / num_docs if num_docs else 0.0
    return scale_linear(fw, 0.0, 0.5, 0.5, 1.0)


# ---------------------------------------------------------------------------
# index-time: lexer + rank vectors
# ---------------------------------------------------------------------------

_TOK_RE = re.compile(r"<[^>]*>|[A-Za-z0-9]+|[^<A-Za-z0-9]+")
# isBreakingTagId subset relevant to our corpus HTML
_BREAKING_TAGS = frozenset((
    "p", "br", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "table", "tr", "td", "th", "title", "head", "body", "html",
    "blockquote", "pre", "hr", "form", "meta", "link",
))
_SENT_PUNCT = frozenset(".!?")


class _Word:
    """One alnum word of the document stream."""
    __slots__ = ("term", "hg", "pos", "sent")

    def __init__(self, term: str, hg: int, pos: int, sent: int):
        self.term = term
        self.hg = hg
        self.pos = pos
        self.sent = sent


def lex_html(html: str) -> list[_Word]:
    """One pass over raw HTML → word stream with hashgroups, word
    positions (getWordPosVec rules, XmlDoc.cpp:21133-21225) and
    sentence ids (Sections-lite: sentence punct or breaking tags end a
    sentence)."""
    words: list[_Word] = []
    dist = 0
    tag_dist = 0
    sent = 0
    # pending sentence start, applied at the next word.  True initially:
    # the reference's getWordPosVec adds SENT_UNITS + tag distance for
    # the FIRST sentence too (lastsx starts NULL, XmlDoc.cpp:21201).
    new_sent = True
    region = HG_BODY
    region_stack: list[int] = []
    skip = None          # inside <script>/<style>
    for m in _TOK_RE.finditer(html):
        tok = m.group(0)
        if tok.startswith("<"):
            name = re.match(r"</?\s*([a-zA-Z0-9]+)", tok)
            tname = name.group(1).lower() if name else ""
            closing = tok.startswith("</")
            if tname in ("script", "style"):
                skip = None if closing else tname
                continue
            if not closing and not tok.endswith("/>"):
                if tname == "title":
                    region_stack.append(region)
                    region = HG_TITLE
                elif tname in ("h1", "h2", "h3", "h4"):
                    region_stack.append(region)
                    region = HG_HEADING
            elif closing and tname in ("title", "h1", "h2", "h3", "h4"):
                if region_stack:
                    region = region_stack.pop()
            if tname in _BREAKING_TAGS:
                tag_dist += SENT_UNITS   # XmlDoc.cpp:21165
                new_sent = True
            dist += 1                    # XmlDoc.cpp:21166
            continue
        if skip:
            continue
        if tok[0].isalnum():
            if new_sent:
                # new sentence: +30 units plus capped tag distance
                # (XmlDoc.cpp:21201-21215)
                dist += SENT_UNITS + min(tag_dist, 120)
                sent += 1
                tag_dist = 0
                new_sent = False
            words.append(_Word(tok.lower(), region, dist, sent))
            dist += 1
            continue
        # punct run (XmlDoc.cpp:21173-21186)
        if tok.strip() == "":
            dist += 1
        elif tok == "-":
            dist += 1
        elif tok[0] == "." and (len(tok) > 1 and tok[1].isspace()):
            dist += 1
            new_sent = True
        else:
            dist += 2
        if any(c in _SENT_PUNCT for c in tok):
            new_sent = True
    return words


def density_ranks(words: list[_Word]) -> np.ndarray:
    """getDensityRanks, XmlDoc.cpp:21226: per-sentence for body/heading
    (sentence sections), whole-string for title — dr = 31-(n-1), clamped
    [1,31]."""
    n = len(words)
    dens = np.ones(n, dtype=np.int64)
    # group by (sentence, unit): title counts as its own single unit
    groups: dict[tuple[int, int], list[int]] = {}
    for i, w in enumerate(words):
        if w.hg in (HG_BODY, HG_HEADING):
            key = (0, w.sent)
        else:
            key = (1, w.hg)    # whole-region unit (title/inurl/linktext)
        groups.setdefault(key, []).append(i)
    for idx in groups.values():
        dr = MAXDENSITYRANK - (len(idx) - 1)
        dr = max(dr, 1)
        dens[idx] = dr
    return dens


def _wtab(wrdcount: int, phrcount: int) -> float:
    """s_wtab from getWordToPhraseRatioWeights, XmlDoc.cpp:21666-21745."""
    i, k = wrdcount, phrcount
    if i <= 1:
        return 1.0
    ratio = min(k, i) / i
    ratio = min(ratio, 1.0)
    if i <= 2 and ratio >= .50:
        ratio = .50
    elif i <= 4 and ratio >= .60:
        ratio = .60
    elif i <= 8 and ratio >= .80:
        ratio = .80
    elif i <= 12 and ratio >= .95:
        ratio = .95
    if ratio >= .95:
        ratio = 1.00
    ww = 1.0 - ratio
    if ww < 0.0001:
        ww = 0.0001
    return ww


def _word_to_phrase_ratio_weight(pid1, wid1, pid2, wid2,
                                 counts: dict) -> float:
    """getWordToPhraseRatioWeights, XmlDoc.cpp:21640-21820 with
    sliderParm=90."""
    fsp = SLIDER_PARM / 100.0
    phrcount1 = counts.get(pid1, 0) if pid1 else 0
    phrcount2 = counts.get(pid2, 0) if pid2 else 0
    wrdcount1 = counts.get(wid1, 0) if wid1 else 0
    phrcount_max = phrcount1
    if pid2 and phrcount2 > phrcount_max:
        phrcount_max = phrcount2
    if phrcount_max <= 6:
        mod = 0.50
    elif phrcount_max <= 8:
        mod = 0.20
    elif phrcount_max <= 10:
        mod = 0.05
    elif phrcount_max <= 15:
        mod = 0.03
    else:
        mod = 0.01
    if wrdcount1 > 29:
        ratio = phrcount_max / wrdcount1
        phrcount_max = int(29.0 * ratio + 0.5)
        wrdcount1 = 29
    if phrcount_max > 29:
        ratio = wrdcount1 / phrcount_max
        wrdcount1 = int(29.0 * ratio + 0.5)
        phrcount_max = 29
    ww = mod * _wtab(wrdcount1, phrcount_max)
    ww = fsp * ww + (1.0 - fsp) * 1.00
    if ww <= 0.0:
        ww = 0.01
    return ww


def diversity_ranks(words: list[_Word]) -> np.ndarray:
    """getDiversityVec, XmlDoc.cpp:21305-21375: per word, the
    word-to-phrase ratio weight over the doc's count table (counts of
    words and adjacent-bigram phrases, getCountTable XmlDoc.cpp:4047),
    converted to a 0-15 rank by *15/.55."""
    n = len(words)
    # count table: every word + every same-sentence adjacent bigram
    counts: dict = {}
    pids: list[tuple | None] = [None] * n
    for i, w in enumerate(words):
        counts[w.term] = counts.get(w.term, 0) + 1
        if (i + 1 < n and words[i + 1].sent == w.sent
                and words[i + 1].hg == w.hg):
            pid = (w.term, words[i + 1].term)
            pids[i] = pid
            counts[pid] = counts.get(pid, 0) + 1
    ranks = np.zeros(n, dtype=np.int64)
    for i, w in enumerate(words):
        pid1 = pids[i - 1] if i > 0 else None    # phrase ending at i
        pid2 = pids[i]                           # phrase starting at i
        wid2 = words[i + 1].term if pid2 else None
        ww = _word_to_phrase_ratio_weight(pid1, w.term, pid2, wid2, counts)
        # XmlDoc.cpp:21361-21370: wrank = ww*15/.55, capped
        wrank = int(ww * MAXDIVERSITYRANK / .55)
        ranks[i] = min(wrank, MAXDIVERSITYRANK)
    return ranks


_STOPWORDS = frozenset((
    "the a an and or of to in is it on for as at by be this that with "
    "from are was were has have had not but all can if we you they he "
    "she i its his her their our your my me him them us do does did so "
    "no yes than then there here when where who what which how why will "
    "would could should may might must shall about into over under"
).split())


def _prob_spam(profile: list[int], step: int) -> int:
    """getProbSpam, XmlDoc.cpp:21095-21131 (integer arithmetic,
    256-scaled)."""
    plen = len(profile)
    if plen <= 2:
        return 0
    if step == plen:
        return 0
    dev = 0
    for _j in range(step):
        istop = plen - 1
        avg = 0
        for i in range(0, istop, step):
            avg += profile[i] - profile[i + 1]
        avg = (avg * 256) // istop
        std = 0
        for i in range(0, istop, step):
            d = (profile[i] - profile[i + 1]) * 256 - avg
            std += -d if d < 0 else d
        std //= istop
        dev += std
    dev //= step
    if dev <= 51.2:
        return 100
    prob = ((256 * 100 // 7) * plen) // dev
    return min(prob, 100)


def _set_spam(profile: list[int], num_words: int, spam: np.ndarray,
              num_repeat_spam: int = 20) -> bool:
    """setSpam, XmlDoc.cpp:21065-21093 + the subprofile loop at
    21006-21050.  ``profile`` holds word indices in REVERSE document
    order (built by walking the bucket linked list, latest first) —
    matching the reference's layout."""
    plen = len(profile)
    if plen < 3:
        return False
    if num_words > 10 and (plen * 100) // num_words >= num_repeat_spam:
        for i in range(1, plen):
            spam[profile[i]] = 100
        return True
    if plen > 50:
        for i in range(plen - 50):
            spam[profile[i]] = 100
        profile = profile[plen - 50:]
        plen = 50
    off = 3
    max_step = min(plen // 4, 4)
    for step in range(1, max_step + 1):
        for window in range(0, plen - 3):
            wlen = 3
            while window + wlen <= plen:
                if wlen % step != 0:
                    wlen += 1
                    continue
                prob = _prob_spam(profile[window:window + wlen], step)
                if prob > 20:
                    for i in range(window, window + wlen):
                        if i >= plen - off:
                            break
                        if spam[profile[i]] < prob:
                            spam[profile[i]] = prob
                wlen += 1
    had_spam = any(spam[profile[i]] > 20 for i in range(plen))
    if all(spam[profile[i]] != 0 for i in range(plen)):
        spam[profile[0]] = 0
    return had_spam


def word_spam_ranks(words: list[_Word]) -> np.ndarray:
    """getWordSpamVec, XmlDoc.cpp:20674-20795: per distinct word with
    3+ occurrences, probabilistic spam from position spacing; if >25%
    of candidate words are spammed, everything is 99% spam; final rank
    = 15*(100-spam)/100 (unspammed = 15)."""
    n = len(words)
    spam = np.zeros(n, dtype=np.int64)
    if n == 0:
        return spam
    # profiles per distinct word, positions in reverse doc order
    # (the reference's linked list heads at the LAST occurrence)
    occ: dict[str, list[int]] = {}
    common: dict[str, bool] = {}
    for i, w in enumerate(words):
        occ.setdefault(w.term, []).append(i)
        common[w.term] = w.term in _STOPWORDS or w.term.isdigit()
    for profile in occ.values():
        profile.reverse()
    spam_words = 0
    good_words = 0
    for term, profile in occ.items():
        if len(profile) < 3:
            good_words += 1
            continue
        is_spam = _set_spam(profile, n, spam)
        if common[term]:
            continue
        if is_spam:
            spam_words += 1
        else:
            good_words += 1
    total = spam_words + good_words
    max_percent = 25     # XmlDoc.cpp:20726 "fix this a bit"
    if total > 10:
        percent = spam_words * 100 // total
        if percent > max_percent:
            spam[(spam < 99)] = 99
            # non-words can't happen here: spam only indexes words
    return (MAXWORDSPAMRANK * (100 - spam)) // 100


def parse_doc_postings(html: str, url: str | None = None
                       ) -> list[tuple[str, int, int, int, int, int]]:
    """One document → posting tuples
    (term, hashgroup, pos, density, diversity, wordspam)."""
    words = lex_html(html)
    out: list[tuple[str, int, int, int, int, int]] = []
    if words:
        dens = density_ranks(words)
        divr = diversity_ranks(words)
        spam = word_spam_ranks(words)
        out.extend(
            (w.term, w.hg, w.pos, int(dens[i]), int(divr[i]), int(spam[i]))
            for i, w in enumerate(words))
    if url:
        # url words are hashed outside the document word stream
        # (XmlDoc hashUrl): whole-string density, no spam/diversity
        # demotion (ranks 15 = weight 1.0)
        utoks = re.findall(r"[A-Za-z0-9]+", url.lower())
        udr = max(MAXDENSITYRANK - (len(utoks) - 1), 1) if utoks else 1
        upos = 0
        for t in utoks:
            out.append((t, HG_INURL, upos, udr, MAXDIVERSITYRANK,
                        MAXWORDSPAMRANK))
            upos += 2
    return out


_INDEX_SCHEMA = ("doc_id long, term string, hashgroup int, pos int, "
                 "density int, diversity int, wordspam int, is_syn int, "
                 "wiki_bigram int")


def build_posdb_index(docs: DataFrame, html_col: str = "content",
                      id_col: str = "doc_id",
                      url_col: str | None = None,
                      links: DataFrame | None = None) -> DataFrame:
    """Documents → rank-carrying postings, one Arrow-batched pass
    (the XmlDoc per-document indexing work, distributed; zero shuffle).
    At scale write with ``sources.writers.write_postings_bucketed`` so
    termlist scans prune to one bucket.

    ``links`` (dst_doc_id, anchor_text, src_site_rank) adds each
    incoming anchor text as HASHGROUP_INLINKTEXT postings on the
    destination doc: its own position space, whole-string density, and
    — the reference's trick — the LINKER's site rank stored in the
    word-spam bits ("for inlinktext terms the spam rank is the siterank
    of the inlinker!", Posdb.h:37-38), which the scorer reads through
    the sqrt(1+i) linker weight."""
    cols = [id_col, html_col] + ([url_col] if url_col else [])

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "term", "hashgroup", "pos", "density",
                "diversity", "wordspam")}
            for row in pdf.itertuples(index=False):
                doc_id = getattr(row, id_col)
                html = getattr(row, html_col) or ""
                url = getattr(row, url_col) if url_col else None
                for t, hg, pos, dn, dv, sp in parse_doc_postings(html, url):
                    out["doc_id"].append(doc_id)
                    out["term"].append(t)
                    out["hashgroup"].append(hg)
                    out["pos"].append(pos)
                    out["density"].append(dn)
                    out["diversity"].append(dv)
                    out["wordspam"].append(sp)
            res = pd.DataFrame(out)
            res["is_syn"] = 0
            res["wiki_bigram"] = 0
            yield res

    base = docs.select(*cols).mapInPandas(gen, _INDEX_SCHEMA)
    if links is None:
        return base

    def link_gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "term", "hashgroup", "pos", "density",
                "diversity", "wordspam")}
            for row in pdf.itertuples(index=False):
                toks = re.findall(r"[A-Za-z0-9]+",
                                  (row.anchor_text or "").lower())
                if not toks:
                    continue
                # whole-string density (getDensityRanks with no
                # sections); linker site rank in the spam bits
                dr = max(MAXDENSITYRANK - (len(toks) - 1), 1)
                sr = int(row.src_site_rank or 0)
                sr = min(max(sr, 0), MAXWORDSPAMRANK)
                # each link text gets its own position space, spaced
                # >50 units so cross-link pairs hit the FIXED_DISTANCE
                # rule ("different link texts", PosdbTable.cpp:1545)
                pos = int(row.ln0) * 1000
                for t in toks:
                    out["doc_id"].append(row.dst_doc_id)
                    out["term"].append(t)
                    out["hashgroup"].append(HG_INLINKTEXT)
                    out["pos"].append(pos)
                    out["density"].append(dr)
                    out["diversity"].append(MAXDIVERSITYRANK)
                    out["wordspam"].append(sr)
                    pos += 2
            res = pd.DataFrame(out)
            res["is_syn"] = 0
            res["wiki_bigram"] = 0
            yield res

    from pyspark.sql import Window
    numbered = links.select(
        "dst_doc_id", "anchor_text", "src_site_rank",
        (F.row_number().over(
            Window.partitionBy("dst_doc_id")
            .orderBy("anchor_text", "src_site_rank")) - 1).alias("ln0"))
    link_posts = numbered.mapInPandas(link_gen, _INDEX_SCHEMA)
    return base.unionByName(link_posts)


# ---------------------------------------------------------------------------
# query-time scorer (the PosdbTable per-docid kernel)
# ---------------------------------------------------------------------------

class TermList:
    """One query term's occurrences in one doc, sorted by position —
    the miniMergedList analogue."""
    __slots__ = ("pos", "hg", "dens", "divr", "spam", "syn", "wb")

    def __init__(self, pos, hg, dens, divr, spam, syn=None, wb=None):
        order = np.argsort(np.asarray(pos), kind="stable")
        self.pos = np.asarray(pos, dtype=np.int64)[order]
        self.hg = np.asarray(hg, dtype=np.int64)[order]
        self.dens = np.asarray(dens, dtype=np.int64)[order]
        self.divr = np.asarray(divr, dtype=np.int64)[order]
        self.spam = np.asarray(spam, dtype=np.int64)[order]
        z = np.zeros(len(self.pos), dtype=np.int64)
        self.syn = z if syn is None else np.asarray(syn, dtype=np.int64)[order]
        self.wb = z if wb is None else np.asarray(wb, dtype=np.int64)[order]

    def __len__(self):
        return len(self.pos)


def _spam_w(hg: int, spam: int) -> float:
    return LINKER_W[spam] if hg == HG_INLINKTEXT else SPAM_W[spam]


def _single_term_score(L: TermList, freq_w: float,
                       max_top: int = MAX_TOP) -> tuple[float, int | None]:
    """getSingleTermScore, PosdbTable.cpp:876-1020.  Returns (score,
    index of best-scoring NON-body occurrence or None) — the latter is
    bestPos[i] for the sliding-window sub-outs."""
    best_scores: list[float] = []
    best_mhg: list[int] = []
    best_k: list[int] = []
    minx = -1
    nonbody_max = -1.0
    best_pos = None
    for k in range(len(L)):
        hg = int(L.hg[k])
        score = 100.0
        dw = DIVERSITY_W[L.divr[k]]
        score *= dw * dw
        mhg = HG_BODY if IN_BODY[hg] else hg
        score *= HG_W[hg] * HG_W[hg]
        de = DENSITY_W[L.dens[k]]
        score *= de * de
        sw = _spam_w(hg, int(L.spam[k]))
        score *= sw * sw
        if L.syn[k]:
            score *= SYNONYM_WEIGHT * SYNONYM_WEIGHT
        bro = -1
        for t in range(len(best_scores)):
            if best_mhg[t] == mhg and hg != HG_INLINKTEXT:
                bro = t
                break
        if bro >= 0:
            if score > best_scores[bro]:
                best_scores[bro] = score
                best_mhg[bro] = mhg
                best_k[bro] = k
        elif len(best_scores) < max_top:
            best_scores.append(score)
            best_mhg.append(mhg)
            best_k.append(k)
        elif score > best_scores[minx]:
            best_scores[minx] = score
            best_mhg[minx] = mhg
            best_k[minx] = k
        if len(best_scores) >= max_top:
            # last index of the minimum (PosdbTable.cpp:965-971)
            minx = 0
            for t in range(1, max_top):
                if best_scores[t] > best_scores[minx]:
                    continue
                minx = t
        if score > nonbody_max and not IN_BODY[hg]:
            nonbody_max = score
            best_pos = k
    total = 0.0
    for t in range(len(best_scores)):
        if L.wb[best_k[t]]:
            total += (best_scores[t] * WIKI_BIGRAM_WEIGHT
                      * WIKI_BIGRAM_WEIGHT)
        else:
            total += best_scores[t]
    total *= freq_w * freq_w
    return total, best_pos


def _pair_occ_score(Li: TermList, ki: int, Lj: TermList, kj: int,
                    dist: float) -> float:
    """The shared pair score body: 100*denw*denw*hgw*hgw[*syn][*wiki
    bigram]*spamw*spamw/(dist+1)."""
    hg1, hg2 = int(Li.hg[ki]), int(Lj.hg[kj])
    score = 100.0 * DENSITY_W[Li.dens[ki]] * DENSITY_W[Lj.dens[kj]]
    score *= HG_W[hg1] * HG_W[hg2]
    if Li.syn[ki]:
        score *= SYNONYM_WEIGHT
    if Lj.syn[kj]:
        score *= SYNONYM_WEIGHT
    score *= _spam_w(hg1, int(Li.spam[ki])) * _spam_w(hg2, int(Lj.spam[kj]))
    return score / (dist + 1.0)


def _pair_nonbody_max(Li: TermList, Lj: TermList, qdist: int) -> float:
    """getTermPairScoreForNonBody, PosdbTable.cpp:1059-1310: zipper max
    over non-body-compatible occurrence pairs."""
    ki, kj = 0, 0
    best = -1.0
    while True:
        p1, p2 = int(Li.pos[ki]), int(Lj.pos[kj])
        hg1, hg2 = int(Li.hg[ki]), int(Lj.hg[kj])
        in_order = p1 <= p2
        # s_isCompatible: neither side in body (PosdbTable.cpp:517-560)
        if not (IN_BODY[hg1] or IN_BODY[hg2]):
            dist = (p2 - p1) if in_order else (p1 - p2)
            if dist < 2:
                dist = 2
            if dist > 50:
                dist = FIXED_DISTANCE
            if in_order:
                if dist >= qdist:
                    dist -= qdist
            else:
                if dist >= qdist:
                    dist -= 1           # dist-qdist then +qdist-1
                else:
                    dist += 1
            score = _pair_occ_score(Li, ki, Lj, kj, dist)
            if score > best:
                best = score
        if in_order:
            ki += 1
            if ki >= len(Li):
                return best
        else:
            kj += 1
            if kj >= len(Lj):
                return best


def _window_pair_score(Li: TermList, ki, Lj: TermList, kj,
                       qdist: int, fixed: int) -> float:
    """getTermPairScoreForWindow, PosdbTable.cpp:1313-1376."""
    if ki is None or kj is None:
        return -1.0
    if fixed:
        dist = float(fixed)
    else:
        p1, p2 = int(Li.pos[ki]), int(Lj.pos[kj])
        dist = abs(p2 - p1)
        if dist < 2:
            dist = 2
        if dist >= qdist:
            dist -= qdist
        if p2 < p1:
            dist += 1
    return _pair_occ_score(Li, ki, Lj, kj, dist)


def _pair_score_for_any(Li: TermList, Lj: TermList, qdist: int,
                        in_quoted: bool, win_i, win_j,
                        max_top: int = MAX_TOP) -> float:
    """getTermPairScoreForAny, PosdbTable.cpp:1380-1860: zipper with
    body occurrences pinned to the winning window, top-10 pool keyed on
    mapped hashgroups (link text exempt), sum of the pool."""
    ki, kj = 0, 0
    best_scores: list[float] = []
    best_m1: list[int] = []
    best_m2: list[int] = []
    minx = -1
    while True:
        p1, p2 = int(Li.pos[ki]), int(Lj.pos[kj])
        hg1, hg2 = int(Li.hg[ki]), int(Lj.hg[kj])
        mhg1 = HG_BODY if IN_BODY[hg1] else hg1
        mhg2 = HG_BODY if IN_BODY[hg2] else hg2
        in_order = p1 <= p2
        skip = False
        # body restricted to the winning sliding window
        if IN_BODY[hg1] and ki != win_i:
            skip = True
        if IN_BODY[hg2] and kj != win_j:
            skip = True
        if not skip:
            if in_order:
                dist = p2 - p1
                if in_quoted and ((dist > qdist and dist - qdist >= 2)
                                  or (dist < qdist and qdist - dist >= 2)):
                    skip = True
            else:
                if in_quoted:
                    skip = True       # out of order in a quoted phrase
                dist = p1 - p2
        if not skip:
            if dist < 2:
                dist = 2
            if dist < 50:
                pass
            elif mhg1 != mhg2:
                dist = FIXED_DISTANCE
            elif mhg1 == HG_INLINKTEXT:
                dist = FIXED_DISTANCE   # different link texts
            if in_order:
                if dist >= qdist:
                    dist -= qdist
            else:
                if dist >= qdist:
                    dist -= 1
                else:
                    dist += 1
            score = _pair_occ_score(Li, ki, Lj, kj, dist)
            if Li.wb[ki]:
                score *= WIKI_BIGRAM_WEIGHT
            if Lj.wb[kj]:
                score *= WIKI_BIGRAM_WEIGHT
            bro = -1
            for t in range(len(best_scores)):
                if best_m1[t] == mhg1 and hg1 != HG_INLINKTEXT:
                    bro = t
                    break
                if best_m2[t] == mhg2 and hg2 != HG_INLINKTEXT:
                    bro = t
                    break
            if bro >= 0:
                if score > best_scores[bro]:
                    best_scores[bro] = score
                    best_m1[bro] = mhg1
                    best_m2[bro] = mhg2
            elif len(best_scores) < max_top:
                best_scores.append(score)
                best_m1.append(mhg1)
                best_m2.append(mhg2)
            elif score > best_scores[minx]:
                best_scores[minx] = score
                best_m1[minx] = mhg1
                best_m2[minx] = mhg2
            if len(best_scores) >= max_top:
                minx = 0
                for t in range(1, max_top):
                    if best_scores[t] > best_scores[minx]:
                        continue
                    minx = t
        if in_order:
            ki += 1
            if ki >= len(Li):
                break
        else:
            kj += 1
            if kj >= len(Lj):
                break
    return float(sum(best_scores))


def _first_body_idx(L: TermList, start: int = 0):
    for k in range(start, len(L)):
        if IN_BODY[int(L.hg[k])]:
            return k
    return None


def score_doc(lists: list[TermList], freq_ws: list[float],
              qpos: list[int] | None = None,
              quoted: bool = False,
              quoted_ids: list[int] | None = None,
              wiki_phrase: bool = False,
              wiki_ids: list[int] | None = None,
              site_rank: int = 0,
              doc_lang: str | None = None,
              qlang: str | None = None,
              max_top: int = MAX_TOP) -> float:
    """The full PosdbTable per-docid score (intersectLists tail,
    PosdbTable.cpp:4096-4430).  Returns <= 0.0 when the doc is
    filtered (minScore <= 0).

    ``quoted_ids`` assigns each term its quoted-phrase group
    (m_quotedStartIds, -1 = unquoted); ``quoted=True`` is the
    single-phrase shorthand.  ``wiki_ids`` assigns each term its
    wikipedia-phrase group (m_wikiPhraseIds, 0 = none;
    ``wiki_phrase=True`` is the all-one-phrase shorthand): a pair in
    the same wiki phrase targets its query spacing and takes the
    WIKI_WEIGHT haircut (PosdbTable.cpp:699-712)."""
    nt = len(lists)
    if qpos is None:
        qpos = [2 * i for i in range(nt)]
    if quoted_ids is None:
        quoted_ids = [0] * nt if quoted else [-1] * nt
    if wiki_ids is None:
        wiki_ids = [1] * nt if wiki_phrase else [0] * nt

    def pair_quoted(i: int, j: int) -> bool:
        return quoted_ids[i] >= 0 and quoted_ids[i] == quoted_ids[j]

    def pair_qdist_wts(i: int, j: int) -> tuple[int, float]:
        if wiki_ids[i] and wiki_ids[i] == wiki_ids[j]:
            return qpos[j] - qpos[i], WIKI_WEIGHT
        return 2, 1.0

    # ---- single term loop (PosdbTable.cpp:4101-4137)
    min_single = float("inf")
    best_pos: list[int | None] = []
    for i, L in enumerate(lists):
        sts, bp = _single_term_score(L, freq_ws[i], max_top)
        best_pos.append(bp)
        if sts < min_single:
            min_single = sts

    # highest inlinker site rank from the first rec of the first list
    # (PosdbTable.cpp:4139-4175)
    highest_inlinker = -1
    if nt and len(lists[0]):
        if int(lists[0].hg[0]) == HG_INLINKTEXT:
            highest_inlinker = int(lists[0].spam[0])

    min_pair = -1.0
    if nt > 1:
        # ---- non-body score matrix (PosdbTable.cpp:4012-4090)
        matrix: dict[tuple[int, int], float] = {}
        for i in range(nt):
            for j in range(i + 1, nt):
                qd, wts = pair_qdist_wts(i, j)
                pss = _pair_nonbody_max(lists[i], lists[j], qd)
                if pss < 0:
                    matrix[(i, j)] = -1.0
                else:
                    matrix[(i, j)] = pss * wts * freq_ws[i] * freq_ws[j]

        # ---- sliding window over body positions
        # (PosdbTable.cpp:4184-4330)
        xpos: list[int | None] = [_first_body_idx(L) for L in lists]
        best_window_score = -2.0
        window: list[int | None] = [None] * nt

        def eval_window():
            nonlocal best_window_score, window
            win_min = 999999999.0
            for i in range(nt):
                for j in range(i + 1, nt):
                    qd, ww = pair_qdist_wts(i, j)
                    mx = _window_pair_score(lists[i], xpos[i],
                                            lists[j], xpos[j], qd, 0)
                    for a, b in ((best_pos[i], xpos[j]),
                                 (best_pos[i], best_pos[j]),
                                 (xpos[i], best_pos[j])):
                        sc = _window_pair_score(lists[i], a, lists[j], b,
                                                qd, FIXED_DISTANCE)
                        if sc > mx:
                            mx = sc
                    if ww != 1.0:
                        mx *= ww
                    mx *= freq_ws[i] * freq_ws[j]
                    if matrix[(i, j)] > mx:
                        mx = matrix[(i, j)]
                    if pair_quoted(i, j):
                        # exact query spacing required
                        # (PosdbTable.cpp:787-838)
                        ki, kj = xpos[i], xpos[j]
                        if ki is None or kj is None:
                            mx = -1.0
                        else:
                            d = int(lists[j].pos[kj]) - int(lists[i].pos[ki])
                            qd2 = qpos[j] - qpos[i]
                            if d < 0 or abs(d - qd2) > 1:
                                mx = -1.0
                    if mx < win_min:
                        win_min = mx
            if win_min > best_window_score:
                best_window_score = win_min
                window = list(xpos)

        if any(x is not None for x in xpos):
            while True:
                eval_window()
                # advance the min body position (advanceMin/advanceAgain)
                advanced = False
                while not advanced:
                    minx = -1
                    minpos = None
                    for x in range(nt):
                        if xpos[x] is None:
                            continue
                        p = int(lists[x].pos[xpos[x]])
                        if minpos is None or p < minpos:
                            minpos = p
                            minx = x
                    if minx < 0:
                        break
                    nxt = _first_body_idx(lists[minx], xpos[minx] + 1)
                    xpos[minx] = nxt
                    if nxt is not None:
                        advanced = True
                    elif all(x is None for x in xpos):
                        break
                if not advanced:
                    break

        # ---- Zak's algo (PosdbTable.cpp:4335-4383)
        for i in range(nt):
            for j in range(i + 1, nt):
                qd, wts = pair_qdist_wts(i, j)
                inq = pair_quoted(i, j)
                if inq:
                    qd = qpos[j] - qpos[i]
                sc = _pair_score_for_any(lists[i], lists[j], qd, inq,
                                         window[i], window[j], max_top)
                sc *= wts * freq_ws[i] * freq_ws[j]
                if min_pair >= 0.0 and sc >= min_pair:
                    continue
                min_pair = sc

    min_score = 999999999.0
    if 0.0 <= min_pair < min_score:
        min_score = min_pair
    if min_single < min_score:
        min_score = min_single
    if min_score <= 0.0:
        return 0.0

    eff = float(site_rank)
    if highest_inlinker > site_rank:
        eff = site_rank + (highest_inlinker - site_rank) / 3.0
    score = min_score * (eff * SITE_RANK_MULTIPLIER + 1.0)
    if qlang is None or doc_lang is None or qlang == doc_lang:
        score *= SAME_LANG_WEIGHT
    return score


# ---------------------------------------------------------------------------
# the Spark query plan
# ---------------------------------------------------------------------------

def wiki_phrase_ids(words: list[str],
                    titles: set[tuple[str, ...]]) -> list[int]:
    """Wikipedia-phrase grouping for query words (Wiki::
    getNumWordsInWikiPhrase, Wiki.cpp:175: longest run, up to 12
    words, whose cumulative hash is a wikipedia title claims the
    phrase).  Greedy left-to-right; ids start at 1, 0 = not in a
    phrase."""
    n = len(words)
    ids = [0] * n
    nid = 0
    i = 0
    lw = [w.lower() for w in words]
    while i < n:
        best = 0
        for j in range(min(i + 12, n), i + 1, -1):
            if tuple(lw[i:j]) in titles:
                best = j
                break
        if best:
            nid += 1
            for k2 in range(i, best):
                ids[k2] = nid
            i = best
        else:
            i += 1
    return ids


def posdb_rank_search(index: DataFrame, doc_meta: DataFrame | None,
                      terms: list[str], num_docs: int, k: int = 10,
                      quoted: bool = False,
                      quoted_ids: list[int] | None = None,
                      qpos: list[int] | None = None,
                      wiki_ids: list[int] | None = None,
                      qlang: str | None = None,
                      synonyms: dict[str, list[str]] | None = None,
                      dfreq: dict[str, int] | None = None
                      ) -> DataFrame:
    """AND the termlists, score each candidate doc with the full
    PosdbTable kernel, return top-k (doc_id, score).

    ``synonyms`` maps a query term to its alternate forms: each form's
    postings are merged into the base term's list flagged is_syn=1 —
    the reference's QueryTermInfo sublist mini-merge (the 0.9 synonym
    weight then applies per occurrence, PosdbTable.cpp:929-932), and a
    doc matches term i through ANY of its forms.

    Plan: termlist filter (bucket-prunable) → distinct-group count to
    AND (one partial-aggregated shuffle) → doc_id-grouped scoring via
    applyInPandas → TakeOrderedAndProject."""
    terms = [t.lower() for t in terms]
    nt = len(terms)
    # term -> (query-term group, is_syn)
    group_of: dict[str, tuple[int, int]] = {
        t: (i, 0) for i, t in enumerate(terms)}
    if synonyms:
        for base, alts in synonyms.items():
            bi = group_of.get(base.lower())
            if bi is None:
                continue
            for a in alts:
                group_of.setdefault(a.lower(), (bi[0], 1))
    all_terms = list(group_of)
    tl = index.filter(F.col("term").isin(all_terms))
    grp = F.lit(None).cast("int")
    syn = F.lit(None).cast("int")
    for t, (gi, isyn) in reversed(group_of.items()):
        grp = F.when(F.col("term") == t, F.lit(gi)).otherwise(grp)
        syn = F.when(F.col("term") == t, F.lit(isyn)).otherwise(syn)
    tl = (tl.withColumn("_grp", grp)
          .withColumn("is_syn", F.greatest("is_syn", syn)))
    cand = (tl.groupBy("doc_id")
            .agg(F.count_distinct("_grp").alias("_n"))
            .filter(F.col("_n") == nt)
            .select("doc_id"))
    matched = tl.join(cand, "doc_id")
    # per-group doc frequencies (the BASE term's termlist sizes the
    # freq weight, like the QueryTermInfo's representative term);
    # callers scoring a RESTRICTED candidate set pass the full-corpus
    # counts in so freq weights stay corpus-wide
    if dfreq is None:
        dfreq = {r["term"]: r["df"] for r in
                 tl.groupBy("term").agg(
                     F.count_distinct("doc_id").alias("df")).collect()}
    freq_ws = [term_freq_weight(dfreq.get(t, 0), num_docs) for t in terms]
    if doc_meta is not None:
        meta = doc_meta.select(
            "doc_id",
            F.col("site_rank").cast("int").alias("_sr"),
            F.col("lang").alias("_lang"))
        matched = matched.join(meta, "doc_id", "left")
    else:
        matched = matched.withColumn("_sr", F.lit(0)) \
                         .withColumn("_lang", F.lit(None).cast("string"))

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf["doc_id"].iloc[0]
        lists: list[TermList | None] = [None] * nt
        for gi, g in pdf.groupby("_grp"):
            lists[int(gi)] = TermList(
                g["pos"].values, g["hashgroup"].values,
                g["density"].values, g["diversity"].values,
                g["wordspam"].values, g["is_syn"].values,
                g["wiki_bigram"].values)
        if any(x is None for x in lists):
            return pd.DataFrame({"doc_id": [], "score": []})
        sr = int(pdf["_sr"].iloc[0]) if pd.notna(pdf["_sr"].iloc[0]) else 0
        dl = pdf["_lang"].iloc[0]
        dl = dl if isinstance(dl, str) else None
        s = score_doc(lists, freq_ws, qpos=qpos, quoted=quoted,
                      quoted_ids=quoted_ids, wiki_ids=wiki_ids,
                      site_rank=sr, doc_lang=dl, qlang=qlang)
        if s <= 0.0:
            return pd.DataFrame({"doc_id": [], "score": []})
        return pd.DataFrame({"doc_id": [doc_id], "score": [s]})

    scored = matched.groupBy("doc_id").applyInPandas(
        score_group, "doc_id long, score double")
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)


def parsed_rank_search(index: DataFrame, doc_meta: DataFrame | None,
                       query: str, num_docs: int, k: int = 10,
                       qlang: str | None = None,
                       wiki_titles: set | None = None,
                       capped: bool = False,
                       candidate_cap: int = 100) -> DataFrame:
    """Q1 → full Posdb ranking: parse the query (boolean grammar,
    Query.cpp) and, for the AND/phrase shapes PosdbTable scores
    natively, run the min-term-pair ranker with per-term query
    positions and quoted groups (m_qpos / m_quotedStartIds).  Query
    shapes outside that family (OR / NOT / field operators) raise —
    callers route those through queryparse.search_query, which is the
    reference's behavior boundary too: boolean queries skip the
    sliding-window scorer (PosdbTable.cpp:4009 boolJump2)."""
    from .queryparse import And, Phrase, Term, parse_query

    ast = parse_query(query)
    flat = list(ast.children) if isinstance(ast, And) else [ast]
    terms: list[str] = []
    qpos: list[int] = []
    quoted_ids: list[int] = []
    pos = 0
    for gid, node in enumerate(flat):
        if isinstance(node, Term):
            terms.append(node.text)
            qpos.append(pos)
            quoted_ids.append(-1)
            pos += 2
        elif isinstance(node, Phrase):
            for w in node.words:
                terms.append(w)
                qpos.append(pos)
                quoted_ids.append(gid)
                pos += 2
        else:
            raise ValueError(
                "parsed_rank_search handles AND/phrase queries; use "
                "queryparse.search_query for boolean/field operators")
    wids = wiki_phrase_ids(terms, wiki_titles) if wiki_titles else None
    if capped:
        # the admissible-bound two-phase plan (the production serve
        # path at corpus scale) — result-equal to the full scan
        return posdb_rank_search_capped(
            index, doc_meta, terms, num_docs, k=k,
            candidate_cap=candidate_cap, qlang=qlang,
            quoted_ids=quoted_ids, qpos=qpos, wiki_ids=wids)
    return posdb_rank_search(index, doc_meta, terms, num_docs, k=k,
                             quoted_ids=quoted_ids, qpos=qpos,
                             wiki_ids=wids, qlang=qlang)


def _occ_bound_col():
    """JVM-side per-occurrence score UPPER BOUND: the exact occurrence
    score with the <=1 factors (synonym 0.9^2) dropped and the >1 factor
    (wiki-bigram 1.4^2) kept — dominates the kernel's value."""
    def arr(vals):
        return F.array(*[F.lit(float(v)) for v in vals])
    div2 = F.element_at(arr(DIVERSITY_W ** 2), F.col("diversity") + 1)
    hg2 = F.element_at(arr(HG_W ** 2), F.col("hashgroup") + 1)
    den2 = F.element_at(arr(DENSITY_W ** 2), F.col("density") + 1)
    spam2 = F.when(
        F.col("hashgroup") == HG_INLINKTEXT,
        F.element_at(arr(LINKER_W ** 2), F.col("wordspam") + 1)) \
        .otherwise(F.element_at(arr(SPAM_W ** 2), F.col("wordspam") + 1))
    wb = F.when(F.col("wiki_bigram") == 1,
                F.lit(WIKI_BIGRAM_WEIGHT ** 2)).otherwise(F.lit(1.0))
    return F.lit(100.0) * div2 * hg2 * den2 * spam2 * wb


def posdb_rank_search_capped(index: DataFrame,
                             doc_meta: DataFrame | None,
                             terms: list[str], num_docs: int,
                             k: int = 10, candidate_cap: int = 1000,
                             qlang: str | None = None,
                             quoted: bool = False,
                             quoted_ids: list[int] | None = None,
                             qpos: list[int] | None = None,
                             wiki_ids: list[int] | None = None,
                             synonyms: dict[str, list[str]] | None = None
                             ) -> DataFrame:
    """The 100 TB two-phase plan for :func:`posdb_rank_search`: a cheap
    JVM-side ADMISSIBLE upper bound prunes the candidate set before the
    per-doc Python kernel runs.

    The bound: ``score <= min_t(fw_t² · Σ top-10 occurrence bounds)
    × (sr + (15-sr)/3)·⅓+1) × sameLang``.  It dominates the kernel
    because minScore <= minSingleScore, the single-term top-10 sum can
    only shrink under the dup-hashgroup rule, per-occurrence <=1
    factors are dropped, and the effective site rank is at most
    ``sr + (15-sr)/3`` (inlinker ranks cap at 15).  The reference's own
    second-pass structure (PosdbTable secondPass re-scores only the
    top tree) motivates the same shape: score the plausible top, keep
    an exactness certificate.

    Docs are scored in bound order; if the k-th kernel score clears the
    best UNSCORED bound the result is provably exact, otherwise the cap
    doubles and the scan continues (never wrong, just slower on
    adversarial inputs).  Eager: returns a small materialized frame.

    r5: supports the FULL posdb_rank_search feature surface.  Synonym
    forms join their base term's group (bound per GROUP, the base
    term's freq weight — the QueryTermInfo sublist mini-merge shape).
    The bound needs NO query-feature adjustment because the kernel's
    final ``min_score = min(min_pair, min_single)`` (score_doc) is
    always <= the single-term score the bound dominates — quoted
    spacing gates, qpos targets and query-side wiki-phrase weights all
    act on PAIR scores only, and the index-side wiki-bigram factor on
    singles is already in _occ_bound_col.  Quoted phrases additionally
    get a JVM-side candidate PREFILTER: a doc whose quoted pair has no
    in-order occurrence pair within +-1 of the query spacing provably
    kernel-scores 0 (the _pair_score_for_any gate zeroes the pair, and
    the quoted pair participates in min_pair), so it is dropped before
    any Python runs — the join-form of the bigram-termlist trick.
    Equality at caps 3/10/100 is pinned for every configuration in
    tests/test_posdbrank.py."""
    spark = index.sparkSession
    terms = [t.lower() for t in terms]
    nt = len(terms)
    group_of: dict[str, tuple[int, int]] = {
        t: (i, 0) for i, t in enumerate(terms)}
    if synonyms:
        for base, alts in synonyms.items():
            bi = group_of.get(base.lower())
            if bi is None:
                continue
            for a in alts:
                group_of.setdefault(a.lower(), (bi[0], 1))
    all_terms = list(group_of)
    from pyspark import StorageLevel

    from ..memutil import safe_unpersist
    # persist the query terms' postings ONCE: every structure below —
    # the AND, the bound aggregate, the phrase prefilter and each
    # bound-ordered kernel page — reads this slice, and its lineage ends
    # in the expensive index-build Arrow stage that must never re-run
    # per page.  Released before returning (the result is collected).
    tl = index.filter(F.col("term").isin(all_terms)) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    grp = F.lit(None).cast("int")
    for t, (gi, _isyn) in reversed(group_of.items()):
        grp = F.when(F.col("term") == t, F.lit(gi)).otherwise(grp)
    tl_g = tl.withColumn("_grp", grp)
    cand = (tl_g.groupBy("doc_id")
            .agg(F.count_distinct("_grp").alias("_n"))
            .filter(F.col("_n") == nt)
            .select("doc_id"))
    if quoted_ids is None and quoted:
        quoted_ids = [0] * nt
    if quoted_ids is not None and qpos is not None \
            and any(q >= 0 for q in quoted_ids):
        # quoted-phrase prefilter (see docstring): consecutive quoted
        # pair (a,b) at query distance qd must align somewhere in-order
        # within the +-1 gate, else the doc scores exactly 0
        qgroups: dict[int, list[int]] = {}
        for i, q in enumerate(quoted_ids):
            if q >= 0:
                qgroups.setdefault(q, []).append(i)
        for idxs in qgroups.values():
            idxs.sort(key=lambda i: qpos[i])
            for a, b in zip(idxs, idxs[1:]):
                qd = qpos[b] - qpos[a]
                pa = tl.filter(F.col("term") == terms[a]).select(
                    "doc_id", F.col("pos").alias("_p1"))
                pb = tl.filter(F.col("term") == terms[b]).select(
                    "doc_id", F.col("pos").alias("_p2"))
                ok = (pa.join(pb, "doc_id")
                      .filter((F.col("_p2") - F.col("_p1"))
                              .between(max(qd - 1, 0), qd + 1))
                      .select("doc_id").distinct())
                cand = cand.join(ok, "doc_id", "left_semi")
    matched = tl_g.join(cand, "doc_id")
    dfreq = {r["term"]: r["df"] for r in
             tl.groupBy("term").agg(
                 F.count_distinct("doc_id").alias("df")).collect()}
    freq_ws = [term_freq_weight(dfreq.get(t, 0), num_docs) for t in terms]
    fw_col = F.lit(None).cast("double")
    for gi, fw in enumerate(freq_ws):
        fw_col = F.when(F.col("_grp") == gi, F.lit(fw * fw)) \
                  .otherwise(fw_col)
    per_term = (matched
                .withColumn("_ob", _occ_bound_col())
                .groupBy("doc_id", "_grp")
                .agg(F.aggregate(
                    F.slice(F.reverse(F.array_sort(
                        F.collect_list("_ob"))), 1, MAX_TOP),
                    F.lit(0.0), lambda a, x: a + x).alias("_top10"))
                .withColumn("_fw2", fw_col)
                .groupBy("doc_id")
                .agg(F.min(F.col("_fw2") * F.col("_top10"))
                     .alias("_minsingle")))
    if doc_meta is not None:
        meta = doc_meta.select(
            "doc_id", F.col("site_rank").cast("double").alias("_sr"),
            F.col("lang").alias("_lang"))
        per_term = per_term.join(meta, "doc_id", "left")
    else:
        per_term = (per_term.withColumn("_sr", F.lit(0.0))
                    .withColumn("_lang", F.lit(None).cast("string")))
    sr = F.coalesce(F.col("_sr"), F.lit(0.0))
    eff_bound = sr + (F.lit(15.0) - sr) / 3.0
    mult = eff_bound * SITE_RANK_MULTIPLIER + 1.0
    if qlang is not None:
        mult = mult * F.when(F.col("_lang").isNull()
                             | (F.col("_lang") == qlang),
                             F.lit(SAME_LANG_WEIGHT)).otherwise(F.lit(1.0))
    else:
        mult = mult * SAME_LANG_WEIGHT
    bounds = (per_term.select(
        "doc_id", (F.col("_minsingle") * mult).alias("_bound"))
        .orderBy(F.desc("_bound"), "doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK))

    scored: dict[int, float] = {}
    offset = 0
    cap = candidate_cap
    try:
        while True:
            page = bounds.offset(offset).limit(cap + 1).collect()
            batch = [r["doc_id"] for r in page[:cap]]
            next_bound = page[cap]["_bound"] if len(page) > cap else None
            if batch:
                got = posdb_rank_search(
                    tl.join(F.broadcast(
                        spark.createDataFrame([(int(d),) for d in batch],
                                              "doc_id long")), "doc_id"),
                    doc_meta, terms, num_docs, k=len(batch),
                    qlang=qlang, dfreq=dfreq, quoted=quoted,
                    quoted_ids=quoted_ids, qpos=qpos, wiki_ids=wiki_ids,
                    synonyms=synonyms).collect()
                for r in got:
                    scored[r["doc_id"]] = r["score"]
            top = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
            kth = top[k - 1][1] if len(top) >= k else None
            if next_bound is None or (kth is not None
                                      and kth >= next_bound):
                return spark.createDataFrame(
                    [(int(d), float(s)) for d, s in top],
                    "doc_id long, score double")
            offset += cap
            cap *= 2     # adversarial gap: widen and continue
    finally:
        # internal caches never outlive the call (result is local rows)
        safe_unpersist(bounds)
        safe_unpersist(tl)
