"""Section tree + site-wide duplicate-section (boilerplate) detection
(Sections.cpp / sectiondb).

The reference splits every page into a tree of sections keyed by a
cumulative tag-path hash:

* ``baseHash``: the tag id mixed with the tag's attribute alnum chars
  (Sections.cpp:896-938 — ``<div class=menu>`` and ``<div class=body>``
  are different sections even at the same tree position),
* ``tagHash = hash32h(baseHash, parent.tagHash)``
  (Sections.cpp:3134) — the xpath-like path hash,
* and stores one sectiondb vote per (site, tagHash, contentHash)
  (Sections.h:282-298 SectionVote): when OTHER pages from the same site
  voted the same content hash at the same tag hash, the section is a
  site-wide duplicate — navigation, headers, footers, templated
  boilerplate.

Here: ``section_rows`` is the per-doc kernel (one HTML walk, a tag
stack, ``hash32h`` from ``functions.ghash`` so path hashes are
bit-compatible with the F4 mixer); ``build_sections`` runs it as one
``mapInPandas`` pass; ``site_dup_sections`` is a single groupBy
counting distinct docs per (site, tag_hash, content_hash) — the
sectiondb vote; ``strip_site_boilerplate`` re-walks each doc dropping
its flagged sections (the XmlDoc indexing behavior of not hashing
SEC_DUP content, and the training-pipeline use: template removal
before dedup/quality).

Spark shape at 100 TB: the section exploder is shuffle-free; the vote
is ONE partial-aggregated shuffle keyed (site, tag_hash, content_hash)
— the same key sectiondb shards on; the strip joins each doc with only
ITS OWN flagged keys (a doc_id-keyed join, no broadcast of the global
boilerplate set).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ghash import hash32_bytes, hash32h_arrays

# section-forming container tags (Sections.cpp isBreakingTagId usage;
# inline markup like <b>/<i>/<a> does not form sections)
_SECTION_TAGS = frozenset((
    "html", "head", "body", "div", "ul", "ol", "li", "table", "tr",
    "td", "th", "p", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
    "form", "nav", "header", "footer", "aside", "section", "article",
    "title", "pre", "center",
))
_VOID_TAGS = frozenset(("br", "hr", "img", "meta", "link", "input"))

_TOK = re.compile(r"<[^>]*>|[^<]+")


def _h32(s: str) -> int:
    return int(hash32_bytes([s.encode("utf-8", "replace")])[0])


def _base_hash(tagname: str, attrs: str) -> int:
    """baseHash: tag name mixed with attribute alnum chars
    (Sections.cpp:896-938)."""
    alnum = "".join(c for c in attrs if c.isalnum())
    h = _h32(tagname + alnum)
    return h if h != 0 else 2        # Sections.cpp:942-944


def _tag_hash(base: int, parent: int) -> int:
    return int(hash32h_arrays(np.array([base], dtype=np.uint64),
                              parent)[0])


def section_rows(html: str) -> list[tuple[int, int, str]]:
    """One page → [(tag_hash, content_hash, text)] for every section
    with text.  The content hash covers the section's own DIRECT text
    (not descendants'), so a <div> whose every child changed but whose
    own text is empty votes nothing."""
    root = _h32("root")
    stack: list[tuple[int, list[str]]] = [(root, [])]
    out: list[tuple[int, int, str]] = []
    skip: str | None = None

    def close_top():
        th, texts = stack.pop()
        text = " ".join(t for t in texts if t).strip()
        if text:
            out.append((th, _h32(text.lower()), text))

    for m in _TOK.finditer(html):
        tok = m.group(0)
        if not tok.startswith("<"):
            if skip is None:
                t = tok.strip()
                if t:
                    stack[-1][1].append(re.sub(r"\s+", " ", t))
            continue
        tm = re.match(r"</?\s*([a-zA-Z0-9]+)\s*([^>]*)", tok)
        if not tm:
            continue
        name = tm.group(1).lower()
        closing = tok.startswith("</")
        if name in ("script", "style"):
            skip = None if closing else name
            continue
        if skip is not None or name in _VOID_TAGS:
            continue
        if name not in _SECTION_TAGS:
            continue
        if not closing and not tok.endswith("/>"):
            base = _base_hash(name, tm.group(2) or "")
            stack.append((_tag_hash(base, stack[-1][0]), []))
        elif closing and len(stack) > 1:
            close_top()
    while len(stack) > 1:
        close_top()
    # root-level loose text
    th, texts = stack[0]
    text = " ".join(t for t in texts if t).strip()
    if text:
        out.append((th, _h32(text.lower()), text))
    return out


_SECTION_SCHEMA = ("doc_id long, site string, tag_hash long, "
                   "content_hash long, text string")


def build_sections(docs: DataFrame, html_col: str = "content",
                   id_col: str = "doc_id",
                   site_col: str = "site") -> DataFrame:
    """Documents → one row per text-carrying section (shuffle-free)."""
    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "site": [], "tag_hash": [],
                    "content_hash": [], "text": []}
            for r in pdf.itertuples(index=False):
                for th, ch, text in section_rows(
                        getattr(r, html_col) or ""):
                    rows["doc_id"].append(getattr(r, id_col))
                    rows["site"].append(getattr(r, site_col))
                    rows["tag_hash"].append(th)
                    rows["content_hash"].append(ch)
                    rows["text"].append(text)
            yield pd.DataFrame(rows)

    return docs.select(id_col, html_col, site_col) \
               .mapInPandas(gen, _SECTION_SCHEMA)


def site_dup_sections(sections: DataFrame, min_docs: int = 2) -> DataFrame:
    """The sectiondb vote: (site, tag_hash, content_hash) seen on
    ``min_docs``+ distinct pages of the site is site-wide boilerplate
    (another page 'voted for dup' — SectionVote semantics,
    Sections.h:282-298)."""
    return (sections
            .groupBy("site", "tag_hash", "content_hash")
            .agg(F.count_distinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs))


def strip_site_boilerplate(docs: DataFrame, dup: DataFrame,
                           html_col: str = "content",
                           id_col: str = "doc_id",
                           site_col: str = "site") -> DataFrame:
    """Re-walk each doc dropping its site-dup sections: returns
    (doc_id, text, n_sections, n_boilerplate) where ``text`` is the
    surviving section text in deterministic section-close order (the
    same order ``section_rows`` emits).  The join ships each doc only
    its OWN site's flagged keys."""
    keys = (build_sections(docs, html_col, id_col, site_col)
            .join(dup.select("site", "tag_hash", "content_hash"),
                  ["site", "tag_hash", "content_hash"], "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set(
                F.concat_ws(":", "tag_hash", "content_hash"))
                .alias("dup_keys0")))
    joined = docs.select(id_col, html_col).join(keys, id_col, "left")

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "text": [], "n_sections": [],
                    "n_boilerplate": []}
            for r in pdf.itertuples(index=False):
                dup_keys = getattr(r, "dup_keys0")
                dup_set = set(dup_keys) if dup_keys is not None else set()
                kept, dropped = [], 0
                secs = section_rows(getattr(r, html_col) or "")
                for th, ch, text in secs:
                    if f"{th}:{ch}" in dup_set:
                        dropped += 1
                    else:
                        kept.append(text)
                rows["doc_id"].append(getattr(r, id_col))
                rows["text"].append(" ".join(kept))
                rows["n_sections"].append(len(secs))
                rows["n_boilerplate"].append(dropped)
            yield pd.DataFrame(rows)

    return joined.mapInPandas(
        gen, "doc_id long, text string, n_sections int, n_boilerplate int")
