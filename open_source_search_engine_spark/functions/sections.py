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

Here: ``_parse_doc`` is the per-doc structural walk (one HTML pass, a
tag stack, NO hashing — it only records each section's base string,
parent pointer and direct text); ``section_rows_batch`` turns a whole
Arrow batch of documents into section rows with exactly THREE
vectorized hash calls total — one ``hash32_bytes`` over the batch's
distinct base strings, one over all section texts, and one
``hash32h_arrays`` sweep per tree-depth level for the cumulative path
hashes (parents hash before children, so depth levels vectorize
cleanly).  ``build_sections`` runs it as one ``mapInPandas`` pass;
``site_dup_sections`` is a single groupBy counting distinct docs per
(site, tag_hash, content_hash) — the sectiondb vote;
``strip_site_boilerplate`` is pure Catalyst over the section rows: a
(site, tag_hash, content_hash)-keyed join marks each section instance,
and one per-doc aggregate rebuilds the surviving text in section-close
order (``sec_no``) — the document is never parsed a second time.

Spark shape at 100 TB: the section exploder is shuffle-free; the vote
is ONE partial-aggregated shuffle keyed (site, tag_hash, content_hash)
— the same key sectiondb shards on; the strip is one join on that key
plus one doc-keyed aggregate, with zero Python in the plan.  Callers
composing vote + strip over the same corpus should persist the
sections frame (both branches read it); at fixture scale the doubled
parse is cheap enough that the catalog entry stays unpersisted.
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
_TAG = re.compile(r"</?\s*([a-zA-Z0-9]+)\s*([^>]*)")
_WS = re.compile(r"\s+")

_ROOT_HASH: int | None = None


def _root_hash() -> int:
    global _ROOT_HASH
    if _ROOT_HASH is None:
        _ROOT_HASH = int(hash32_bytes([b"root"])[0])
    return _ROOT_HASH


def _h32(s: str) -> int:
    return int(hash32_bytes([s.encode("utf-8", "replace")])[0])


def _parse_doc(html: str) -> tuple[list[str], list[int],
                                   list[tuple[int, str]]]:
    """One structural walk, no hashing: returns
    ``(node_base, node_parent, sections)`` where node ``i`` opened with
    base string ``node_base[i]`` (tag name + attribute alnum chars)
    under parent node ``node_parent[i]`` (-1 = the virtual root), and
    ``sections`` lists ``(node_idx, direct_text)`` in close order
    (node_idx -1 = root-level loose text).  Parents always precede
    children in node order — the depth-wave hasher relies on that."""
    node_base: list[str] = []
    node_parent: list[int] = []
    stack: list[tuple[int, list[str]]] = [(-1, [])]
    sections: list[tuple[int, str]] = []
    skip: str | None = None

    def close_top() -> None:
        idx, texts = stack.pop()
        text = " ".join(t for t in texts if t).strip()
        if text:
            sections.append((idx, text))

    for m in _TOK.finditer(html):
        tok = m.group(0)
        if not tok.startswith("<"):
            if skip is None:
                t = tok.strip()
                if t:
                    stack[-1][1].append(_WS.sub(" ", t))
            continue
        tm = _TAG.match(tok)
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
            attrs = tm.group(2) or ""
            # baseHash input: tag name + attribute alnum chars
            # (Sections.cpp:896-938)
            alnum = "".join(c for c in attrs if c.isalnum())
            node_base.append(name + alnum)
            node_parent.append(stack[-1][0])
            stack.append((len(node_base) - 1, []))
        elif closing and len(stack) > 1:
            close_top()
    while len(stack) > 1:
        close_top()
    idx, texts = stack[0]
    text = " ".join(t for t in texts if t).strip()
    if text:
        sections.append((idx, text))
    return node_base, node_parent, sections


def section_rows_batch(htmls: list[str]) \
        -> list[list[tuple[int, int, str]]]:
    """Batch form of ``section_rows``: every page → its
    ``[(tag_hash, content_hash, text)]`` list (close order), with all
    hashing done in a handful of vectorized calls over the whole batch
    instead of per tag / per section.  The content hash covers the
    section's own DIRECT text (not descendants'), so a <div> whose
    every child changed but whose own text is empty votes nothing."""
    parsed = [_parse_doc(h or "") for h in htmls]
    root = _root_hash()

    # ---- flatten nodes across the batch (parent idx -> global) ----
    all_base: list[str] = []
    all_parent: list[int] = []
    doc_off: list[int] = []
    for nb, nparent, _secs in parsed:
        off = len(all_base)
        doc_off.append(off)
        all_base.extend(nb)
        all_parent.extend(p if p < 0 else p + off for p in nparent)
    n = len(all_base)

    tagh = np.zeros(n, dtype=np.uint64)
    if n:
        # one hash call over the batch's DISTINCT base strings
        uniq = list(dict.fromkeys(all_base))
        hv = hash32_bytes([u.encode("utf-8", "replace") for u in uniq])
        hv = np.where(hv == 0, 2, hv)        # Sections.cpp:942-944
        base_map = dict(zip(uniq, hv.tolist()))
        base_h = np.fromiter((base_map[s] for s in all_base),
                             dtype=np.uint64, count=n)
        parent = np.fromiter(all_parent, dtype=np.int64, count=n)

        depth_l = [0] * n
        for i, p in enumerate(all_parent):
            depth_l[i] = 0 if p < 0 else depth_l[p] + 1
        depth = np.asarray(depth_l, dtype=np.int64)

        # cumulative path hash, one vectorized sweep per depth level
        # (hash32h(base, parent_tag_hash), Sections.cpp:3134)
        for lvl in range(int(depth.max()) + 1):
            idx = np.nonzero(depth == lvl)[0]
            if lvl == 0:
                ph: np.ndarray | int = np.full(idx.size, root,
                                               dtype=np.uint64)
            else:
                ph = tagh[parent[idx]]
            tagh[idx] = hash32h_arrays(base_h[idx], ph) \
                .astype(np.uint64)

    # ---- one hash call over every section's lowered text ----
    texts: list[bytes] = []
    for _nb, _np, secs in parsed:
        texts.extend(t.lower().encode("utf-8", "replace")
                     for _idx, t in secs)
    ch_all = hash32_bytes(texts) if texts else np.empty(0, np.int64)

    out: list[list[tuple[int, int, str]]] = []
    ti = 0
    for (nb, _nparent, secs), off in zip(parsed, doc_off):
        rows: list[tuple[int, int, str]] = []
        for idx, text in secs:
            th = root if idx < 0 else int(tagh[off + idx])
            rows.append((th, int(ch_all[ti]), text))
            ti += 1
        out.append(rows)
    return out


def section_rows(html: str) -> list[tuple[int, int, str]]:
    """One page → [(tag_hash, content_hash, text)] for every section
    with text (single-doc convenience over ``section_rows_batch``)."""
    return section_rows_batch([html])[0]


_SECTION_SCHEMA = ("doc_id long, site string, tag_hash long, "
                   "content_hash long, text string, sec_no int")


def build_sections(docs: DataFrame, html_col: str = "content",
                   id_col: str = "doc_id",
                   site_col: str = "site") -> DataFrame:
    """Documents → one row per text-carrying section (shuffle-free).
    ``sec_no`` is the section's close-order position within its doc —
    the order ``strip_site_boilerplate`` rebuilds text in."""
    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            per_doc = section_rows_batch(pdf[html_col].tolist())
            rows = {"doc_id": [], "site": [], "tag_hash": [],
                    "content_hash": [], "text": [], "sec_no": []}
            for doc_id, site, secs in zip(pdf[id_col], pdf[site_col],
                                          per_doc):
                for sec_no, (th, ch, text) in enumerate(secs):
                    rows["doc_id"].append(doc_id)
                    rows["site"].append(site)
                    rows["tag_hash"].append(th)
                    rows["content_hash"].append(ch)
                    rows["text"].append(text)
                    rows["sec_no"].append(sec_no)
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
                           site_col: str = "site",
                           sections: DataFrame | None = None) -> DataFrame:
    """Drop each doc's site-dup sections: returns
    (doc_id, text, n_sections, n_boilerplate) where ``text`` is the
    surviving section text in deterministic section-close order.

    Pure Catalyst over the section rows (pass ``sections`` to reuse an
    already-built frame; persist it when the caller also feeds the
    vote): one join keyed (site, tag_hash, content_hash) marks dup
    instances, one per-doc aggregate rebuilds the kept text ordered by
    ``sec_no`` — the doc is never re-parsed."""
    secs = sections if sections is not None \
        else build_sections(docs, html_col, id_col, site_col)
    dup_keys = (dup.select("site", "tag_hash", "content_hash")
                .distinct().withColumn("is_dup", F.lit(True)))
    marked = (secs.join(dup_keys,
                        ["site", "tag_hash", "content_hash"], "left")
              .withColumn("is_dup",
                          F.coalesce("is_dup", F.lit(False))))
    agg = (marked.groupBy("doc_id")
           .agg(F.count("*").cast("int").alias("n_sections"),
                F.sum(F.col("is_dup").cast("int")).cast("int")
                 .alias("n_boilerplate"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.when(~F.col("is_dup"),
                                   F.struct("sec_no", "text")))),
                        lambda s: s["text"]),
                    " ").alias("text")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("text", F.lit("")).alias("text"),
                    F.coalesce("n_sections", F.lit(0)).alias("n_sections"),
                    F.coalesce("n_boilerplate", F.lit(0))
                     .alias("n_boilerplate")))
