"""Cached-page serving (PageGet.cpp / Msg20 titleRec) + term highlight
(Highlight.cpp).

``/get?d=<docid>`` in the reference loads the stored titleRec for a
docid (PageGet.cpp:109-265), refuses when the page carries a noarchive
robots directive (PageGet.cpp:152,496 ``m_noArchive``), and wraps each
query-term hit in a per-term style span (Highlight.cpp:11-18
``gbcnstNN`` cycle, Highlight::set frontTag/backTag).

Spark shape: the lookup is a point filter on the titledb analogue
(``CrawlRunner.indexed_docs()`` or any (doc_id, text) table) — with the
table written partitioned/bucketed by the id the scan prunes to one
file; highlighting is a chain of regexp_replace expressions, zero UDFs,
zero shuffles.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Highlight.cpp:11-18: per-query-term style classes, cycled mod 8
N_STYLES = 8


def front_tag(i: int) -> str:
    return f"<span class='gbcnst{i % N_STYLES:02d}'>"


BACK_TAG = "</span>"

_NOARCHIVE_RE = (r"(?is)<meta[^>]+name=[\"']?robots[\"']?[^>]*"
                 r"content=[\"'][^\"'>]*noarchive")


def is_no_archive(content: Column | str) -> Column:
    """robots-meta noarchive check (PageGet.cpp honors m_noArchive and
    serves a refusal instead of the cached copy)."""
    c = F.col(content) if isinstance(content, str) else content
    return c.rlike(_NOARCHIVE_RE)


def highlight(text: Column | str, terms: list[str]) -> Column:
    """Wrap each whole-word, case-insensitive term hit in its cycled
    style span (Highlight::set).  Terms are regex-escaped; replacement
    keeps the original casing via the $1 capture."""
    c = F.col(text) if isinstance(text, str) else text
    for i, t in enumerate(terms):
        pat = rf"(?i)\b({_re.escape(t)})\b"
        c = F.regexp_replace(c, pat, front_tag(i) + "$1" + BACK_TAG)
    return c


def cached_page(titledb: DataFrame, doc_id: int | None = None,
                url: str | None = None,
                terms: list[str] | None = None,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Point lookup of a stored page, optionally highlighted.

    Returns (doc_id, url?, content, no_archive) — content is NULL when
    the page asked not to be archived, like the reference's refusal
    page.  Exactly one of doc_id / url selects the row."""
    assert (doc_id is None) != (url is None), "pass docid XOR url"
    if doc_id is not None:
        hit = titledb.filter(F.col(id_col) == doc_id)
    else:
        hit = titledb.filter(F.col("url") == url)
    body = highlight(F.col(text_col), terms) if terms \
        else F.col(text_col)
    na = is_no_archive(F.col(text_col))
    cols = [F.col(id_col).cast("long").alias("doc_id")]
    if "url" in titledb.columns:
        cols.append(F.col("url"))
    cols += [F.when(na, F.lit(None)).otherwise(body).alias("content"),
             na.alias("no_archive")]
    return hit.select(*cols)
