"""Hashgroup-weighted ranking: where a term hit lives decides its weight.

Every posting key in the reference carries a 4-bit hashgroup — which
part of the document the occurrence came from (Posdb.h:70-86:
body/title/heading/list/metatag/inlinktext/tag/neighborhood/
internal-inlink-text/url/menu) — and scoring multiplies each hit by the
group's weight (PosdbTable.cpp:489,564-575 s_hashGroupWeights).  The
shipped defaults (Parms.cpp:4234-4364):

    body 1.0   title 8.0   heading 1.5   list 0.3    metatag 0.1
    inlinktext 16.0  tag 1.0  neighborhood 0.0
    internal-inlink-text 4.0  url 1.0  menu 0.2

Here the weights are integer-exact at x10 scale (title hit = 80 per
occurrence vs body 10) so cross-engine value hashes can't drift.

Spark shape: the region split happens at INDEX time — one extra column
on the postings build, not a query-time join.  ``regions_from_html``
is pure Catalyst (regexp extraction, no UDF); the postings aggregate
gains ``hashgroup`` in its groupBy key, which co-partitions with the
plain (term, doc_id) build, and the query-time weighting folds the
groups back with one map-side-combinable sum.  Bucketing by term still
applies unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Parms.cpp defaults x10 (integer-exact)
HASHGROUP_WEIGHTS_X10: dict[str, int] = {
    "body": 10,                  # m_hashGroupWeightBody "1.000000"
    "title": 80,                 # m_hashGroupWeightTitle "8.000000"
    "heading": 15,               # m_hashGroupWeightHeading "1.500000"
    "inlist": 3,                 # m_hashGroupWeightInlist "0.300000"
    "inmetatag": 1,              # m_hashGroupWeightInMetaTag "0.100000"
    "inlinktext": 160,           # m_hashGroupWeightInLinkText "16.000000"
    "intag": 10,                 # m_hashGroupWeightInTag "1.000000"
    "neighborhood": 0,           # m_hashGroupWeightNeighborhood "0.000000"
    "internalinlinktext": 40,    # ...InternalLinkText "4.000000"
    "inurl": 10,                 # m_hashGroupWeightInUrl "1.000000"
    "inmenu": 2,                 # m_hashGroupWeightInMenu "0.200000"
}

_TAG_STRIP = r"(?is)<[^>]*>"
_SCRIPT_STRIP = r"(?is)<(script|style)[^>]*>.*?</\1>"
# the body hashgroup is the RENDERED body: head metadata (title, meta)
# is hashed under its own groups, never as body
_HEAD_STRIP = r"(?is)<head[^>]*>.*?</head>|<title[^>]*>.*?</title>"
_HEADING_RE = r"(?is)<h[1-4][^>]*>(.*?)</h[1-4]>"


def regions_from_html(docs: DataFrame, html_col: str = "content",
                      id_col: str = "doc_id",
                      url_col: str | None = None) -> DataFrame:
    """HTML docs → (doc_id, hashgroup, text) region rows, pure Catalyst.

    - ``title``: the Title.cpp candidate ladder (summary.title_expr:
      <title> → og:title → <h1> → leading body tokens).
    - ``heading``: every <h1>..<h4> body (XmlDoc hashes headings with
      HASHGROUP_HEADING, Posdb.h:77).
    - ``body``: script/style dropped, tags stripped.
    - ``inurl``: URL words when ``url_col`` given (HASHGROUP_INURL,
      Posdb.h:84; the reference hashes url path words)."""
    from .summary import title_expr

    doc_id = F.col(id_col).alias("doc_id")
    h = F.col(html_col)
    parts = [
        docs.select(doc_id, F.lit("title").alias("hashgroup"),
                    title_expr(h).alias("text")),
        docs.select(
            doc_id, F.lit("heading").alias("hashgroup"),
            F.array_join(F.regexp_extract_all(h, F.lit(_HEADING_RE),
                                              F.lit(1)), " ")
            .alias("text")),
        docs.select(
            doc_id, F.lit("body").alias("hashgroup"),
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        # a heading occurrence is ONE posting with the
                        # heading weight (1.5x), not heading+body — strip
                        # h-tags from the body region ("body implied" in
                        # Posdb.h:77 is a containment flag, not a second
                        # posting)
                        F.regexp_replace(
                            F.regexp_replace(h, _SCRIPT_STRIP, " "),
                            _HEADING_RE, " "),
                        _HEAD_STRIP, " "),
                    _TAG_STRIP, " "),
                r"\s+", " ").alias("text")),
    ]
    if url_col is not None:
        parts.append(docs.select(
            doc_id, F.lit("inurl").alias("hashgroup"),
            F.regexp_replace(F.col(url_col), r"[^A-Za-z0-9]+", " ")
            .alias("text")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.filter(F.length(F.trim("text")) > 0)


def build_postings_by_region(regions: DataFrame) -> DataFrame:
    """(doc_id, hashgroup, text) → postings(term, doc_id, hashgroup, tf).
    Same shape as postings.build_postings with the group in the key; at
    scale bucket by term exactly like the plain build."""
    toks = regions.select(
        "doc_id", "hashgroup",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"))
    return (toks.filter(F.length("term") > 0)
            .groupBy("term", "doc_id", "hashgroup")
            .agg(F.count("*").alias("tf")))


def _weight_col(weights: dict[str, int]):
    w = F.lit(0)
    for g, wt in weights.items():
        w = F.when(F.col("hashgroup") == g, F.lit(wt)).otherwise(w)
    return w


def weighted_scores(postings_hg: DataFrame,
                    weights: dict[str, int] | None = None) -> DataFrame:
    """Fold the hashgroups: (term, doc_id, score_part) where score_part
    = sum over groups of tf_g * weight_g — the integer-exact weighted tf
    (a body hit contributes 10, a title hit 80, an inlink-text hit 160
    per occurrence, the s_hashGroupWeights multipliers)."""
    w = _weight_col(weights or HASHGROUP_WEIGHTS_X10)
    return (postings_hg
            .select("term", "doc_id", (F.col("tf") * w).alias("_s"))
            .groupBy("term", "doc_id")
            .agg(F.sum("_s").cast("long").alias("score_part")))


def search_weighted(postings_hg: DataFrame, terms: list[str],
                    k: int = 10,
                    weights: dict[str, int] | None = None) -> DataFrame:
    """AND-intersect the termlists and rank by summed hashgroup-weighted
    scores; top-K via orderBy+limit (TakeOrderedAndProject)."""
    scored = weighted_scores(
        postings_hg.filter(F.col("term").isin(terms)), weights)
    parts = [scored.filter(F.col("term") == t)
             .select("doc_id", F.col("score_part").alias(f"_s{i}"))
             for i, t in enumerate(terms)]
    base = parts[0]
    for p in parts[1:]:
        base = base.join(p, "doc_id")
    total = F.col("_s0")
    for i in range(1, len(parts)):
        total = total + F.col(f"_s{i}")
    return (base.select(F.col("doc_id").cast("long").alias("doc_id"),
                        total.cast("long").alias("score"))
            .orderBy(F.desc("score"), "doc_id")
            .limit(k))
