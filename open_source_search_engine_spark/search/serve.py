"""Msg40 result-page assembly — the full serve path in one call.

The reference's query flow (Msg40.cpp / Msg20.cpp / Msg51.cpp):
Msg3a fans the parsed query to the shards, PosdbTable ranks and returns
docids, then Msg40 issues one Msg20 per docid which loads the title rec
and generates the result's TITLE (Title.cpp) and SUMMARY (Summary.cpp),
and finally the post-query loop clusters/filters the page (Msg51 cluster
levels, dup-summary, dup-URL).

Here the same stages as one DataFrame pipeline:

1. rank — ``parsed_rank_search`` (the full PosdbTable min-term-pair
   model) for AND/phrase shapes; boolean/field shapes fall back to the
   DataFrame-algebra executor (``queryparse.search_query``), the
   reference's boolJump boundary (PosdbTable.cpp:4009).
2. top-K join-back — the K winners are a broadcast side against the
   docs table (Msg20's titledb point lookups: at 100 TB the join is a
   broadcast-hash of K rows against a bucketed titledb scan, never a
   shuffle of the corpus).
3. Msg20 work — ``title_ref`` (Title.cpp candidate scoring, fed the
   doc's harvested inlink anchor texts when a link graph is supplied)
   and ``summarize_ref`` (Summary.cpp best-window engine) as batch
   pandas UDFs over the K rows.
4. Msg51/Msg40 post-filters — ``filter_results`` cluster levels
   (family/lang filters, site clustering, dup-summary Dice, dup-URL).

Everything downstream of the ranker touches only K rows, so the serve
tail is constant work regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .queryparse import And, FieldTerm, Not, Or, Phrase, Term, parse_query
from .results import filter_results
from .summary_ref import summarize_ref
from .title_ref import title_ref

ANCHOR_STRUCT = ("array<struct<link_text:string,rss_title:string,"
                 "same_host:boolean>>")


def positive_terms(query: str) -> list[str]:
    """The query words Msg20 highlights / windows on: every Term and
    Phrase word on a non-negated path (Matches.cpp takes the query's
    positive word ids; NOT-ed terms never match a summary window)."""
    out: list[str] = []

    def walk(node, negated: bool = False):
        if isinstance(node, Term):
            if not negated:
                out.append(node.text)
        elif isinstance(node, Phrase):
            if not negated:
                out.extend(node.words)
        elif isinstance(node, FieldTerm):
            return                      # field ops don't window summaries
        elif isinstance(node, Not):
            walk(node.child, not negated)
        elif isinstance(node, (And, Or)):
            for c in node.children:
                walk(c, negated)

    walk(parse_query(query))
    seen = set()
    uniq = []
    for t in out:
        tl = t.lower()
        if tl not in seen:
            seen.add(tl)
            uniq.append(tl)
    return uniq


def serve_results(docs: DataFrame, query: str, k: int = 10, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  url_col: str | None = None,
                  index: DataFrame | None = None,
                  postings: DataFrame | None = None,
                  doc_meta: DataFrame | None = None,
                  num_docs: int | None = None,
                  anchors: DataFrame | None = None,
                  lang_col: str | None = None,
                  adult_col: str | None = None,
                  family_filter: bool = False,
                  lang_filter: str | None = None,
                  dedup_percent: int = 90,
                  dedup_url: bool = True,
                  max_per_site: int = 2,
                  do_site_clustering: bool = True,
                  content_type: str = "html",
                  highlight_summaries: bool = False) -> DataFrame:
    """One query → one annotated result page (Msg40::gotResults).

    ``docs`` is the titledb analogue: (id_col, text_col[, url_col]).
    ``index``/``postings`` are the pre-built posdb index (rank-carrying
    postings from ``posdbrank.build_posdb_index``) and the plain
    postings (``postings.build_postings``) — pass whichever the query
    shape needs, or neither to build both on the fly (fixture use).
    ``anchors`` is (doc_id, link_text, rss_title, same_host) — the
    Msg25 link-info harvest feeding Title.cpp's inlink candidates.

    Returns one row per ranked result with ``rank``, ``score``,
    ``title``, ``summary``, ``cluster_level``; ``results.visible``
    selects the displayed page.
    """
    if num_docs is None:
        num_docs = docs.count()         # collection doc count (scalar)

    ranked = _rank(docs, query, k, id_col, text_col, url_col,
                   index, postings, doc_meta, num_docs)

    # top-K first (TakeOrderedAndProject — distributed), THEN the rank
    # number over the bounded K-row page; the window never sees the full
    # candidate set.
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    topk = (ranked.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            .withColumn("rank", F.row_number().over(w) - 1))

    # Msg20: join the K winners back to titledb — broadcast the K side
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        (F.col(url_col) if url_col else F.lit("")).alias("url"),
        (F.col(lang_col) if lang_col else F.lit("xx")).alias("lang"),
        (F.col(adult_col).cast("boolean") if adult_col
         else F.lit(False)).alias("is_adult"))
    page = base.join(F.broadcast(topk), "doc_id")

    if anchors is not None:
        per_doc = (anchors.groupBy("doc_id").agg(
            F.collect_list(F.struct(
                F.col("link_text"), F.col("rss_title"),
                F.col("same_host"))).alias("_anchors")))
        page = page.join(per_doc, "doc_id", "left")
    else:
        page = page.withColumn("_anchors",
                               F.lit(None).cast(ANCHOR_STRUCT))

    terms = positive_terms(query)
    page = title_ref(page, "_text", "url", "_anchors", terms,
                     content_type=content_type)
    page = summarize_ref(page, "_text", "title", terms)

    page = filter_results(
        page.select("doc_id", "rank", "score", "url", "lang", "is_adult",
                    "title", "summary"),
        family_filter=family_filter, lang_filter=lang_filter,
        dedup_percent=dedup_percent, dedup_url=dedup_url,
        max_per_site=max_per_site,
        do_site_clustering=do_site_clustering)
    if highlight_summaries and terms:
        # PageResults.cpp:3185-3215 highlights query hits in each
        # summary with the Highlight.cpp style cycle
        from .cached import highlight
        page = page.withColumn("summary",
                               highlight(F.col("summary"), terms))
    return page.orderBy("rank")


def did_you_mean_for(docs: DataFrame, query: str,
                     text_col: str = "text") -> str | None:
    """PageResults' spell suggestion: run each query word through the
    Speller compound-splitter over the collection's unified dict
    (PageResults.cpp spellcheck block / Speller::getRecommendation)."""
    from .speller import build_unified_dict, did_you_mean
    words = frozenset(
        r.word for r in build_unified_dict(docs, text_col).collect())
    return did_you_mean(query, words)


def _rank(docs: DataFrame, query: str, k: int, id_col: str,
          text_col: str, url_col: str | None,
          index: DataFrame | None, postings: DataFrame | None,
          doc_meta: DataFrame | None, num_docs: int) -> DataFrame:
    """Route the parsed query to the PosdbTable ranker (AND/phrase) or
    the DataFrame-algebra executor (boolean/field) — the reference's
    boolJump boundary."""
    from .posdbrank import build_posdb_index, parsed_rank_search
    from .queryparse import search_query

    try:
        if index is None:
            # on-the-fly build (fixture path): the per-doc indexing
            # kernel is CPU-bound, so spread it across all cores even
            # when the input is one small file — at scale the index is
            # pre-built and term-bucketed (write_postings_bucketed) and
            # this branch never runs
            n_part = docs.sparkSession.sparkContext.defaultParallelism
            if docs.rdd.getNumPartitions() < n_part:
                docs = docs.repartition(n_part)
            index = build_posdb_index(docs, html_col=text_col,
                                      id_col=id_col, url_col=url_col)
        out = parsed_rank_search(index, doc_meta, query, num_docs, k=k)
        return out.select(F.col("doc_id"),
                          F.col("score").cast("double").alias("score"))
    except ValueError:
        from .postings import build_postings
        if postings is None:
            postings = build_postings(docs, text_col=text_col,
                                      id_col=id_col)
        out = search_query(postings, query, k=k, doc_meta=doc_meta)
        return out.select(F.col("doc_id"),
                          F.col("score").cast("double").alias("score"))
