"""End-to-end: the reference's full loop — crawl → index → serve.

Gigablast's pipeline is spider (SpiderLoop) → parse/index (XmlDoc →
titledb/posdb) → query serve (Query/PosdbTable/Summary).  This test runs
all three tiers of the rebuild against one synthetic corpus and pins the
query results to an independent Python recomputation over exactly the
pages the crawl indexed:

  1. CrawlRunner crawls the corpus (oracle-parity semantics).
  2. ``indexed_docs()`` hands the indexed pages (titledb analogue) to
     ``build_postings`` (posdb analogue).
  3. ``search_query`` parses and executes a boolean query (Q1→Q2→Q3).
  4. ``summarize`` produces title+snippet for the hits (Q5).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    from open_source_search_engine_spark.config import CrawlConfig
    from open_source_search_engine_spark.corpus import (generate_corpus,
                                                        write_parquet)
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    c = generate_corpus(seed=31, n_domains=5, n_urls=120)
    cd = str(tmp_path_factory.mktemp("e2e_corpus"))
    sd = str(tmp_path_factory.mktemp("e2e_state"))
    write_parquet(c, cd)
    runner = CrawlRunner(spark, cd, sd, CrawlConfig(max_rounds=4))
    runner.run()
    return runner


@pytest.fixture(scope="module")
def indexed(crawled):
    return crawled.indexed_docs().cache()


def _tokens(text: str) -> list[str]:
    # build_postings tokenization: lowercase, split on whitespace
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _score(toks: list[str], terms: list[str],
           proximity: bool = False) -> int | None:
    """Python twin of the scoring: tf-sum*10; with ``proximity``, plus
    the adjacent-pair min-gap bonus of search/postings.py (search_query's
    boolean AND sums tf only)."""
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
    if any(not p for p in pos.values()):
        return None
    tf_sum = sum(len(p) for p in pos.values())
    bonus = 0
    if proximity and len(terms) >= 2:
        g = min(min(abs(x - y) for x in pos[a] for y in pos[b])
                for a, b in zip(terms, terms[1:]))
        bonus = 50 if g <= 1 else 20 if g <= 4 else 5 if g <= 16 else 0
    return tf_sum * 10 + bonus


def test_indexed_docs_are_the_indexed_replies(crawled, indexed):
    from open_source_search_engine_spark.pipeline import snapshots as snap
    got = {r["uh48"] for r in indexed.select("uh48").collect()}
    m = snap.load_manifest(crawled.state_dir)
    want = {
        r["uh48"]
        for r in crawled._latest_reply(crawled._read_all("replies", m))
        .filter(F.col("is_indexed")).collect()
    }
    assert got == want and got, "every indexed reply surfaces exactly once"
    # text spans only — no media_ref payloads leak into the text
    assert indexed.filter(F.col("text").contains(".jpg")).count() == 0


def test_crawl_index_search_parity(spark, indexed):
    from open_source_search_engine_spark.search.postings import \
        build_postings
    from open_source_search_engine_spark.search.queryparse import \
        search_query
    postings = build_postings(
        indexed.select(F.col("uh48").alias("doc_id"), "text")).cache()
    texts = {r["uh48"]: r["text"] for r in indexed.collect()}

    got = [(r["doc_id"], r["score"])
           for r in search_query(postings, "data crawl", k=1000).collect()]
    want = sorted(
        ((uh, s) for uh, t in texts.items()
         if (s := _score(_tokens(t), ["data", "crawl"])) is not None),
        key=lambda x: (-x[1], x[0]))
    assert got == want and len(got) > 3

    # the proximity-scored Q2 path (postings.search) over the same index
    from open_source_search_engine_spark.search.postings import search
    got_prox = [(r["doc_id"], r["score"])
                for r in search(postings, ["data", "crawl"], k=1000)
                .collect()]
    want_prox = sorted(
        ((uh, s) for uh, t in texts.items()
         if (s := _score(_tokens(t), ["data", "crawl"],
                         proximity=True)) is not None),
        key=lambda x: (-x[1], x[0]))
    assert got_prox == want_prox

    # boolean OR / NOT through the parser over the same index
    got_or = {r["doc_id"] for r in
              search_query(postings, "lorem OR ipsum", k=1000).collect()}
    want_or = {uh for uh, t in texts.items()
               if "lorem" in _tokens(t) or "ipsum" in _tokens(t)}
    assert got_or == want_or
    got_not = {r["doc_id"] for r in
               search_query(postings, "data NOT lorem", k=1000).collect()}
    want_not = {uh for uh, t in texts.items()
                if "data" in _tokens(t) and "lorem" not in _tokens(t)}
    assert got_not == want_not


def test_crawl_link_graph_ranks(spark, crawled):
    """Crawl → Linkdb → siteRank: the crawl's own parent→child link log
    feeds inlink counts and integer PageRank, pinned against a Python
    power iteration over the same edges."""
    from open_source_search_engine_spark.graph.linkrank import (
        RANK_SCALE, inlink_counts, pagerank)
    edges = crawled.link_graph().cache()
    e = [(r["src"], r["dst"]) for r in edges.collect()]
    assert e and all(s != d and s >= 0 for s, d in e)
    nodes = sorted({v for p in e for v in p})
    counts = {r["dst"]: r["n_inlinks"]
              for r in inlink_counts(edges).collect()}
    want_counts: dict[int, int] = {}
    for _, d in set(e):
        want_counts[d] = want_counts.get(d, 0) + 1
    assert counts == want_counts

    from test_linkrank import _py_pagerank
    nodes_df = spark.createDataFrame([(v,) for v in nodes], ["node"])
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, nodes_df, n_iter=3).collect()}
    assert got == _py_pagerank(e, nodes, n_iter=3)
    # dangling pages drop mass, so ranks shrink below the initial scale;
    # a page with inlinks still accumulates above the (1-d) base share
    from open_source_search_engine_spark.graph.linkrank import BASE_SHARE
    assert BASE_SHARE < max(got.values()) < RANK_SCALE


def test_search_results_summarize(spark, indexed):
    from open_source_search_engine_spark.search.summary import summarize
    hits = indexed.select(F.col("uh48").alias("doc_id"), "text")
    out = summarize(hits.limit(20), ["data", "crawl"]).collect()
    assert out, "summaries produced for indexed pages"
    for r in out:
        assert r["title"]
        if r["n_hits"] > 0:
            low = r["snippet"].lower()
            assert "data" in low or "crawl" in low


def test_crawl_to_posdb_full_rank(spark, crawled, indexed):
    """The crawled pages through the FULL Posdb ranker: indexed_docs →
    build_posdb_index (rank vectors over the page text) →
    parsed_rank_search, cross-checked against a direct kernel call on
    one doc's extracted termlists."""
    from open_source_search_engine_spark.search.posdbrank import (
        TermList, build_posdb_index, parsed_rank_search, score_doc,
        term_freq_weight)

    docs = (indexed.select(
        F.abs(F.col("uh48")).alias("doc_id"),
        F.concat(F.lit("<html><body><p>"), F.col("text"),
                 F.lit("</p></body></html>")).alias("content"))
        .filter(F.length("text") > 0).cache())
    n = docs.count()
    assert n > 10
    idx = build_posdb_index(docs)
    out = parsed_rank_search(idx, None, "lorem ipsum",
                             num_docs=n, k=10).collect()
    assert out, "query terms exist in the corpus filler vocabulary"
    assert all(out[i]["score"] >= out[i + 1]["score"]
               for i in range(len(out) - 1))
    # kernel cross-check on the top doc
    top = out[0]["doc_id"]
    pdf = (idx.filter((F.col("doc_id") == top)
                      & F.col("term").isin("lorem", "ipsum")).toPandas())
    lists = []
    for t in ("lorem", "ipsum"):
        g = pdf[pdf["term"] == t]
        lists.append(TermList(g["pos"].values, g["hashgroup"].values,
                              g["density"].values, g["diversity"].values,
                              g["wordspam"].values))
    dfreq = {r["term"]: r["df"] for r in
             idx.filter(F.col("term").isin("lorem", "ipsum"))
             .groupBy("term")
             .agg(F.count_distinct("doc_id").alias("df")).collect()}
    fw = [term_freq_weight(dfreq["lorem"], n),
          term_freq_weight(dfreq["ipsum"], n)]
    assert out[0]["score"] == pytest.approx(score_doc(lists, fw))
