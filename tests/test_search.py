"""Query-serving tier: postings build, intersection, proximity scoring,
top-K determinism."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def postings(spark):
    from open_source_search_engine_spark.search.postings import build_postings
    docs = spark.createDataFrame([
        (1, "spark window join window spark"),
        (2, "join the spark window now"),
        (3, "nothing relevant here"),
        (4, "spark spark spark join"),
        (5, "window"),
    ], ["doc_id", "text"])
    return build_postings(docs).cache()


def test_postings_shape(postings):
    rows = {(r["term"], r["doc_id"]): (r["tf"], r["positions"])
            for r in postings.collect()}
    assert rows[("spark", 1)] == (2, [0, 4])
    assert rows[("window", 1)] == (2, [1, 3])
    assert rows[("join", 4)] == (1, [3])


def test_single_term_search(postings):
    from open_source_search_engine_spark.search.postings import search
    got = [(r["doc_id"], r["score"]) for r in
           search(postings, ["spark"], k=10).collect()]
    assert got[0] == (4, 30)       # tf 3
    assert [d for d, _ in got] == [4, 1, 2]


def test_and_intersection_and_proximity(postings):
    from open_source_search_engine_spark.search.postings import search
    got = {r["doc_id"]: (r["score"], r["min_gap"]) for r in
           search(postings, ["spark", "join"], k=10).collect()}
    assert set(got) == {1, 2, 4}   # doc 3/5 lack a term
    # doc 4: tf 3+1=4 -> 40, adjacent (gap 1) -> +50
    assert got[4] == (90, 1)
    # doc 2: tf 1+1 -> 20, gap 2 -> +20
    assert got[2] == (40, 2)


def test_topk_limit_and_determinism(postings):
    from open_source_search_engine_spark.search.postings import search
    a = [r["doc_id"] for r in search(postings, ["spark", "window"], k=2).collect()]
    b = [r["doc_id"] for r in search(postings, ["spark", "window"], k=2).collect()]
    assert a == b and len(a) == 2


def test_summary_snippets(spark):
    from open_source_search_engine_spark.search.summary import summarize
    docs = spark.createDataFrame([
        (1, "aa bb cc dd ee ff gg hh ii jj kk ll spark join mm nn oo pp"),
        (2, "no relevant words in this document at all whatsoever here"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           summarize(docs, ["spark", "join"]).collect()}
    assert got[1]["n_hits"] == 2
    assert "spark" in got[1]["snippet"] and "join" in got[1]["snippet"]
    assert got[1]["title"].startswith("aa bb cc")
    assert got[2]["n_hits"] == 0


def test_summary_prefers_denser_window(spark):
    from open_source_search_engine_spark.search.summary import summarize
    text = ("x " * 30) + "spark y y join " + ("z " * 30) + "spark q q q q"
    docs = spark.createDataFrame([(1, text.strip())], ["doc_id", "text"])
    r = summarize(docs, ["spark", "join"]).collect()[0]
    assert r["n_hits"] == 2
    assert "join" in r["snippet"]


def test_min_gap_zipper_handles_huge_termlists(spark):
    """tf~5000 termlists must complete without the |a|x|b| cell explosion
    (the old flatten materialized 25M cells per doc) and agree with the
    brute-force min on small inputs."""
    import random
    from pyspark.sql import functions as F
    from open_source_search_engine_spark.search.postings import _min_gap

    rng = random.Random(5)
    a = sorted(rng.sample(range(1_000_000), 5000))
    b = sorted(rng.sample(range(1_000_000), 5000))
    df = spark.createDataFrame([(a, b)], ["pa", "pb"])
    got = df.select(_min_gap(F.col("pa"), F.col("pb")).alias("g")).first()["g"]
    want = min(abs(x - y) for x in a for y in b)
    assert got == want
    # tiny vectors incl. ties and containment
    cases = [([1], [1]), ([1, 10], [5]), ([3, 9], [9, 40]), ([7], [2, 8])]
    for pa, pb in cases:
        g = (spark.createDataFrame([(pa, pb)], ["pa", "pb"])
             .select(_min_gap(F.col("pa"), F.col("pb")).alias("g"))
             .first()["g"])
        assert g == min(abs(x - y) for x in pa for y in pb), (pa, pb)


def test_title_extraction_candidate_ladder(spark):
    """Title.cpp candidate priority: <title> > og:title > <h1> > leading
    tokens, entity-decoded and tag-stripped — Catalyst and Python twins
    must agree."""
    from pyspark.sql import functions as F
    from open_source_search_engine_spark.search.summary import (
        extract_title, title_expr)
    cases = [
        ("<html><head><title>Big &amp; Bold</title></head>"
         "<h1>Wrong one</h1>body text", "Big & Bold"),
        ('<meta property="og:title" content="Social Title"/>'
         "<h1>Also wrong</h1>stuff", "Social Title"),
        ("<h1>The <b>Heading</b></h1> rest of the body here", "The Heading"),
        ("just plain body words flowing along here with more trailing text",
         "just plain body words flowing along here with"),
        ("<title>   </title><h1>Fallback H1</h1>x", "Fallback H1"),
    ]
    for text, want in cases:
        assert extract_title(text) == want, text
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)],
                               ["i", "text"])
    got = {r["i"]: r["t"] for r in
           df.select("i", title_expr("text").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i])


def test_anchor_text_indexing(spark):
    """Incoming link text contributes tf to the DESTINATION doc
    (XmlDoc.cpp:4150-4172 'add each incoming link text'): a doc never
    containing a term becomes findable by it through its inlinks, body
    positions stay body-only, and docs with both sources sum their tf."""
    from open_source_search_engine_spark.search.postings import (
        build_postings, build_postings_with_anchors, search)
    docs = spark.createDataFrame([
        (1, "spark engine internals"),
        (2, "totally unrelated page"),
        (3, "spark joins explained"),
    ], ["doc_id", "text"])
    links = spark.createDataFrame([
        (2, "spark tutorial"),          # doc 2 gains 'spark' via anchor
        (2, "best spark guide"),
        (3, "spark"),                   # doc 3: body tf 1 + anchor tf 1
    ], ["dst_doc_id", "anchor_text"])
    p = build_postings_with_anchors(docs, links)
    rows = {(r["term"], r["doc_id"]): r for r in p.collect()}
    assert rows[("spark", 2)]["tf"] == 2
    assert rows[("spark", 2)]["positions"] == []     # no body hit
    assert rows[("spark", 3)]["tf"] == 2             # 1 body + 1 anchor
    assert rows[("spark", 3)]["positions"] == [0]    # body position kept
    assert rows[("spark", 1)]["tf"] == 1
    # anchor-only docs are searchable; body-only index can't see doc 2
    got = {r["doc_id"] for r in search(p, ["spark"], k=10).collect()}
    assert got == {1, 2, 3}
    base = {r["doc_id"]
            for r in search(build_postings(docs), ["spark"], k=10).collect()}
    assert base == {1, 3}


def test_score_with_boosts_siterank_and_lang(spark):
    """PosdbTable.cpp:4413-4426 in integer form: the siteRank multiplier
    is (3*sr + max(hisr-sr,0) + 9) (reference floats x9), and same/
    unknown-language docs get the x20 sameLangWeight boost."""
    from open_source_search_engine_spark.search.postings import (
        score_with_boosts)
    results = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 100)], ["doc_id", "score"])
    meta = spark.createDataFrame(
        [(1, 0, 0, "en"),     # no rank, matching lang
         (2, 6, 0, "en"),     # siteRank 6
         (3, 0, 9, "en"),     # inlink from a rank-9 site
         (4, 6, 0, "fr")],    # foreign language: no x20
        ["doc_id", "site_rank", "highest_inlink_site_rank", "lang"])
    got = {r["doc_id"]: r["score"] for r in
           score_with_boosts(results, meta, qlang="en").collect()}
    assert got[1] == 100 * 9 * 20            # (0+0+9) x langweight
    assert got[2] == 100 * 27 * 20           # (18+0+9)
    assert got[3] == 100 * 18 * 20           # (0+9+9): hisr pulls up 1/3
    assert got[4] == 100 * 27                # foreign: no lang boost
    # no qlang => every doc counts as same-language (ref: m_language==0)
    got0 = {r["doc_id"]: r["score"] for r in
            score_with_boosts(results, meta).collect()}
    assert got0[4] == 100 * 27 * 20
    # docs missing from the meta dim keep multiplier 9 x langweight
    got_miss = {r["doc_id"]: r["score"] for r in score_with_boosts(
        spark.createDataFrame([(99, 10)], ["doc_id", "score"]),
        meta, qlang="en").collect()}
    assert got_miss[99] == 10 * 9 * 20
