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
