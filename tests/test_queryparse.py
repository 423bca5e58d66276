"""Q1 query parser: grammar (AND/OR/NOT, phrases, fields, parens) and
DataFrame execution against a small postings index."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.search.queryparse import (
    And, FieldTerm, Not, Or, Phrase, QueryParseError, Term, parse_query)


def test_parse_implicit_and():
    assert parse_query("data join") == And((Term("data"), Term("join")))


def test_parse_explicit_bool_precedence():
    # AND binds tighter than OR: a b OR c == (a AND b) OR c
    got = parse_query("alpha beta OR gamma")
    assert got == Or((And((Term("alpha"), Term("beta"))), Term("gamma")))


def test_parse_not_and_minus():
    assert parse_query("data NOT spam") == And((Term("data"),
                                                Not(Term("spam"))))
    assert parse_query("data -spam") == And((Term("data"), Not(Term("spam"))))


def test_parse_phrase_and_field():
    got = parse_query('"web crawl order" lang:en')
    assert got == And((Phrase(("web", "crawl", "order")),
                       FieldTerm("lang", "en")))


def test_parse_parens():
    got = parse_query("(a OR b) c")
    assert got == And((Or((Term("a"), Term("b"))), Term("c")))


def test_parse_errors():
    with pytest.raises(QueryParseError):
        parse_query("")
    with pytest.raises(QueryParseError):
        parse_query("(a OR b")
    with pytest.raises(QueryParseError):
        parse_query("a )")


@pytest.fixture(scope="module")
def idx(spark):
    from open_source_search_engine_spark.search.postings import build_postings
    rows = [
        (1, "the web crawl order is stable the web wins"),
        (2, "crawl order of the web pages"),
        (3, "totally unrelated words entirely spam"),
        (4, "web spam detection for crawl data"),
        (5, "order web crawl"),        # words present, phrase NOT in order
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    meta = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, "en"), (5, "de")],
        ["doc_id", "lang"])
    return build_postings(docs), meta


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_exec_and_or_not(spark, idx):
    from open_source_search_engine_spark.search.queryparse import search_query
    postings, meta = idx
    assert set(_ids(search_query(postings, "web crawl"))) == {1, 2, 4, 5}
    assert set(_ids(search_query(postings, "web OR spam"))) == {1, 2, 3, 4, 5}
    assert set(_ids(search_query(postings, "crawl -spam"))) == {1, 2, 5}
    assert set(_ids(search_query(postings, "crawl NOT (spam OR stable)"))) \
        == {2, 5}


def test_exec_phrase_requires_order(spark, idx):
    from open_source_search_engine_spark.search.queryparse import search_query
    postings, meta = idx
    got = set(_ids(search_query(postings, '"web crawl order"')))
    assert got == {1}             # docs 2/5 have the words, not the phrase
    # two-word phrase
    assert set(_ids(search_query(postings, '"crawl order"'))) == {1, 2}


def test_exec_field_filter(spark, idx):
    from open_source_search_engine_spark.search.queryparse import search_query
    postings, meta = idx
    got = set(_ids(search_query(postings, "web lang:en", doc_meta=meta)))
    assert got == {1, 2, 4}
    # unknown field matches nothing
    assert _ids(search_query(postings, "web title:x", doc_meta=meta)) == []


def test_exec_scoring_order(spark, idx):
    from open_source_search_engine_spark.search.queryparse import search_query
    postings, meta = idx
    rows = search_query(postings, "web").collect()
    # doc 1 has tf=2 for 'web' -> highest score, deterministic tiebreak
    assert rows[0]["doc_id"] == 1
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
