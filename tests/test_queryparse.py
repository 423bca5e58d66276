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
        [(1, "en", 9.5, 100), (2, "en", 3.25, 40), (3, "de", 7.0, 900),
         (4, "en", 1.5, 250), (5, "de", 5.0, 10)],
        ["doc_id", "lang", "price", "views"])
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


def test_parse_sort_and_range_ops():
    from open_source_search_engine_spark.search.queryparse import (
        NumberFilter, SortBy)
    assert parse_query("gbsortby:price") == SortBy("price", False, False)
    assert parse_query("gbrevsortbyint:views") == SortBy("views", True, True)
    got = parse_query("web gbmin:price:1.23")
    assert got == And((Term("web"),
                       NumberFilter("price", ">=", 1.23, False)))
    assert parse_query("gbmaxint:views:100") == \
        NumberFilter("views", "<=", 100.0, True)
    with pytest.raises(QueryParseError):
        parse_query("gbmin:price")          # no value
    with pytest.raises(QueryParseError):
        parse_query("gbmin:price:abc")      # bad number


def test_exec_gbsortby_reranks(spark, idx):
    from open_source_search_engine_spark.search.queryparse import search_query
    postings, meta = idx
    # low-to-high by price (Query.cpp:1668 'sorts numbers in a field
    # from low to high'); relevance no longer orders
    rows = search_query(postings, "web gbsortby:price",
                        doc_meta=meta).collect()
    assert [r["doc_id"] for r in rows] == [4, 2, 5, 1]
    assert [r["sort_key"] for r in rows] == [1.5, 3.25, 5.0, 9.5]
    # high-to-low integer variant
    rows = search_query(postings, "web gbrevsortbyint:views",
                        doc_meta=meta).collect()
    assert [r["doc_id"] for r in rows] == [4, 1, 2, 5]


def test_exec_gbmin_gbmax_constrain(spark, idx):
    from open_source_search_engine_spark.search.queryparse import search_query
    postings, meta = idx
    got = set(_ids(search_query(postings, "web gbmin:price:3.0",
                                doc_meta=meta)))
    assert got == {1, 2, 5}
    got = set(_ids(search_query(postings, "web gbmax:price:3.0",
                                doc_meta=meta)))
    assert got == {4}
    got = set(_ids(search_query(postings, "gbequalint:views:900",
                                doc_meta=meta)))
    assert got == {3}
    # range + sort compose: cheap-to-expensive among price >= 3
    rows = search_query(postings, "web gbmin:price:3.0 gbsortby:price",
                        doc_meta=meta).collect()
    assert [r["doc_id"] for r in rows] == [2, 5, 1]


def test_exec_sort_ignored_in_bool_truth(spark, idx):
    from open_source_search_engine_spark.search.queryparse import search_query
    postings, meta = idx
    # '(A OR B) gbsortby:f' must evaluate the boolean over A/B only
    # (Query.cpp:1771-1781 m_ignoreWordInBoolQuery)
    rows = search_query(postings, "(spam OR stable) gbsortby:price",
                        doc_meta=meta).collect()
    assert [r["doc_id"] for r in rows] == [4, 3, 1]   # by price asc


def test_exec_link_fields_and_docid(spark, idx):
    from open_source_search_engine_spark.search.queryparse import search_query
    postings, meta = idx
    links = spark.createDataFrame([
        (1, "http://target.com/page"),
        (2, "http://target.com/page"),
        (3, "http://target.com/other"),
        (4, "http://elsewhere.org/x"),
    ], ["src_doc_id", "dst_url"])
    # link:X = docs linking to page X (scheme-insensitive compare)
    got = set(_ids(search_query(postings, "link:target.com/page",
                                links=links)))
    assert got == {1, 2}
    got = set(_ids(search_query(postings, "link:http://target.com/page",
                                links=links)))
    assert got == {1, 2}
    # sitelink:X = docs linking anywhere on host X
    got = set(_ids(search_query(postings, "sitelink:target.com",
                                links=links)))
    assert got == {1, 2, 3}
    # composes with terms: spam docs linking to target.com
    got = set(_ids(search_query(postings, "spam sitelink:target.com",
                                links=links)))
    assert got == {3}
    # gbdocid: direct lookup; bad docid matches nothing
    assert _ids(search_query(postings, "gbdocid:4")) == [4]
    assert _ids(search_query(postings, "gbdocid:abc")) == []
    # no links dim provided -> link: matches nothing
    assert _ids(search_query(postings, "link:target.com/page")) == []


def test_url_site_ip_fields(spark):
    from open_source_search_engine_spark.search.queryparse import (
        search_query)
    from open_source_search_engine_spark.search.postings import (
        build_postings)
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "alpha delta")],
        "doc_id long, text string")
    meta = spark.createDataFrame(
        [(1, "http://xyz.com/a.html", 167772161),
         (2, "http://xyz.com/~bob/b.html", 167772161),
         (3, "http://other.example.com/c.html", 167772162)],
        "doc_id long, url string, first_ip long")
    p = build_postings(docs)
    got = lambda q: {r["doc_id"] for r in
                     search_query(p, q, doc_meta=meta).collect()}
    # site: matches the host (www.-insertion covered both ways)
    assert got("alpha site:xyz.com") == {1, 2}
    assert got("alpha site:other.example.com") == {3}
    # site: with a path area restricts to the prefix
    assert got("alpha site:xyz.com/~bob") == {2}
    # url: exact scheme-stripped match
    assert got("alpha url:xyz.com/a.html") == {1}
    assert got("alpha url:http://xyz.com/a.html") == {1}
    # ip:
    assert got("alpha ip:167772162") == {3}


def test_title_field(spark):
    from open_source_search_engine_spark.search.queryparse import (
        search_query)
    from open_source_search_engine_spark.search.postings import (
        build_postings)
    from open_source_search_engine_spark.search.hashgroups import (
        build_postings_by_region)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta title0")],
        "doc_id long, text string")
    regions = spark.createDataFrame(
        [(1, "title", "beta news"), (1, "body", "alpha beta gamma"),
         (2, "title", "other page"), (2, "body", "alpha delta title0")],
        "doc_id long, hashgroup string, text string")
    p = build_postings(docs)
    rp = build_postings_by_region(regions)
    got = {r["doc_id"] for r in
           search_query(p, "alpha title:beta",
                        region_postings=rp).collect()}
    assert got == {1}
    # a body-only occurrence of the word does not satisfy title:
    got = {r["doc_id"] for r in
           search_query(p, "alpha title:title0",
                        region_postings=rp).collect()}
    assert got == set()
