"""Hashgroup-weighted ranking (Posdb.h:70-86, PosdbTable.cpp:564-575,
Parms.cpp:4234-4364 defaults)."""

from pyspark.sql import functions as F

from open_source_search_engine_spark.search.hashgroups import (
    HASHGROUP_WEIGHTS_X10, build_postings_by_region, regions_from_html,
    search_weighted, weighted_scores)

HTML = """<html><head><title>Fast Sort</title>
<style>h1 {color: red}</style></head>
<body><h1>Sorting data</h1>
<script>var sort = "ignored";</script>
<p>body text about merge sort and data</p>
<h2>data layout</h2></body></html>"""


def test_regions_from_html(spark):
    docs = spark.createDataFrame(
        [(1, HTML, "http://x.example/fast-sort/page.html")],
        "doc_id long, content string, url string")
    rows = {r["hashgroup"]: r["text"]
            for r in regions_from_html(docs, url_col="url").collect()}
    assert rows["title"] == "Fast Sort"           # <title> wins the ladder
    assert rows["heading"] == "Sorting data data layout"
    # script/style bodies never reach the body region
    assert "ignored" not in rows["body"] and "color" not in rows["body"]
    assert "merge sort and data" in rows["body"]
    assert "fast sort page html" in rows["inurl"]


def test_weighted_scores_defaults(spark):
    # title=80, body=10, inlinktext=160 per occurrence (Parms defaults x10)
    hg = spark.createDataFrame(
        [("sort", 1, "title", 1), ("sort", 1, "body", 3),
         ("sort", 2, "inlinktext", 1), ("sort", 3, "neighborhood", 5)],
        "term string, doc_id long, hashgroup string, tf long")
    got = {r["doc_id"]: r["score_part"]
           for r in weighted_scores(hg).collect()}
    assert got == {1: 80 + 30, 2: 160, 3: 0}     # neighborhood weight 0.0


def test_search_weighted_title_beats_body(spark):
    # one title occurrence (80) outranks seven body occurrences (70)
    docs = spark.createDataFrame(
        [(1, "<html><title>sort</title><body>x</body></html>"),
         (2, "<html><title>other</title><body>" + "sort " * 7
          + "</body></html>")],
        "doc_id long, content string")
    hg = build_postings_by_region(regions_from_html(docs))
    got = [(r["doc_id"], r["score"])
           for r in search_weighted(hg, ["sort"], k=10).collect()]
    assert got == [(1, 80), (2, 70)]


def test_end_to_end_regions_postings(spark):
    docs = spark.createDataFrame([(1, HTML)], "doc_id long, content string")
    hg = build_postings_by_region(regions_from_html(docs))
    rows = {(r["term"], r["hashgroup"]): r["tf"] for r in hg.collect()}
    assert rows[("sort", "title")] == 1
    assert rows[("data", "heading")] == 2
    assert rows[("merge", "body")] == 1
    # every emitted group has a defined weight
    for _, g in rows:
        assert g in HASHGROUP_WEIGHTS_X10
