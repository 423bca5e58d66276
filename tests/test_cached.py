"""Cached-page serving + highlight (PageGet.cpp, Highlight.cpp)."""

from open_source_search_engine_spark.search.cached import (
    BACK_TAG, cached_page, front_tag, highlight, is_no_archive)
from pyspark.sql import functions as F


def test_highlight_cycles_styles(spark):
    df = spark.createDataFrame([("Data join DATA",)], "t string")
    got = df.select(highlight("t", ["data", "join"]).alias("h")).head()["h"]
    # per-term gbcnstNN spans (Highlight.cpp:11-18), original casing kept
    assert got == (f"{front_tag(0)}Data{BACK_TAG} "
                   f"{front_tag(1)}join{BACK_TAG} "
                   f"{front_tag(0)}DATA{BACK_TAG}")


def test_highlight_whole_words_only(spark):
    df = spark.createDataFrame([("database data",)], "t string")
    got = df.select(highlight("t", ["data"]).alias("h")).head()["h"]
    assert got == f"database {front_tag(0)}data{BACK_TAG}"


def test_cached_page_lookup_and_noarchive(spark):
    docs = spark.createDataFrame(
        [(1, "http://a/", "plain data page"),
         (2, "http://b/",
          "<meta name=robots content='noindex,noarchive'> secret")],
        "doc_id long, url string, text string")
    r1 = cached_page(docs, doc_id=1, terms=["data"]).head()
    assert "gbcnst00" in r1["content"] and not r1["no_archive"]
    # noarchive page: refusal (NULL content), like PageGet's m_noArchive
    r2 = cached_page(docs, doc_id=2).head()
    assert r2["content"] is None and r2["no_archive"]
    # url-keyed lookup
    assert cached_page(docs, url="http://a/").head()["doc_id"] == 1
