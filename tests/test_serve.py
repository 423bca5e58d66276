"""Msg40 result-page assembly (search/serve.py) — end-to-end serve tests."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.search.serve import (
    positive_terms,
    serve_results,
)
from open_source_search_engine_spark.search.results import visible


class TestPositiveTerms:
    def test_plain_and(self):
        assert positive_terms("apache spark") == ["apache", "spark"]

    def test_phrase_words_included(self):
        assert positive_terms('"fast joins" engine') == \
            ["fast", "joins", "engine"]

    def test_negated_excluded(self):
        assert positive_terms("spark -hadoop") == ["spark"]

    def test_field_ops_excluded(self):
        assert positive_terms("site:example.com spark") == ["spark"]

    def test_dedup_case_insensitive(self):
        assert positive_terms("Spark spark SPARK") == ["spark"]


DOCS = [
    (1, "apache spark runs distributed queries with adaptive execution "
        "and a cost based optimizer for large analytical workloads",
     "http://a.com/spark-guide", "en", False),
    (2, "spark streaming processes events with watermarks and windows "
        "for late data in long running pipelines", "http://a.com/streams",
     "en", False),
    (3, "gardening tips for tomato plants in raised beds with compost "
        "and regular watering schedules", "http://b.com/garden", "en",
     False),
    (4, "spark spark spark spark spark spark spark spark spark spark "
        "repeated filler spam page with nothing else",
     "http://spam.com/x", "en", True),
    (5, "la chispa procesa datos distribuidos con gran velocidad y "
        "eficiencia en racimos grandes", "http://c.es/datos", "es",
     False),
]

SCHEMA = "doc_id long, text string, url string, lang string, is_adult boolean"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA).cache()


class TestServeResults:
    def test_basic_page_shape(self, spark, docs):
        page = serve_results(docs, "spark", k=3, url_col="url",
                             lang_col="lang", adult_col="is_adult",
                             content_type="text").collect()
        assert 0 < len(page) <= 3
        for r in page:
            assert r.title != "" or r.summary != ""
            assert r.cluster_level is not None
        ranks = [r.rank for r in page]
        assert ranks == sorted(ranks)

    def test_matching_docs_only(self, spark, docs):
        page = serve_results(docs, "tomato compost", k=5, url_col="url",
                             content_type="text").collect()
        ids = {r.doc_id for r in page}
        assert ids == {3}

    def test_summary_contains_query_terms(self, spark, docs):
        page = serve_results(docs, "optimizer", k=2, url_col="url",
                             content_type="text").collect()
        assert any("optimizer" in (r.summary or "") for r in page)

    def test_family_filter_hides_adult(self, spark, docs):
        page = serve_results(docs, "spark", k=5, url_col="url",
                             adult_col="is_adult", family_filter=True)
        vis = visible(page).collect()
        assert all(r.doc_id != 4 for r in vis)

    def test_lang_filter(self, spark, docs):
        page = serve_results(docs, "datos", k=5, url_col="url",
                             lang_col="lang", lang_filter="en")
        assert visible(page).count() == 0

    def test_boolean_query_falls_back(self, spark, docs):
        # OR shape: PosdbTable raises, DataFrame algebra serves it
        page = serve_results(docs, "tomato OR watermarks", k=5,
                             url_col="url", content_type="text").collect()
        ids = {r.doc_id for r in page}
        assert ids == {2, 3}

    def test_anchors_feed_titles(self, spark, docs):
        anchors = spark.createDataFrame(
            [(1, "The Definitive Spark Guide", "", True)],
            "doc_id long, link_text string, rss_title string, "
            "same_host boolean")
        page = serve_results(docs, "optimizer", k=2, url_col="url",
                             anchors=anchors,
                             content_type="text").collect()
        row = next(r for r in page if r.doc_id == 1)
        assert row.title == "The Definitive Spark Guide"

    def test_site_clustering_caps_per_host(self, spark, docs):
        # both a.com docs match "spark"; max_per_site=1 clusters one away
        page = serve_results(docs, "spark", k=5, url_col="url",
                             max_per_site=1, content_type="text")
        vis = visible(page).collect()
        hosts = [r.url.split("/")[2] for r in vis]
        assert len(hosts) == len(set(hosts))

    def test_highlight_summaries(self, spark, docs):
        page = serve_results(docs, "optimizer", k=2, url_col="url",
                             content_type="text",
                             highlight_summaries=True).collect()
        row = next(r for r in page if r.doc_id == 1)
        assert "optimizer</span>" in row.summary

    def test_did_you_mean(self, spark, docs):
        from open_source_search_engine_spark.search.serve import (
            did_you_mean_for)
        # "sparkstreaming" splits into two dict words
        assert did_you_mean_for(docs, "sparkstreaming") == \
            "spark streaming"
        assert did_you_mean_for(docs, "spark") is None

    def test_serve_tail_is_broadcast(self, spark, docs):
        # the join-back of the K winners must be a broadcast join, not a
        # shuffled sort-merge of the corpus
        page = serve_results(docs, "spark", k=3, url_col="url",
                             content_type="text", dedup_percent=0)
        plan = page._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
