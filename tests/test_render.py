"""PageResults JSON/XML feed serialization (search/render.py)."""

import json

from open_source_search_engine_spark.search.render import (
    render_results_json,
    render_results_xml,
    serve_results_json,
)

ROWS = [
    {"rank": 0, "doc_id": 7, "score": 120, "url": "http://a.example/x",
     "lang": "en", "is_adult": False, "title": "Alpha page",
     "summary": "the alpha summary", "_text": "x" * 2048},
    {"rank": 1, "doc_id": 9, "score": 80, "url": "http://b.example/y",
     "lang": "de", "is_adult": True, "title": "Beta",
     "summary": "beta sum", "_text": "y" * 100},
]


class TestJsonFeed:
    def test_envelope_keys_reference_order(self):
        out = json.loads(render_results_json(ROWS, "alpha query",
                                             took_ms=12,
                                             current_time_utc=1000))
        assert list(out)[:4] == ["currentTimeUTC", "responseTimeMS",
                                 "hits", "moreResultsFollow"]
        assert out["hits"] == 2
        assert out["queryInfo"]["fullQuery"] == "alpha query"

    def test_result_fields(self):
        out = json.loads(render_results_json(ROWS, "q"))
        r = out["results"][0]
        assert list(r) == ["title", "sum", "url", "size", "sizeInBytes",
                           "docId", "docScore", "isAdult", "site",
                           "language", "langAbbr"]
        assert r["docId"] == 7
        assert r["site"] == "a.example"
        assert r["sizeInBytes"] == 2048
        assert r["size"].endswith("k")
        assert out["results"][1]["isAdult"] is True

    def test_spell_optional(self):
        out = json.loads(render_results_json(ROWS, "q", spell="fixed"))
        assert out["spell"] == "fixed"
        out2 = json.loads(render_results_json(ROWS, "q"))
        assert "spell" not in out2

    def test_hits_override_and_more(self):
        out = json.loads(render_results_json(ROWS, "q", hits=500,
                                             more_follow=True))
        assert out["hits"] == 500 and out["moreResultsFollow"] == 1


class TestXmlFeed:
    def test_xml_shape(self):
        out = render_results_xml(ROWS, "alpha & beta")
        assert out.startswith('<?xml version="1.0"')
        assert "<![CDATA[alpha & beta]]>" in out
        assert out.count("<result>") == 2
        assert "<docId>7</docId>" in out
        assert "<site><![CDATA[a.example]]></site>" in out


class TestServeIntegration:
    def test_one_call_feed(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma words here", "http://a.example/1"),
             (2, "alpha beta other text body", "http://b.example/2"),
             (3, "unrelated content entirely", "http://c.example/3")],
            "doc_id long, text string, url string")
        out = json.loads(serve_results_json(
            docs, "alpha beta", k=5, url_col="url"))
        assert out["hits"] == 2
        urls = [r["url"] for r in out["results"]]
        assert set(urls) == {"http://a.example/1", "http://b.example/2"}
        # ranks are ascending in the feed
        scores = [r["docScore"] for r in out["results"]]
        assert scores == sorted(scores, reverse=True)
