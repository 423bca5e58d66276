"""JSON field indexing (hashJSONFields2, XmlDoc_Indexing.cpp:2805)."""

import pytest

from open_source_search_engine_spark.search.jsonfields import (
    build_json_postings, flatten_json, search_json_field)


class TestFlatten:
    def test_compound_names(self):
        got = flatten_json('{"meta": {"twitter": {"title": "Big News"}}}')
        assert got == [("meta.twitter.title", "Big News", "inmetatag")]

    def test_hashgroup_order_meta_wins(self):
        # title then meta checked: "meta" last wins
        # (XmlDoc_Indexing.cpp:2864-2876)
        assert flatten_json('{"title": "x"}')[0][2] == "title"
        assert flatten_json('{"meta": {"title": "x"}}')[0][2] == "inmetatag"
        assert flatten_json('{"resolved_url": "http://x"}')[0][2] == "inurl"
        assert flatten_json('{"tags": ["a"]}')[0][2] == "intag"
        assert flatten_json('{"body": "x"}')[0][2] == "body"

    def test_html_field_skipped(self):
        got = flatten_json('{"html": "<b>x</b>", "text": "y"}')
        assert [g[0] for g in got] == ["text"]
        # nested html is NOT skipped (only the top-level diffbot field)
        assert flatten_json('{"a": {"html": "z"}}')[0][0] == "a.html"

    def test_arrays_no_duplicate_name(self):
        got = flatten_json('{"dupname": [{"a": "b"}, {"c": "d"}]}')
        assert [g[0] for g in got] == ["dupname.a", "dupname.c"]
        # bare arrays keep the array name once
        got = flatten_json('{"tags": ["x", "y"]}')
        assert [g[0] for g in got] == ["tags", "tags"]

    def test_colon_replaced(self):
        got = flatten_json('{"og:title": "x"}')
        assert got[0][0] == "og.title"

    def test_numbers_and_bools(self):
        got = dict((n, v) for n, v, _ in
                   flatten_json('{"n": 42, "f": 1.5, "b": true, "z": null}'))
        assert got["n"] == "42"
        assert got["f"] == "1.5"
        assert "b" not in got     # JT_BOOL not indexed
        assert "z" not in got

    def test_date_to_epoch(self):
        got = flatten_json('{"date": "2009-02-13 23:31:30"}')
        assert got[0][1] == "1234567890"
        # pre-1902 clamps to int32 min (XmlDoc_Indexing.cpp:2895)
        got = flatten_json('{"date": "1898-01-01"}')
        assert got[0][1] == str(-0x80000000)


@pytest.mark.usefixtures("spark")
class TestSearch:
    DOCS = [
        (1, '{"title": "spark engine", "body": "the spark engine"}'),
        (2, '{"title": "other", "body": "spark engine mention"}'),
        (3, '{"title": "spark engine spark", "body": "x"}'),
    ]

    def test_field_search_ranked(self, spark):
        docs = spark.createDataFrame(self.DOCS,
                                     "doc_id long, json string")
        p = build_json_postings(docs)
        out = search_json_field(p, "title", ["spark", "engine"]).collect()
        # doc 3 has tf 2 for spark in title (weight 80): 240 vs 160
        assert [r["doc_id"] for r in out] == [3, 1]
        assert out[0]["score"] == 240 and out[1]["score"] == 160
        body = search_json_field(p, "body", ["spark", "engine"]).collect()
        assert [r["doc_id"] for r in body] == [1, 2]


class TestRfcDates:
    def test_rfc1123(self):
        got = flatten_json('{"date": "Sun, 06 Nov 1994 08:49:37 GMT"}')
        assert got[0][1] == "784111777"

    def test_no_weekday(self):
        got = flatten_json('{"date": "06 Nov 1994"}')
        assert got[0][1] == "784080000"

    def test_unparseable_left_as_string(self):
        got = flatten_json('{"date": "sometime soon"}')
        assert got[0][1] == "sometime soon"


class TestTimezoneTable:
    """Timezone.cpp tzs[] + getTimeZone; HttpMime atotime tz add."""

    def test_known_zones(self):
        from open_source_search_engine_spark.functions.timezone import (
            TIMEZONES,
            get_time_zone,
        )
        assert get_time_zone("GMT") == 0
        assert get_time_zone("utc") == 0
        assert get_time_zone("EST") == -5 * 3600
        assert get_time_zone("acdt") == 10 * 3600 + 30 * 60
        assert get_time_zone("nosuchzone") is None
        assert len(TIMEZONES) > 250

    def test_leading_alnum_run_only(self):
        from open_source_search_engine_spark.functions.timezone import (
            get_time_zone,
        )
        # getTimeZone scans isalnum chars then stops (Timezone.cpp:339)
        assert get_time_zone("GMT; charset=x") == 0
        assert get_time_zone("est\n") == -5 * 3600

    def test_date_parse_applies_offset(self):
        from open_source_search_engine_spark.search.jsonfields import (
            _parse_date,
        )
        base = _parse_date("Sun, 06 Nov 1994 08:49:37 GMT")
        est = _parse_date("Sun, 06 Nov 1994 08:49:37 EST")
        # HttpMime.cpp:320 global += tzoff (offset ADDED, verbatim)
        assert est == base - 5 * 3600
        # unknown zone: unchanged (BADTIMEZONE path)
        assert _parse_date("Sun, 06 Nov 1994 08:49:37 XQZ") == base
