"""Statsdb per-second stat buckets (pipeline/statsdb.py)."""

import pytest

from open_source_search_engine_spark.pipeline.statsdb import (
    PPM,
    add_stats,
    label_hash32,
    stat_series,
)


def _rows(df):
    return {(r.label, r.t_sec): (r.total_ops_ppm, r.total_quantity_ppm,
                                 r.total_time_ms)
            for r in df.collect()}


class TestAddStats:
    def test_single_second_op(self, spark):
        # op fully inside second 1: fraction 1.0
        ops = spark.createDataFrame(
            [("q", 1200, 1700, 10)],
            "label string, t1_ms long, t2_ms long, value long")
        out = _rows(add_stats(ops))
        assert out == {("q", 1): (PPM, 10 * PPM, 500)}

    def test_spread_across_seconds(self, spark):
        # 2000 ms op from 500 to 2500: seconds 0 (500ms, 25%),
        # 1 (1000ms, 50%), 2 (500ms, 25%) — Statsdb.cpp:314 fractionTime
        ops = spark.createDataFrame(
            [("q", 500, 2500, 8)],
            "label string, t1_ms long, t2_ms long, value long")
        out = _rows(add_stats(ops))
        assert out[("q", 0)] == (PPM // 4, 2 * PPM, 500)
        assert out[("q", 1)] == (PPM // 2, 4 * PPM, 1000)
        assert out[("q", 2)] == (PPM // 4, 2 * PPM, 500)

    def test_zero_duration_bumped(self, spark):
        # t1 == t2 -> t2++ (Statsdb.cpp:285): 1 ms op, full weight
        ops = spark.createDataFrame(
            [("e", 3000, 3000, 5)],
            "label string, t1_ms long, t2_ms long, value long")
        out = _rows(add_stats(ops))
        assert out == {("e", 3): (PPM, 5 * PPM, 1)}

    def test_too_old_discarded(self, spark):
        # >= 30 s ops dropped (Statsdb.cpp:297-301)
        ops = spark.createDataFrame(
            [("q", 0, 30_000, 1), ("q", 0, 29_999, 0)],
            "label string, t1_ms long, t2_ms long, value long")
        out = add_stats(ops)
        assert out.count() == 30          # only the 29.999 s op's buckets
        assert out.agg({"total_time_ms": "sum"}).first()[0] == 29_999

    def test_accumulation_two_ops_same_bucket(self, spark):
        ops = spark.createDataFrame(
            [("q", 1000, 2000, 3), ("q", 1500, 2000, 7)],
            "label string, t1_ms long, t2_ms long, value long")
        out = _rows(add_stats(ops))
        assert out == {("q", 1): (2 * PPM, 10 * PPM, 1500)}

    def test_labels_independent(self, spark):
        ops = spark.createDataFrame(
            [("a", 1000, 2000, 1), ("b", 1000, 2000, 2)],
            "label string, t1_ms long, t2_ms long, value long")
        series = stat_series(add_stats(ops), "a").collect()
        assert len(series) == 1 and series[0].total_quantity_ppm == PPM

    def test_no_exchange_before_partial_agg(self, spark):
        # map-side combine: plan has partial aggregation before exchange
        ops = spark.createDataFrame(
            [("q", 1000, 2000, 1)],
            "label string, t1_ms long, t2_ms long, value long")
        plan = add_stats(ops)._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan


class TestLabelHash:
    def test_hash32_matches_ghash(self):
        from open_source_search_engine_spark.functions.ghash import (
            hash32_bytes,
        )
        assert label_hash32(["spider_fetch"])[0] == \
            int(hash32_bytes([b"spider_fetch"])[0])
        assert label_hash32(["a"]) != label_hash32(["b"])


class TestCrawlBridge:
    def test_bridge_schema_and_error_label(self, spark):
        from open_source_search_engine_spark.pipeline.statsdb import (
            crawl_stats_to_statsdb,
        )
        replies = spark.createDataFrame(
            [(2000, 0), (3000, 32769)],
            "download_end_ms long, err_code long")
        out = crawl_stats_to_statsdb(replies, fetch_duration_ms=1000)
        labels = {r.label for r in out.select("label").distinct().collect()}
        assert labels == {"spider_fetch", "spider_error"}
        # fetch ops: one per reply; error ops: only the failed one
        fetch_ops = (out.filter("label = 'spider_fetch'")
                     .agg({"total_ops_ppm": "sum"}).first()[0])
        assert fetch_ops == 2 * PPM
