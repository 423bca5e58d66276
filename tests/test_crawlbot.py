"""Crawlbot status surface (pipeline/crawlbot.py): CrawlInfo counters,
the getSpiderStatusMsg ladder, the JSON/XML envelopes, daily-merge gate."""

from __future__ import annotations

import calendar
import json
import time
import xml.etree.ElementTree as ET

import pytest

from open_source_search_engine_spark.pipeline.crawlbot import (
    SP_ADMIN_PAUSED, SP_INITIALIZING, SP_INPROGRESS, SP_PAUSED,
    SP_ROUNDDONE, CrawlInfo, crawlbot_status_json, crawlbot_status_xml,
    daily_merge_due, gather_crawl_info, spider_status)


@pytest.fixture(scope="module")
def small_runner(spark, tmp_path_factory):
    from open_source_search_engine_spark.config import CrawlConfig
    from open_source_search_engine_spark.corpus import (generate_corpus,
                                                        write_parquet)
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    c = generate_corpus(seed=42, n_domains=6, n_urls=80)
    cd = str(tmp_path_factory.mktemp("cb_corpus"))
    sd = str(tmp_path_factory.mktemp("cb_state"))
    write_parquet(c, cd)
    runner = CrawlRunner(spark, cd, sd, CrawlConfig(max_rounds=2))
    runner.run()
    yield runner
    runner.close()


class TestCrawlInfo:
    def test_counters_match_logs(self, small_runner):
        info = gather_crawl_info(small_runner)
        rep = small_runner.replies_log().collect()
        assert info.page_download_attempts == len(rep)
        assert info.page_download_successes == sum(
            1 for r in rep if r["err_code"] == 0)
        assert info.urls_harvested == small_runner.url_seen().count()
        assert info.objects_added == small_runner.indexed_docs().count()
        assert info.page_download_attempts > 0

    def test_ready_reflects_manifest(self, small_runner):
        # max_rounds=2 stops an unfinished frontier -> still "ready"
        info = gather_crawl_info(small_runner)
        from open_source_search_engine_spark.pipeline import snapshots as s
        m = s.load_manifest(small_runner.state_dir)
        assert info.has_urls_ready_to_spider == (not m.finished)


class TestStatusLadder:
    def test_master_kill_first(self):
        code, msg = spider_status(spidering_enabled_master=False,
                                  collection_spidering_enabled=False)
        assert code == SP_ADMIN_PAUSED and "master controls" in msg

    def test_ladder_order(self):
        assert spider_status(read_only=True)[0] == SP_ADMIN_PAUSED
        assert spider_status(daily_merge_engaged=True)[1] == \
            "Daily merge engaged, spidering paused."
        assert spider_status(repair_mode=True)[1] == \
            "In repair mode, spidering paused."
        assert spider_status(collection_spidering_enabled=False)[0] == \
            SP_PAUSED
        assert spider_status(coll_status=SP_INITIALIZING)[0] == \
            SP_INITIALIZING
        assert spider_status(coll_status=SP_ROUNDDONE)[0] == SP_ROUNDDONE

    def test_no_urls_reports_inprogress_not_completed(self):
        # Spider.cpp:4101-4110 keeps SP_INPROGRESS (SP_COMPLETED is
        # commented out in the reference)
        code, msg = spider_status(has_urls_ready=False)
        assert code == SP_INPROGRESS
        assert "Nothing currently available to spider" in msg

    def test_in_progress(self):
        assert spider_status() == (SP_INPROGRESS, "Spider is in progress.")


class TestEnvelopes:
    INFO = CrawlInfo(urls_harvested=123, page_download_attempts=50,
                     page_download_successes=47, objects_added=40)

    def test_json_key_order_and_completed_zeroing(self):
        out = crawlbot_status_json(self.INFO, SP_INPROGRESS,
                                   "Spider is in progress.",
                                   1000, 2000, now=3000)
        d = json.loads(out)["response"]
        assert list(d) == ["statusCode", "statusMsg", "jobCreationTimeUTC",
                           "jobCompletionTimeUTC", "urlsHarvested",
                           "pageCrawlAttempts", "pageCrawlSuccesses",
                           "currentTime", "currentTimeUTC"]
        assert d["jobCompletionTimeUTC"] == 0  # running -> zeroed
        assert d["urlsHarvested"] == 123
        done = json.loads(crawlbot_status_json(
            self.INFO, SP_ROUNDDONE, "x", 1000, 2000, now=3000))["response"]
        assert done["jobCompletionTimeUTC"] == 2000

    def test_xml_envelope(self):
        out = crawlbot_status_xml(self.INFO, SP_ROUNDDONE, "Job done.",
                                  1000, 2000, now=3000)
        root = ET.fromstring(out)
        assert root.tag == "response"
        assert root.find("statusCode").text == str(SP_ROUNDDONE)
        assert root.find("statusMsg").text == "Job done."
        assert root.find("pageCrawlSuccesses").text == "47"
        assert root.find("jobCompletionTimeUTC").text == "2000"


def _utc(y, mo, d, h, mi):
    return calendar.timegm((y, mo, d, h, mi, 0, 0, 0, 0))


class TestDailyMerge:
    LAST = 0  # long ago

    def test_fires_inside_window(self):
        # 2026-08-16 is a Sunday (tm_wday 0 -> reference dow 1)
        now = _utc(2026, 8, 16, 2, 5)
        assert daily_merge_due(now, 120, "1", self.LAST)

    def test_misses_before_and_after_window(self):
        assert not daily_merge_due(_utc(2026, 8, 16, 1, 59), 120, "1",
                                   self.LAST)
        assert not daily_merge_due(_utc(2026, 8, 16, 2, 16), 120, "1",
                                   self.LAST)

    def test_24h_debounce(self):
        now = _utc(2026, 8, 16, 2, 5)
        assert not daily_merge_due(now, 120, "1", now - 3600)
        assert daily_merge_due(now, 120, "1", now - 25 * 3600)

    def test_negative_trigger_disables(self):
        assert not daily_merge_due(_utc(2026, 8, 16, 2, 5), -1, "1",
                                   self.LAST)

    def test_dow_off_by_one_quirk(self):
        # Monday 2026-08-17: tm_wday(C)=1 -> reference dow 2: a list of
        # "2" fires on MONDAY (shifted), "1" does not.
        mon = _utc(2026, 8, 17, 2, 5)
        assert daily_merge_due(mon, 120, "2", self.LAST)
        assert not daily_merge_due(mon, 120, "1", self.LAST)

    def test_saturday_never_merges(self):
        # Saturday 2026-08-22: tm_wday(C)=6 -> 7 > 6 -> "bad dow" return
        sat = _utc(2026, 8, 22, 2, 5)
        assert not daily_merge_due(sat, 120, "0123456", self.LAST)

    def test_empty_list_never_fires(self):
        assert not daily_merge_due(_utc(2026, 8, 16, 2, 5), 120, "",
                                   self.LAST)

    def test_multidigit_atoi_parse(self):
        # "12" parses 12 at '1' (dropped) and 2 at '2' -> fires Monday
        mon = _utc(2026, 8, 17, 2, 5)
        assert daily_merge_due(mon, 120, "12", self.LAST)
