"""SpiderProxy rotation + proxy-ban politeness (functions/proxy.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.functions.proxy import (
    AUTOCRAWLDELAY, DELAYPERBAN, MAX_PROXYCRAWLDELAYMS, MAX_THRESHOLD,
    ProxyEntry, assign_wave_proxies, backoff_crawl_delay_col, choose_proxy,
    num_banned_proxies, proxy_threshold, proxy_threshold_batch,
    proxy_threshold_col)


def _ref_threshold(b: int) -> int:
    """The LITERAL CASE ladder transcribed from SpiderProxy.cpp:617-652
    (with the <=0 error-guard at :655 folded in)."""
    if b <= 0:
        return 1
    for k in range(1, 10):
        lo = (1 << k) - 1
        if b == lo:
            return 1 << k
        if b < (1 << (k + 1)) - 1:
            return max((1 << (k + 1)) - 1 - b, 1)
    return 1024


class TestThresholdLadder:
    def test_closed_form_matches_reference_case_ladder(self):
        for b in range(0, 2100):
            assert proxy_threshold(b) == _ref_threshold(b), b

    def test_tier_anchors(self):
        # the doubling anchors named in the reference comments
        assert proxy_threshold(0) == 1
        assert proxy_threshold(1) == 2
        assert proxy_threshold(3) == 4
        assert proxy_threshold(7) == 8
        assert proxy_threshold(15) == 16
        assert proxy_threshold(1023) == MAX_THRESHOLD == 1024

    def test_within_tier_narrowing(self):
        # each additional ban inside a tier shrinks the pool back toward
        # the next doubling (SpiderProxy.cpp:622 "3 - numBannedProxies")
        assert proxy_threshold(2) == 1
        assert proxy_threshold(4) == 3
        assert proxy_threshold(8) == 7

    def test_numpy_twin(self):
        got = proxy_threshold_batch(range(2100))
        want = np.array([proxy_threshold(b) for b in range(2100)])
        assert (got == want).all()


def test_threshold_and_backoff_catalyst(spark):
    df = spark.range(2100).select(
        F.col("id").alias("b"),
        proxy_threshold_col(F.col("id")).alias("t"),
        backoff_crawl_delay_col(F.lit(250), F.col("id")).alias("d"))
    for r in df.collect():
        b = r["b"]
        assert r["t"] == proxy_threshold(b), b
        # Msg13.cpp:2050-2054: b*500 capped at 60000, floored at base
        assert r["d"] == max(250, min(b * DELAYPERBAN,
                                      MAX_PROXYCRAWLDELAYMS)), b


class TestChooseProxy:
    def _fresh(self, n=8):
        return [ProxyEntry(ip=100 + i, port=3128 + i) for i in range(n)]

    def test_start_slot_is_ip_mod_slots(self):
        # SpiderProxy.cpp:664-667: "start at a random slot based on
        # url's IP so we don't overload the first proxy"
        ps = self._fresh()
        assert choose_proxy(0, ps, set()).ip == 100
        assert choose_proxy(3, ps, set()).ip == 103
        assert choose_proxy(11, ps, set()).ip == 103

    def test_dead_skipped(self):
        ps = self._fresh()
        ps[3].dead = True
        assert choose_proxy(3, ps, set()).ip == 104

    def test_banned_skipped_and_threshold_widens(self):
        ps = self._fresh()
        # 1 ban -> threshold 2: candidates are the next TWO alive
        # unbanned proxies in rotation order
        w = choose_proxy(3, ps, {(3, 103)})
        assert w.ip == 104

    def test_threshold_cuts_candidates(self):
        # 0 bans -> threshold 1: even if a later proxy has lower count,
        # only the first candidate in scan order is eligible
        ps = self._fresh()
        ps[3].count_for_ip[3] = 5
        ps[4].count_for_ip[3] = 0
        assert choose_proxy(3, ps, set()).ip == 103   # pool of ONE

    def test_min_count_then_oldest_tiebreak(self):
        # 3 bans -> threshold 4: pool has room to prefer min in-flight
        # count; ties go to the strictly oldest last-use
        ps = self._fresh()
        banned = {(3, 100), (3, 101), (3, 102)}
        # pool (threshold 4, scan from slot 3): 103, 104, 105, 106
        ps[3].count_for_ip[3] = 2
        ps[4].count_for_ip[3] = 1
        ps[5].count_for_ip[3] = 1
        ps[6].count_for_ip[3] = 1
        ps[4].last_used_for_ip[3] = 900
        ps[5].last_used_for_ip[3] = 800
        ps[6].last_used_for_ip[3] = 950
        assert choose_proxy(3, ps, banned).ip == 105  # count tie, older
        ps[5].last_used_for_ip[3] = 900
        assert choose_proxy(3, ps, banned).ip == 104  # equal: first scan

    def test_all_dead_fallback(self):
        # SpiderProxy.cpp:608-612 redo: all dead -> unfiltered rescan
        ps = self._fresh()
        for p in ps:
            p.dead = True
        assert choose_proxy(3, ps, {(3, 103)}).ip == 103

    def test_no_proxies_raises(self):
        with pytest.raises(ValueError):
            choose_proxy(3, [], set())


def test_assign_wave_proxies(spark):
    wave = spark.createDataFrame(
        [(i, 167772160 + i % 4, 250) for i in range(12)],
        "uh long, first_ip long, crawl_delay_ms long")
    proxies = [ProxyEntry(ip=200 + i) for i in range(4)]
    proxies[1].dead = True
    bans = spark.createDataFrame(
        [(167772161, 200), (167772161, 201), (167772161, 202)],
        "url_ip long, proxy_ip long")
    out = {(r["first_ip"]): (r["n_banned"], r["crawl_delay_ms"],
                             r["proxy_ip"])
           for r in assign_wave_proxies(wave, proxies, bans).collect()}
    # dead proxy 201's ban does not count: 2 alive bans -> delay 1000
    assert out[167772161][0] == 2
    assert out[167772161][1] == max(250, 2 * DELAYPERBAN)
    # unbanned ip keeps its delay and gets its rotation slot
    assert out[167772160] == (0, 250, 200)
    # banned ip's winner avoids banned/dead proxies
    assert out[167772161][2] == 203
    # AUTOCRAWLDELAY is the no-proxy twitchy floor (Msg13.cpp:2038),
    # pinned here as the module constant the crawl backoff uses
    assert AUTOCRAWLDELAY == 5000
