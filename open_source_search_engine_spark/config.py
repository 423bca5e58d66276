"""Scheduling constants, cloned from the reference (cites per value)."""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_SPIDERS_GLOBAL = 300          # SpiderLoop.h:30 MAX_SPIDERS
MAX_WINNER_NODES = 2000           # Spider.h:52 (2000/400/1 ladder; batch scans
                                  # everything, so the full-scan K applies —
                                  # SpiderColl.cpp:3167-3182)
CRAWL_DELAY_CAP_MS = 60_000       # SpiderColl.cpp:4125
ROBOTS_TTL_S = 86_400             # Msg13.cpp:477-484
DEFAULT_SAME_IP_WAIT_MS = 5_000   # SpiderLoop.cpp:948 (unconfigured default)
DEFAULT_IP_MAX_SPIDERS = 1        # SpiderLoop.cpp:949
OVERFLOW_REQUESTS_PER_IP = 10_000_000  # SpiderColl.cpp:3325
MAX_HOP_COUNT = 65535             # XmlDoc.cpp:15371-15385 clamp
USER_AGENT = "GigablastOpenSource"
HORIZON_MS = 86_400_000   # empty-wave clock-jump horizon (1 day): beyond it
                          # only respider-frequency waits remain -> crawl done
FETCH_DURATION_MS = 200           # deterministic simulated fetch time (no
                                  # real network; politeness is asserted on
                                  # the fetch_at schedule, not wall clock)
AUTO_BACKOFF_DELAY_MS = 5_000     # Msg13.cpp:1995 AUTOCRAWLDELAY: floor put
                                  # under an IP's crawl-delay once it looks
                                  # throttled/banning ("twitchy")
BANNED_HTTP_STATUSES = (403, 503, 999)  # Msg13.cpp:990-1008 ipWasBanned —
                                  # reply statuses that mark the IP twitchy
ERR_DOC_DUP = 32825               # Errno.h EDOCDUP (enum position counted
                                  # from the 32778/32790/32810 anchors)

_SITE_RANK_STEPS = (0, 1, 2, 3, 4, 5, 9, 19, 39, 79, 199, 499, 1999,
                    4999, 9999)   # Linkdb.cpp:5163-5181 getSiteRank ladder


def site_rank_of(sni: int) -> int:
    """siteRank from siteNumInlinks (Linkdb.cpp:5163 getSiteRank)."""
    for rank, cap in enumerate(_SITE_RANK_STEPS):
        if sni <= cap:
            return rank
    return 15

# change-rate model (Spider.h:772-910 m_percentChangedPerDay): volatile
# pages advance their content hash with a version clock so refetches
# observe change; the rate is 100/days between differing fetches, cap 100
VOLATILE_MOD = 3                  # uh48 % 3 == 0 -> volatile page
VERSION_PERIOD_S = 60
VERSION_MIX = 2654435761          # Knuth multiplicative mix


@dataclass(frozen=True)
class UrlFilterRule:
    """One url-filter row (Collectiondb.h:440-460 parallel arrays)."""
    expression: str
    priority: int
    spider_freq_days: float = 30.0
    max_spiders_per_rule: int = 99
    spider_ip_wait_ms: int = 1000     # privacore default sameIpWait
    spider_ip_max_spiders: int = 7    # privacore default
    force_delete: bool = False
    harvest_links: bool = True


def default_url_filters() -> list[UrlFilterRule]:
    """Privacore-profile-shaped ladder (Collectiondb.cpp:1639-1840):
    error handling first, then add-url, root pages, shallow pages, default.
    First match wins (Spider.cpp:2202-2269)."""
    return [
        # tmp errors retry fast (freq in days; 2e-5 d = 1.7 s) then give up
        UrlFilterRule("errorcount>=3 && hastmperror", 3, 1.0, 1, 1000, 1,
                      force_delete=True),
        UrlFilterRule("errorcount>=1 && hastmperror", 45, 2e-5, 1, 1000, 1),
        UrlFilterRule("errorcount>=1", 2, 5.0, 1, 1000, 1, force_delete=True),
        # roots respider fast (freq 5e-5 d = 4.3 s) — exercises the
        # spiderFreq clock (SpiderColl.cpp:4151-4175) within the fixture
        # horizon; everything else respiders beyond it
        UrlFilterRule("hasreply && isroot", 44, 5e-5, 9, 1000, 7),
        UrlFilterRule("isinjecting", 80, 7.0, 99, 1000, 7),
        UrlFilterRule("isaddurl", 85, 7.0, 99, 1000, 7),
        UrlFilterRule("hopcount==0 && iswww", 48, 7.0, 9, 1000, 7),
        UrlFilterRule("hopcount==0", 47, 7.0, 9, 1000, 7),
        UrlFilterRule("hopcount==1", 40, 20.0, 9, 1000, 7),
        # popular sites (>=3 distinct linking domains — the sniTable
        # analogue, SpiderColl.cpp:580-610) jump the hop ladder
        UrlFilterRule("sitenuminlinks>=3 && hopcount>=2", 35, 40.0, 9, 1000, 7),
        UrlFilterRule("hopcount==2", 30, 40.0, 9, 1000, 7),
        UrlFilterRule("hopcount>=3 && hopcount<=5", 20, 60.0, 9, 1000, 7),
        UrlFilterRule("default", 10, 60.0, 9, 1000, 7),
    ]


# EDNSNOTFOUND et al — the "tmp error" retry set (Spider.cpp:2333-2344).
# Synthetic fetches emit 0 (ok), 404 (permanent), or one of these.
TMP_ERROR_CODES = frozenset({32769, 32770, 32771, 32772})  # ETCPTIMEDOUT-ish ids


@dataclass
class CrawlConfig:
    wave_start_ms: int = 1_700_000_000_000
    max_rounds: int = 50
    max_spiders_global: int = MAX_SPIDERS_GLOBAL
    max_winner_nodes: int = MAX_WINNER_NODES
    crawl_delay_cap_ms: int = CRAWL_DELAY_CAP_MS
    user_agent: str = USER_AGENT
    fetch_duration_ms: int = FETCH_DURATION_MS
    # micro-batch trigger cadence: round R+1's clock starts no earlier
    # than round R's start + this (0 = next round starts when the prior
    # round's fetches end) — the batch analogue of the reference's spider
    # loop re-entering on a timer; lets long-TTL behaviors (robots 24 h
    # refresh, respider frequencies) be exercised in few rounds
    round_interval_ms: int = 0
    # F14 budget sharding (scale.apply_wave_budgets): 1 = single-queue
    # reference semantics (fixture parity); production sets the scheduling
    # shard count so per-rule/global budget windows never sort one
    # unbounded partition (host-local doledb, Hostdb.cpp:1761-1765)
    n_wave_shards: int = 1
    # F7/S3 merge cadence: physically compact the request/reply log every
    # N completed rounds (the reference merges Rdb files on a size trigger,
    # RdbMerge.cpp; a round count is the batch analogue).  0 = only when
    # the caller asks.  Compaction is semantics-preserving, so any cadence
    # yields byte-identical crawl order.
    compact_every: int = 0
    # F16 twitchy-IP auto-backoff (Msg13.cpp:2030-2038): when on, fetches
    # from an IP whose earlier replies looked throttled/banning (http
    # status in BANNED_HTTP_STATUSES, Msg13.cpp ipWasBanned) are spaced at
    # least AUTOCRAWLDELAY apart.  Reference default is OFF
    # (Parms.cpp:8543 m_def="0").
    auto_backoff: bool = False
    # index-time exact-content dedup (XmlDoc::getIsDup, XmlDoc.cpp:5042-
    # 5136): a fetched non-root page whose exact content identity is
    # already indexed under another docid of site rank >= ours gets
    # indexCode EDOCDUP — not indexed, links not harvested.  Reference
    # default OFF (Parms.cpp:8650 m_def="0").  The committed index a
    # round checks against is the PRIOR rounds' (batch commit unit).
    deduping_enabled: bool = False
    url_filters: list[UrlFilterRule] = field(default_factory=default_url_filters)
