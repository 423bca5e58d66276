"""SpiderProxy rotation + proxy-ban politeness (SpiderProxy.cpp, Msg13.cpp).

The reference's one politeness input this repo previously had no
analogue for: when a target IP bans proxies, the spider (a) widens the
proxy pool it rotates through in DOUBLING tiers and (b) scales the
crawl-delay with the ban count.  The semantics, from the reference:

- **Backoff delay** (Msg13.cpp:2046-2056): with ``b`` proxies banned by
  the url's IP, ``crawlDelayMS = max(crawlDelayMS, b * DELAYPERBAN)``
  capped at ``MAX_PROXYCRAWLDELAYMS``; DELAYPERBAN=500
  (Msg13.cpp:1991), cap=60000 (Msg13.h:16).  Twitchy IPs without
  proxies floor at AUTOCRAWLDELAY=5000 (Msg13.cpp:1995,2031-2043 — the
  twitchy backoff itself is modeled in pipeline/crawl.py).
- **Pool threshold** (SpiderProxy.cpp:617-652): with ``b`` banned, only
  the first ``threshold(b)`` alive/unbanned proxies in rotation order
  are candidates: 0 banned -> 1, then doubling tiers — at b = 2^k - 1
  the pool is 2^k; inside a tier the pool shrinks as
  ``(2^(k+1) - 1) - b`` (each fresh ban narrows back toward the next
  doubling), capped at 1024.
- **Rotation + winner** (SpiderProxy.cpp:664-720): scan the proxy table
  once starting at slot ``urlIp % numSlots`` (so different IPs start on
  different proxies), skipping dead and banned-for-this-ip entries and
  anything past the threshold count; the winner is the candidate with
  the lowest in-flight count for this IP, ties broken by strictly
  oldest last-use-for-this-IP (first-scanned wins equal ties).  If
  every proxy is dead, rescan with the dead/banned/threshold checks off
  (SpiderProxy.cpp:608-612 ``redo``).

Spark shape: the proxy table and the ban table are query-side dims
(hundreds of proxies, one row per (url_ip, proxy_ip) ban) — they
broadcast; assignment runs per WAVE (bounded at global_cap rows by the
budget stage), one Arrow-batched kernel call per wave, never against
the full frontier.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DELAYPERBAN = 500             # Msg13.cpp:1991
MAX_PROXYCRAWLDELAYMS = 60000  # Msg13.h:16
AUTOCRAWLDELAY = 5000         # Msg13.cpp:1995
MAX_THRESHOLD = 1024          # SpiderProxy.cpp:652


def proxy_threshold(n_banned: int) -> int:
    """The doubling-tier candidate-pool size (SpiderProxy.cpp:617-652).

    Closed form of the reference's CASE ladder: with k = floor(log2(b+1)),
    b == 2^k - 1 opens a pool of 2^k; otherwise the pool is
    (2^(k+1) - 1) - b; floor 1, cap 1024."""
    b = int(n_banned)
    if b <= 0:
        return 1
    if b >= 1023:
        return MAX_THRESHOLD
    k = (b + 1).bit_length() - 1
    if b == (1 << k) - 1:
        t = 1 << k
    else:
        t = ((1 << (k + 1)) - 1) - b
    return max(1, t)


def proxy_threshold_col(n_banned: Column) -> Column:
    """proxy_threshold as a Catalyst expression (bit-identical)."""
    b = n_banned.cast("long")
    k = F.floor(F.log2(b + 1)).cast("long")
    # 2^k via pow (k <= 10 here, exact in double); shiftleft needs a
    # literal bit count in this API
    pow_k = F.pow(F.lit(2.0), k.cast("double")).cast("long")
    t = F.when(b == pow_k - 1, pow_k).otherwise(2 * pow_k - 1 - b)
    return (F.when(b <= 0, F.lit(1).cast("long"))
            .when(b >= 1023, F.lit(MAX_THRESHOLD).cast("long"))
            .otherwise(F.greatest(F.lit(1).cast("long"), t)))


def backoff_crawl_delay_col(crawl_delay_ms: Column,
                            n_banned: Column) -> Column:
    """Msg13.cpp:2046-2056: scale the crawl-delay by the ban count."""
    scaled = F.least(n_banned.cast("long") * DELAYPERBAN,
                     F.lit(MAX_PROXYCRAWLDELAYMS).cast("long"))
    return F.greatest(crawl_delay_ms.cast("long"), scaled)


@dataclass
class ProxyEntry:
    """One spider proxy's rotation state (SpiderProxy.h:23-58)."""
    ip: int
    port: int = 80
    dead: bool = False                 # m_lastDownloadError
    count_for_ip: dict = field(default_factory=dict)   # in-flight per IP
    last_used_for_ip: dict = field(default_factory=dict)


def choose_proxy(url_ip: int, proxies: list[ProxyEntry],
                 banned: set[tuple[int, int]]) -> ProxyEntry:
    """The winner scan (SpiderProxy.cpp:664-720), slot-order exact for a
    dense table: start at ``url_ip % len(proxies)``, wrap once; skip
    dead / banned / past-threshold; min in-flight count for this IP,
    ties to the strictly oldest last-use (first-scanned keeps equal
    ties).  All-dead falls back to the unfiltered rescan."""
    n = len(proxies)
    if n == 0:
        raise ValueError("no proxies configured")
    n_banned = sum(1 for sp in proxies
                   if not sp.dead and (url_ip, sp.ip) in banned)
    thresh = proxy_threshold(n_banned)

    for skip_dead in (True, False):
        start = int(url_ip) % n
        winner, min_count, oldest, count = None, None, None, 0
        for j in range(n):
            sp = proxies[(start + j) % n]
            if skip_dead and sp.dead:
                continue
            if skip_dead and (url_ip, sp.ip) in banned:
                continue
            if skip_dead and count >= thresh:
                continue
            count += 1
            c = sp.count_for_ip.get(url_ip, 0)
            lu = sp.last_used_for_ip.get(url_ip, 0)
            if min_count is not None and c > min_count:
                continue
            if min_count is not None and c == min_count and lu >= oldest:
                continue
            winner, min_count, oldest = sp, c, lu
        if winner is not None:
            return winner
    raise AssertionError("unreachable: second pass filters nothing")


def num_banned_proxies(bans: DataFrame, alive_proxy_ips: list[int]
                       ) -> DataFrame:
    """(url_ip, n_banned): how many ALIVE proxies each target IP has
    banned — the input to both the backoff delay and the pool
    threshold.  ``bans`` is (url_ip, proxy_ip), one row per ban
    (SpiderProxy.cpp s_proxyBannedTable)."""
    return (bans.filter(F.col("proxy_ip").isin([int(p) for p in
                                                alive_proxy_ips]))
            .groupBy("url_ip")
            .agg(F.count_distinct("proxy_ip").alias("n_banned")))


def assign_wave_proxies(wave: DataFrame, proxies: list[ProxyEntry],
                        bans: DataFrame,
                        ip_col: str = "first_ip") -> DataFrame:
    """Per-wave proxy assignment + ban-scaled crawl-delay: joins the
    (small, broadcast) ban counts onto the wave, computes the backoff
    delay in Catalyst, and picks each row's proxy with the rotation
    kernel via an Arrow-batched UDF over the broadcast proxy list.

    The wave is bounded (global_cap) so the per-row kernel is bounded
    work; the full frontier never sees this operator."""
    alive = [sp.ip for sp in proxies if not sp.dead]
    counts = num_banned_proxies(bans, alive)
    out = (wave.join(F.broadcast(counts.withColumnRenamed("url_ip",
                                                          ip_col)),
                     ip_col, "left")
           .fillna({"n_banned": 0}))
    if "crawl_delay_ms" in wave.columns:
        out = out.withColumn(
            "crawl_delay_ms",
            backoff_crawl_delay_col(F.col("crawl_delay_ms"),
                                    F.col("n_banned")))
    ban_pairs = {(int(r["url_ip"]), int(r["proxy_ip"]))
                 for r in bans.collect()}   # small dim by construction

    @F.pandas_udf("proxy_ip long, proxy_port int")
    def _pick(ips: pd.Series) -> pd.DataFrame:
        rows = [(lambda sp: (sp.ip, sp.port))(
                    choose_proxy(int(ip), proxies, ban_pairs))
                for ip in ips]
        return pd.DataFrame(rows, columns=["proxy_ip", "proxy_port"])

    picked = out.withColumn("_proxy", _pick(F.col(ip_col)))
    return (picked
            .withColumn("proxy_ip", F.col("_proxy.proxy_ip"))
            .withColumn("proxy_port", F.col("_proxy.proxy_port"))
            .drop("_proxy"))


# NumPy twin of the ladder for test cross-checks / batch scoring
def proxy_threshold_batch(n_banned) -> "np.ndarray":
    b = np.asarray(n_banned, dtype=np.int64)
    k = np.floor(np.log2(np.maximum(b + 1, 1))).astype(np.int64)
    pow_k = np.left_shift(np.int64(1), k)
    t = np.where(b == pow_k - 1, pow_k, 2 * pow_k - 1 - b)
    t = np.maximum(t, 1)
    t = np.where(b <= 0, 1, t)
    return np.where(b >= 1023, MAX_THRESHOLD, t)
