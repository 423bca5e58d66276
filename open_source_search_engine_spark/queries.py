"""Driver-contract query catalog: one entry per implemented operator.

Each key maps to a Spark callable ``(spark, sf_dir) -> DataFrame`` and (where
ANSI-SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables.  The crawl-frontier operators (F-numbers from SURVEY.md §2.1) are
exercised here over a *derived frontier*: a deterministic, engine-portable
projection of the ``documents`` table into (uh, first_ip, url, hop_count,
priority, ...) columns — the same shapes the real pipeline computes from
crawled URLs, but derivable identically in Spark SQL and DuckDB so the
driver's value-hash comparison is exact.  The true tabulation-hash/normalize/
robots kernels are NOT SQL-expressible; they appear as rows-only entries and
are pinned exactly by the pytest reference-vector suites instead
(tests/test_ghash.py, test_urlnorm.py, test_robots.py, test_crawl_parity.py).

Numeric discipline for cross-engine hashing: outputs are BIGINT or
round(x, 4) doubles; orderings always carry a unique tiebreak column.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _plan_lazy() -> bool:
    """True when the caller wants FULLY LAZY catalog plans.

    The dsir/semdedup kernels localCheckpoint their result by default
    (materialize=True), which truncates lineage to a ``Scan
    ExistingRDD`` — correct for execution, but it would BLIND the
    physical-plan hazard audit (scripts/plan_audit.py /
    tests/test_plan_audit.py) to everything upstream of the
    checkpoint.  The audit sets OSSE_PLAN_LAZY=1 so those catalog
    entries hand back the un-checkpointed plan; execution paths (driver
    contract, bench) leave it unset and keep the cache-discipline
    default."""
    return os.environ.get("OSSE_PLAN_LAZY") == "1"


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# shared derived-frontier CTE — identical text runs in Spark SQL and DuckDB.
# host_id skews ~1/3 of urls onto host 0 (the mega-host path, F4/F27).
# ---------------------------------------------------------------------------

FRONTIER_CTE = """
WITH frontier AS (
  SELECT
    doc_id                                   AS uh,
    CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE doc_id % 50 END AS BIGINT) AS host_id,
    CAST(167772160 + (CASE WHEN doc_id % 3 = 0 THEN 0 ELSE doc_id % 50 END) AS BIGINT) AS first_ip,
    'http://h' || CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE doc_id % 50 END AS STRING)
        || '.example/p' || CAST(doc_id AS STRING) || '.html' AS url,
    CAST(doc_id % 7 AS BIGINT)               AS hop_count,
    CAST(100 - (doc_id % 97) AS BIGINT)      AS priority,
    CAST(1700000000 + (doc_id % 1000) AS BIGINT) AS added_time,
    CAST(n_chars AS BIGINT)                  AS n_chars
  FROM documents
)
"""

# replies derived from events: user_id stands in for uh, ts for fetch time
REPLIES_CTE = """
, replies AS (
  SELECT
    CAST(event_id % 200 AS BIGINT)           AS uh,
    CAST(event_id AS BIGINT)                 AS reply_id,
    CAST(1700000000 + (event_id % 5000) AS BIGINT) AS spidered_time,
    CASE WHEN event_type = 'error' THEN 32769 ELSE 0 END AS err_code,
    CAST(event_id % 4 AS BIGINT)             AS err_count
  FROM events
)
"""


def _sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)
    return run


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, fn: Callable, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _shared(name: str, sql: str) -> None:
    """Same SQL text runs on both engines (ANSI-portable subset)."""
    _register(name, _sql_query(sql), sql)


# ---------------------------------------------------------------------------
# F7 — spiderdb merge-time dedup: per uh keep min (hop, added_time)
# (Spider.cpp:3883-3922 keep-rule; duplicate requests synthesized by % 180)
# ---------------------------------------------------------------------------
# Spark side runs the PRODUCTION merge keep-rule (pipeline.crawl.
# dedup_requests — the exact window the crawl runner dedups with, r5)
# over the derived frontier mapped onto the production column names
# (parent_uh48 := uh makes the production (hop, disc, parent, round)
# tie-break provably equal to the oracle's (hop, added_time, uh));
# DuckDB pins it with the plain ROW_NUMBER formulation.

def _f7_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.crawl import dedup_requests
    register_views(spark, sf_dir)
    fr = spark.sql(FRONTIER_CTE + """
SELECT uh, url, hop_count, added_time FROM frontier""")
    req = fr.select(
        (F.col("uh") % 180).alias("uh48"), "uh", "url", "hop_count",
        F.col("added_time").alias("discovery_time"),
        F.col("uh").alias("parent_uh48"),
        F.lit(0).alias("round"))
    return (dedup_requests(req)
            .select(F.col("uh48").alias("dup_key"), "uh", "url",
                    "hop_count",
                    F.col("discovery_time").alias("added_time"))
            .orderBy("dup_key"))


_register("f7_request_dedup", _f7_prod, FRONTIER_CTE + """
SELECT dup_key, uh, url, hop_count, added_time
FROM (
  SELECT uh % 180 AS dup_key, uh, url, hop_count, added_time,
         ROW_NUMBER() OVER (PARTITION BY uh % 180
                            ORDER BY hop_count, added_time, uh) AS rn
  FROM frontier
) t WHERE rn = 1
ORDER BY dup_key
""")

# ---------------------------------------------------------------------------
# F8 — request ⨝ latest-reply as-of join (Spider.cpp:664-667: newest reply
# per uh survives; SpiderColl.cpp:2535-2685 cursor → batch max_by)
# ---------------------------------------------------------------------------
# Spark side runs the PRODUCTION newest-reply window (pipeline.crawl.
# latest_reply — exactly what the crawl runner's F8 join uses, r5) with
# (download_end_ms, round) := (spidered_time, reply_id); DuckDB pins it
# with the plain ROW_NUMBER + LEFT JOIN formulation.

def _f8_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.crawl import latest_reply
    register_views(spark, sf_dir)
    fr = spark.sql(FRONTIER_CTE + """
SELECT uh, url FROM frontier WHERE uh < 200""")
    rep = spark.sql(FRONTIER_CTE + REPLIES_CTE + """
SELECT uh, reply_id, spidered_time, err_code, err_count FROM replies""")
    lr = latest_reply(rep.select(
        F.col("uh").alias("uh48"),
        F.col("spidered_time").alias("download_end_ms"),
        F.col("reply_id").alias("round"),
        "spidered_time", "err_code", "err_count"))
    return (fr.join(lr.select(F.col("uh48").alias("uh"),
                              F.col("spidered_time")
                              .alias("last_spider_time"),
                              "err_code", "err_count"),
                    "uh", "left")
            .select("uh", "url", "last_spider_time", "err_code",
                    "err_count")
            .orderBy("uh"))


_register("f8_latest_reply_join", _f8_prod, FRONTIER_CTE + REPLIES_CTE + """
SELECT f.uh, f.url, r.spidered_time AS last_spider_time,
       r.err_code, r.err_count
FROM frontier f
LEFT JOIN (
  SELECT uh, spidered_time, err_code, err_count
  FROM (
    SELECT uh, spidered_time, err_code, err_count,
           ROW_NUMBER() OVER (PARTITION BY uh
                              ORDER BY spidered_time DESC, reply_id DESC) AS rn
    FROM replies
  ) x WHERE rn = 1
) r ON f.uh = r.uh
WHERE f.uh < 200
ORDER BY f.uh
""")

# ---------------------------------------------------------------------------
# F10 — next-eligible-time: greatest() of the scheduling clocks
# (SpiderColl.cpp:4083-4180).  Spark side runs the PRODUCTION expression
# (pipeline.crawl.eligible_ms_expr — the exact column _candidates
# schedules with) over the derived frontier mapped onto the production
# column names; DuckDB pins it with the hand-expanded GREATEST.
# ---------------------------------------------------------------------------

def _f10_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.crawl import eligible_ms_expr
    register_views(spark, sf_dir)
    df = spark.sql(FRONTIER_CTE + REPLIES_CTE + """
SELECT f.uh, f.added_time, f.first_ip, r.spidered_time
FROM frontier f
LEFT JOIN (
  SELECT uh, MAX(spidered_time) AS spidered_time FROM replies GROUP BY uh
) r ON f.uh = r.uh""")
    cand = (df
            .withColumn("ip_last_end", F.lit(1700000500000).cast("long"))
            .withColumn("ip_wait_ms",
                        (F.col("first_ip") % 5) * 1000)
            .withColumn("cd_ms", F.lit(None).cast("int"))
            .withColumn("has_reply", F.col("spidered_time").isNotNull())
            .withColumn("last_spider_time_s",
                        F.coalesce("spidered_time", F.lit(0)))
            .withColumn("spider_freq_ms", F.lit(86400000).cast("long")))
    return (cand.withColumn("eligible_ms", eligible_ms_expr(60_000))
            .select("uh", "eligible_ms").orderBy("uh"))


_register("f10_eligible_time", _f10_prod, FRONTIER_CTE + REPLIES_CTE + """
SELECT f.uh,
       GREATEST(
         f.added_time * 1000,
         1700000500000 + (f.first_ip % 5) * 1000,
         COALESCE(r.spidered_time * 1000 + 86400000, 0)
       ) AS eligible_ms
FROM frontier f
LEFT JOIN (
  SELECT uh, MAX(spidered_time) AS spidered_time FROM replies GROUP BY uh
) r ON f.uh = r.uh
ORDER BY f.uh
""")

# ---------------------------------------------------------------------------
# F11 — per-IP winner selection: top-K by (priority desc, hop asc, uh asc)
# (SpiderColl.cpp:2513-3401, key order Spider.cpp:991-1013; K=7 privacore).
# Spark side runs the PRODUCTION salted two-phase top-K (pipeline/scale.py,
# the same function the crawl runner uses); DuckDB pins it with the plain
# single-window formulation they are provably equivalent to.
# ---------------------------------------------------------------------------

def _f11_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.scale import salted_topk_per_key
    register_views(spark, sf_dir)
    fr = spark.sql(FRONTIER_CTE + "SELECT * FROM frontier")
    order = [F.desc("priority"), F.asc("hop_count"), F.asc("uh")]
    sel = salted_topk_per_key(fr, "first_ip", order, k=7,
                              salt_col="uh", rank_name="rn")
    return (sel.select("first_ip", "uh", "url", "priority", "hop_count",
                       F.col("rn").cast("long").alias("rn"))
            .orderBy("first_ip", "rn"))


_register("f11_winner_window", _f11_prod, FRONTIER_CTE + """
SELECT first_ip, uh, url, priority, hop_count, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT first_ip, uh, url, priority, hop_count,
         ROW_NUMBER() OVER (PARTITION BY first_ip
                            ORDER BY priority DESC, hop_count, uh) AS rn
  FROM frontier
) t WHERE rn <= 7
ORDER BY first_ip, rn
""")

# ---------------------------------------------------------------------------
# F12 — waiting tree: per-IP earliest next-eligible time
# (SpiderColl.cpp:4290-4305; batch = one aggregate)
# ---------------------------------------------------------------------------
_shared("f12_waiting_tree", FRONTIER_CTE + """
SELECT first_ip, MIN(added_time * 1000) AS next_eligible_ms,
       CAST(COUNT(*) AS BIGINT) AS pending
FROM frontier GROUP BY first_ip ORDER BY first_ip
""")

# ---------------------------------------------------------------------------
# F14 — wave assembly: per-IP cap then global budget of 300, best-first
# (SpiderLoop.cpp:369-818).  Spark side runs the PRODUCTION budget path
# (pipeline/scale.apply_wave_budgets — the function the crawl runner and
# bench call); DuckDB pins the equivalent single-queue formulation.
# ---------------------------------------------------------------------------

def _f14_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.scale import apply_wave_budgets, salted_topk_per_key
    register_views(spark, sf_dir)
    fr = spark.sql(FRONTIER_CTE + "SELECT * FROM frontier")
    order = [F.desc("priority"), F.asc("hop_count"), F.asc("uh")]
    sel = salted_topk_per_key(fr, "first_ip", order, k=7,
                              salt_col="uh", rank_name="ip_rn")
    wave = apply_wave_budgets(sel, order, global_cap=300)
    return (wave.select("uh", "url", "first_ip", "priority", "hop_count",
                        F.col("seq_in_round").cast("long")
                        .alias("seq_in_round"))
            .orderBy("seq_in_round"))


_register("f14_wave_caps", _f14_prod, FRONTIER_CTE + """
SELECT uh, url, first_ip, priority, hop_count,
       CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, hop_count, uh) - 1
            AS BIGINT) AS seq_in_round
FROM (
  SELECT uh, url, first_ip, priority, hop_count,
         ROW_NUMBER() OVER (PARTITION BY first_ip
                            ORDER BY priority DESC, hop_count, uh) AS ip_rn
  FROM frontier
) t WHERE ip_rn <= 7
ORDER BY priority DESC, hop_count, uh
LIMIT 300
""")

# ---------------------------------------------------------------------------
# F16 — politeness spacing: fetch_at = wave_start + rank * sameIpWait
# (Msg13.cpp:2069-2107 hammer queue; 1000 ms privacore wait).  Spark side
# runs the PRODUCTION wave assembly (pipeline.crawl
# .assemble_wave_from_candidates — the same salted top-K + budgets +
# hammer-queue spacing the crawl runner executes), with caps sized so no
# row is budget-dropped and eligible_ms constant so the launch order
# reduces to the oracle's (priority DESC, hop, uh) rank; DuckDB pins the
# schedule with the plain window formulation.
# ---------------------------------------------------------------------------

def _f16_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .config import CrawlConfig, UrlFilterRule
    from .pipeline.crawl import assemble_wave_from_candidates
    register_views(spark, sf_dir)
    fr = spark.sql(FRONTIER_CTE + """
SELECT uh, first_ip, priority, hop_count FROM frontier
WHERE first_ip % 10 = 0""")
    cand = (fr.select(F.col("uh").alias("uh48"), "first_ip",
                      "priority", "hop_count")
            .withColumn("eligible_ms", F.lit(0).cast("long"))
            .withColumn("ip_max", F.lit(1 << 30))
            .withColumn("ufn", F.lit(0))
            .withColumn("max_per_rule", F.lit(1 << 30))
            .withColumn("ip_wait_ms", F.lit(1000).cast("long"))
            .withColumn("robots_delay_ms", F.lit(-1))
            .withColumn("ip_last_end", F.lit(0).cast("long"))
            .withColumn("ip_twitchy", F.lit(False)))
    cfg = CrawlConfig(
        max_spiders_global=1 << 30, max_winner_nodes=1 << 30,
        url_filters=[UrlFilterRule("default", 10,
                                   spider_ip_max_spiders=1 << 30)])
    wave = assemble_wave_from_candidates(cand, cfg, 1700000000000, rnd=0)
    return (wave.select(F.col("uh48").alias("uh"), "first_ip",
                        F.col("fetch_at_ms").cast("long")
                        .alias("fetch_at_ms"))
            .orderBy("uh"))


_register("f16_fetch_schedule", _f16_prod, FRONTIER_CTE + """
SELECT uh, first_ip,
       CAST(1700000000000 +
            (ROW_NUMBER() OVER (PARTITION BY first_ip
                                ORDER BY priority DESC, hop_count, uh) - 1)
            * 1000 AS BIGINT) AS fetch_at_ms
FROM frontier
WHERE first_ip % 10 = 0
ORDER BY uh
""")

# ---------------------------------------------------------------------------
# F5 — URL-seen dedup (SpiderColl.cpp:845-904).  Spark side runs the
# PRODUCTION incremental path (pipeline.seen.BloomState +
# filter_new_requests_incremental — the distributed Bloom probe with the
# exact hop-aware fallback join, exactly what the crawl runner calls
# with use_bloom_seen).  The seen entries are made STRICTLY better on
# the (hop_count, discovery_time) keep-rule prefix (discovery_time - 1)
# so the production drop rule provably reduces to the oracle's plain
# anti-join; DuckDB pins it with NOT EXISTS.
# ---------------------------------------------------------------------------

def _f5_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline.seen import (BloomState,
                                filter_new_requests_incremental)
    register_views(spark, sf_dir)
    fr = spark.sql(FRONTIER_CTE + """
SELECT uh, first_ip, url, hop_count, added_time FROM frontier""")
    new_req = fr.select(F.col("uh").alias("uh48"), "first_ip", "url",
                        "hop_count",
                        F.col("added_time").alias("discovery_time"))
    seen_keys = new_req.filter(F.col("uh48") % 5 == 0)
    seen = seen_keys.select(
        "uh48", "hop_count",
        (F.col("discovery_time") - 1).alias("discovery_time"))
    state = BloomState()
    state.add_df(seen_keys.select("uh48", "first_ip"))
    out = filter_new_requests_incremental(new_req, seen, state)
    return (out.select(F.col("uh48").alias("uh"), "url")
            .orderBy("uh"))


_register("f5_url_seen_antijoin", _f5_prod, FRONTIER_CTE + """
SELECT f.uh, f.url FROM frontier f
WHERE NOT EXISTS (
  SELECT 1 FROM frontier s WHERE s.uh % 5 = 0 AND s.uh = f.uh
)
ORDER BY f.uh
""")

# ---------------------------------------------------------------------------
# F27 — per-IP overflow guard (SpiderColl.cpp:3319-3397; threshold scaled
# to fixture size: >30 pending requests flags the IP)
# ---------------------------------------------------------------------------
_shared("f27_overflow_guard", FRONTIER_CTE + """
SELECT first_ip, CAST(COUNT(*) AS BIGINT) AS pending,
       COUNT(*) > 30 AS overflow
FROM frontier GROUP BY first_ip ORDER BY first_ip
""")

# ---------------------------------------------------------------------------
# F28 — site quota counting: distinct-uh voting per site
# (SpiderColl.cpp:2754-2798)
# ---------------------------------------------------------------------------
_shared("f28_quota_count", FRONTIER_CTE + """
SELECT host_id, CAST(COUNT(DISTINCT uh) AS BIGINT) AS site_pages
FROM frontier GROUP BY host_id ORDER BY host_id
""")

# ---------------------------------------------------------------------------
# F29 — IP C-block inlink counting: distinct /24 blocks per uh, capped 20
# (SpiderColl.cpp:2701-2742)
# ---------------------------------------------------------------------------
_shared("f29_cblock_inlinks", FRONTIER_CTE + """
SELECT uh % 40 AS link_target,
       CAST(LEAST(COUNT(DISTINCT first_ip - first_ip % 256), 20) AS BIGINT)
         AS page_num_inlinks
FROM frontier GROUP BY uh % 40 ORDER BY link_target
""")

# ---------------------------------------------------------------------------
# F30 — proxy-ban politeness: the doubling-tier proxy-pool threshold
# (SpiderProxy.cpp:617-652) and the ban-scaled crawl-delay
# (Msg13.cpp:2046-2056, DELAYPERBAN=500 cap 60000).  Spark runs the
# closed-form Catalyst kernel (functions/proxy.py); the oracle pins it
# with the reference's LITERAL CASE ladder, transcribed tier by tier —
# an independent cross-check of the closed form.
# ---------------------------------------------------------------------------


def _f30_proxy_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.proxy import (backoff_crawl_delay_col,
                                  proxy_threshold_col)
    register_views(spark, sf_dir)
    f = spark.sql(FRONTIER_CTE + "SELECT uh, first_ip FROM frontier")
    # deterministic ban counts spanning every tier incl. the 1024 cap
    b = (F.col("uh") * 37 % 1100).cast("long")
    return (f.withColumn("n_banned", b)
            .withColumn("pool_threshold", proxy_threshold_col(b))
            .withColumn("crawl_delay_ms", backoff_crawl_delay_col(
                F.lit(250).cast("long") + F.col("uh") % 7 * 100, b))
            .select(F.col("uh").cast("long").alias("uh"),
                    F.col("n_banned"),
                    F.col("pool_threshold").cast("long"),
                    F.col("crawl_delay_ms").cast("long"))
            .orderBy("uh"))


_register("f30_proxy_backoff", _f30_proxy_backoff, FRONTIER_CTE + """
, b AS (
  SELECT uh, CAST(uh * 37 % 1100 AS BIGINT) AS n_banned,
         CAST(250 + uh % 7 * 100 AS BIGINT) AS base_delay
  FROM frontier
)
SELECT CAST(uh AS BIGINT) AS uh, n_banned,
  CAST(CASE
    WHEN n_banned <= 0 THEN 1
    WHEN n_banned = 1 THEN 2
    WHEN n_banned < 3 THEN GREATEST(3 - n_banned, 1)
    WHEN n_banned = 3 THEN 4
    WHEN n_banned < 7 THEN GREATEST(7 - n_banned, 1)
    WHEN n_banned = 7 THEN 8
    WHEN n_banned < 15 THEN GREATEST(15 - n_banned, 1)
    WHEN n_banned = 15 THEN 16
    WHEN n_banned < 31 THEN GREATEST(31 - n_banned, 1)
    WHEN n_banned = 31 THEN 32
    WHEN n_banned < 63 THEN GREATEST(63 - n_banned, 1)
    WHEN n_banned = 63 THEN 64
    WHEN n_banned < 127 THEN GREATEST(127 - n_banned, 1)
    WHEN n_banned = 127 THEN 128
    WHEN n_banned < 255 THEN GREATEST(255 - n_banned, 1)
    WHEN n_banned = 255 THEN 256
    WHEN n_banned < 511 THEN GREATEST(511 - n_banned, 1)
    WHEN n_banned = 511 THEN 512
    WHEN n_banned < 1023 THEN GREATEST(1023 - n_banned, 1)
    ELSE 1024 END AS BIGINT) AS pool_threshold,
  CAST(GREATEST(base_delay, LEAST(n_banned * 500, 60000)) AS BIGINT)
    AS crawl_delay_ms
FROM b ORDER BY uh
""")


def _f31_proxy_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proxy rotation winner per wave row (SpiderProxy.cpp:664-720):
    start slot = urlIp % slots, dead/banned/threshold skips, min
    in-flight count then oldest-last-use tie-break — the Arrow-batched
    wave assignment over a deterministic 16-proxy table with planted
    dead entries and bans."""
    from .functions.proxy import ProxyEntry, assign_wave_proxies
    register_views(spark, sf_dir)
    wave = spark.sql(FRONTIER_CTE + """
SELECT uh, first_ip, CAST(250 AS BIGINT) AS crawl_delay_ms
FROM frontier WHERE uh % 5 = 0""")
    proxies = [ProxyEntry(ip=0x0A000001 + i, port=3128 + i,
                          dead=(i % 7 == 3)) for i in range(16)]
    # hosts in this wave are multiples of 5 — give them 0..6 bans each
    # (index 3 is a DEAD proxy, so its ban must not count toward
    # n_banned: num_banned_proxies filters to alive ips)
    bans = spark.createDataFrame(
        [(167772160 + h, 0x0A000001 + p)
         for h in range(0, 50, 5) for p in range(h % 7)],
        "url_ip long, proxy_ip long")
    out = assign_wave_proxies(wave, proxies, bans)
    return (out.select(F.col("uh").cast("long"),
                       F.col("first_ip").cast("long"),
                       F.col("n_banned").cast("long"),
                       F.col("crawl_delay_ms").cast("long"),
                       F.col("proxy_ip").cast("long"),
                       F.col("proxy_port").cast("int"))
            .orderBy("uh"))

# (golden-registered below, once _register_golden exists)

# ---------------------------------------------------------------------------
# F9 — url-filter ladder (first-match-wins, Spider.cpp:2202-2269).  Spark
# side runs the PRODUCTION rule compiler (pipeline/filters.compile_rule_match
# over parsed UrlFilterRule expressions — the same when()-chain the crawl
# runner evaluates); DuckDB pins it with the hand-expanded CASE.
# ---------------------------------------------------------------------------

def _f9_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .config import UrlFilterRule
    from .pipeline.filters import compile_rule_match, rule_arrays
    register_views(spark, sf_dir)
    fr = spark.sql(FRONTIER_CTE + "SELECT uh, url, hop_count FROM frontier")
    rules = [
        UrlFilterRule("hopcount==0 && ^http://h0.", 48),
        UrlFilterRule("hopcount==0", 47),
        UrlFilterRule("hopcount==1", 40),
        UrlFilterRule("hopcount>=2 && hopcount<=4", 30),
        UrlFilterRule("default", 10),
    ]
    return (fr.withColumn("ufn", compile_rule_match(rules, now_s=0))
            .withColumn("priority_out", rule_arrays(rules)["priority"])
            .select("uh", "url", "hop_count", "ufn", "priority_out")
            .orderBy("uh"))


_register("f9_urlfilter_ladder", _f9_prod, FRONTIER_CTE + """
SELECT uh, url, hop_count,
       CASE WHEN hop_count = 0 AND url LIKE 'http://h0.%' THEN 0
            WHEN hop_count = 0 THEN 1
            WHEN hop_count = 1 THEN 2
            WHEN hop_count >= 2 AND hop_count <= 4 THEN 3
            ELSE 4 END AS ufn,
       CASE WHEN hop_count = 0 AND url LIKE 'http://h0.%' THEN 48
            WHEN hop_count = 0 THEN 47
            WHEN hop_count = 1 THEN 40
            WHEN hop_count >= 2 AND hop_count <= 4 THEN 30
            ELSE 10 END AS priority_out
FROM frontier ORDER BY uh
""")

# ---------------------------------------------------------------------------
# Rdb S3/S4 — key-range scan with merge-dedup semantics over the sorted log
# (Msg5.cpp:57-1566; RdbList.cpp:1531 merge): range filter + newest-wins
# ---------------------------------------------------------------------------
_shared("s4_range_scan", FRONTIER_CTE + """
SELECT uh, url, priority FROM frontier
WHERE uh >= 100 AND uh < 260 ORDER BY uh
""")

# ---------------------------------------------------------------------------
# Training-data ops (first-class per the build brief)
# ---------------------------------------------------------------------------

# exact dedup: hash-groupBy, keep lowest doc_id per content hash
_shared("dedup_exact", """
SELECT content_hash, CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
       CAST(COUNT(*) AS BIGINT) AS dup_count
FROM (SELECT doc_id, md5(text) AS content_hash FROM documents) t
GROUP BY content_hash
ORDER BY content_hash
""")

# n-gram (word 3-gram) profile per doc: counts are portable arithmetic
_shared("text_ngram_profile", """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
         AS token_count,
       CAST(GREATEST(length(text) - length(replace(text, ' ', '')) - 1, 0)
            AS BIGINT) AS trigram_count
FROM documents ORDER BY doc_id
""")

# quality scoring: length / punctuation / stopword-ish ratios
_shared("text_quality_score", """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_len,
       CAST(length(text) - length(replace(text, '.', '')) AS BIGINT) AS n_dots,
       CAST(length(text) - length(replace(text, ' the ', '')) AS BIGINT)
         AS stopword_chars,
       ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / CAST(length(text) + 1 AS DOUBLE), 4) AS ink_ratio
FROM documents ORDER BY doc_id
""")

# document fingerprint: rolling polynomial hash over char codes, portable
# via per-position arithmetic on a fixed prefix
_shared("doc_fingerprint", """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST((ascii(substr(text || 'pad', 1, 1)) * 31 * 31
             + ascii(substr(text || 'pad', 2, 1)) * 31
             + ascii(substr(text || 'pad', 3, 1))) % 1000003 AS BIGINT)
         AS fp_prefix,
       CAST(length(text) AS BIGINT) AS n_len
FROM documents ORDER BY doc_id
""")

def _embed_topk_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine/dot top-k (training-data ANN baseline).  Spark:
    zip_with + aggregate, JVM-side; quantized to ints so the DuckDB oracle
    hashes identically."""
    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"))
    dots = (
        emb.crossJoin(F.broadcast(q))
        .withColumn(
            "dot_q",
            F.aggregate(
                F.zip_with(
                    "embedding", "q_emb",
                    lambda a, b: (F.round(a.cast("double") * 1000).cast("long")
                                  * F.round(b.cast("double") * 1000).cast("long"))),
                F.lit(0).cast("long"), lambda acc, x: acc + x))
        .filter(F.col("vec_id") != 0)
        .select(F.col("vec_id").cast("long").alias("vec_id"), "dot_q")
        .orderBy(F.desc("dot_q"), "vec_id")
        .limit(20)
    )
    return dots


_register("embed_topk_bruteforce", _embed_topk_spark, """
SELECT CAST(d.vec_id AS BIGINT) AS vec_id,
       CAST(SUM(CAST(ROUND(CAST(d.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)
           * CAST(ROUND(CAST(q.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS dot_q
FROM embeddings d, embeddings q, range(1, 65) t(i)
WHERE q.vec_id = 0 AND d.vec_id <> 0
GROUP BY d.vec_id
ORDER BY dot_q DESC, vec_id
LIMIT 20
""")

# events windowed aggregation (streaming-compatible tumbling window: the
# same plan runs under readStream + watermark)
_shared("events_tumbling_window", """
SELECT CAST(date_trunc('hour', ts) AS STRING) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
""")

# Q2/Q3 — posting-list intersection + top-k ranking (PosdbTable
# intersectLists10_r re-expressed as inverted-index join; TopTree → LIMIT)
_shared("q2_posting_intersect_topk", """
WITH hits AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(length(text) - length(replace(text, 'data', '')) AS BIGINT)
           AS tf4_a,
         CAST(length(text) - length(replace(text, 'join', '')) AS BIGINT)
           AS tf4_b
  FROM documents
)
SELECT doc_id, tf4_a, tf4_b, tf4_a + tf4_b AS score
FROM hits WHERE tf4_a > 0 AND tf4_b > 0
ORDER BY score DESC, doc_id
LIMIT 10
""")


def _multimodal_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: text treated as an opaque binary payload with
    typed metadata; byte-length extracted via the JVM encode path (the real
    image/audio decode is stubbed per the brief — see training.multimodal)."""
    register_views(spark, sf_dir)
    return (
        spark.table("documents")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.length(F.encode("text", "utf-8")).cast("long")
            .alias("payload_bytes"),
            F.col("lang"))
        .orderBy("doc_id")
    )


_register("multimodal_binary_meta", _multimodal_spark, """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       lang
FROM documents ORDER BY doc_id
""")

# ---------------------------------------------------------------------------
# Golden-fixture-backed entries: real kernels DuckDB cannot express
# (tabulation hash, URL normalizer state machine, robots grammar,
# MinHash/SimHash/LSH, ANN).  Their exact behavior is established by the
# pytest reference-vector suites (tests/test_ghash.py, test_urlnorm.py,
# test_robots.py, test_training_ops.py); those verified outputs are
# materialized once per release as parquet goldens (scripts/make_goldens.py
# → fixtures/golden/sf0.01/) and each oracle below is a DuckDB SELECT
# against its golden — so the driver's cross-engine value-hash gate pins
# the shipped kernels instead of recording `no_oracle`.  The goldens are
# generated at sf0.01, the scale the driver's correctness gate runs at.
# ---------------------------------------------------------------------------

GOLDEN_SF = "sf0.01"
GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "golden")

# the dictionary-synset fixture (Wiktionary.cpp analogue) — both the
# Spark side (search.synsets.load_synsets) and the DuckDB oracles read
# this one parquet
from .search.synsets import SYNSETS_PATH as _SYNSETS_PARQUET  # noqa: E402


def _golden_oracle(name: str, order_sql: str) -> str:
    path = os.path.join(GOLDEN_DIR, GOLDEN_SF, f"{name}.parquet")
    return f"SELECT * FROM '{path}' ORDER BY {order_sql}"

def _derived_raw_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'dirty' URL variants of the derived frontier, cycling
    normalization traps (case, :80, fragments, dot-segments)."""
    register_views(spark, sf_dir)
    return spark.sql(FRONTIER_CTE + """
SELECT uh,
       CASE CAST(uh % 5 AS INT)
         WHEN 0 THEN url
         WHEN 1 THEN upper(url)
         WHEN 2 THEN replace(url, '.example/', '.example:80/')
         WHEN 3 THEN url || '#fragment'
         ELSE replace(url, '.example/', '.example/./')
       END AS raw_url
FROM frontier""")


def _f1_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: Url::set normalization (Url.cpp:794-1300) via the Arrow UDF —
    every trap variant collapses back to the canonical form."""
    from .pipeline.udfs import make_normalize_udf
    raw = _derived_raw_urls(spark, sf_dir)
    n = make_normalize_udf()
    return (raw.withColumn("n", n("raw_url"))
            .select("uh", "raw_url",
                    F.col("n.url_norm").alias("url_norm"),
                    F.col("n.host").alias("host"),
                    F.col("n.domain").alias("domain"))
            .orderBy("uh"))


def _f2_uh48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: canonical UrlHash48 (tabulation hash, hash.cpp:21-52) — the
    real 48-bit id over the derived URL universe."""
    from .pipeline.udfs import uh48_udf
    raw = _derived_raw_urls(spark, sf_dir)
    from .pipeline.udfs import make_normalize_udf
    n = make_normalize_udf()
    return (raw.withColumn("url_norm", n("raw_url").getField("url_norm"))
            .withColumn("uh48", uh48_udf("url_norm"))
            .select("uh", "url_norm", "uh48").orderBy("uh"))


def _f17_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17/F18: robots.txt compile + longest-match rule evaluation
    (Robots.cpp:241-361) over per-host synthetic robots bodies."""
    from .corpus import ROBOTS_SHAPES
    from .pipeline.udfs import make_robots_udfs
    register_views(spark, sf_dir)
    shapes = F.array(*[F.lit(s[1]) for s in ROBOTS_SHAPES])
    fr = spark.sql(FRONTIER_CTE + "SELECT uh, host_id, url FROM frontier")
    allowed_udf, delay_udf = make_robots_udfs("GigablastOpenSource")
    df = (fr.withColumn("robots_txt",
                        F.element_at(shapes,
                                     (F.col("host_id")
                                      % len(ROBOTS_SHAPES) + 1).cast("int")))
          .withColumn("path_cgi",
                      F.regexp_replace("url", r"^http://[^/]+", "")))
    return (df.withColumn("allowed", allowed_udf("robots_txt", "path_cgi"))
            .withColumn("crawl_delay_ms", delay_udf("robots_txt"))
            .select("uh", "path_cgi", "allowed", "crawl_delay_ms")
            .orderBy("uh"))


def _docs_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")


def _dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.dedup import minhash_signatures
    sigs = minhash_signatures(_docs_long(spark, sf_dir))
    return sigs.select(
        "doc_id", F.col("sig")[0].alias("minhash_0"),
        F.aggregate("sig", F.lit(0).cast("long"),
                    lambda a, x: a + x % 1000003).alias("sig_checksum")
    ).orderBy("doc_id")


def _dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.dedup import lsh_candidate_pairs, minhash_signatures
    sigs = minhash_signatures(_docs_long(spark, sf_dir))
    return lsh_candidate_pairs(sigs, threshold=0.3,
                               materialize=not _plan_lazy()) \
        .orderBy("doc_a", "doc_b")


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.dedup import simhash_fingerprints
    return simhash_fingerprints(_docs_long(spark, sf_dir)).orderBy("doc_id")


def _dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_hamming=6 keeps the pigeonhole segments 9-10 bits wide so each
    bucket holds ~1/2^9 of the corpus — candidate count stays O(n·k).  At
    h=16 (round-2 config) the 3-4-bit segments made the bucket join
    near-quadratic (~n²/16 candidates); the kernel docstring mandates
    h<=6 at scale."""
    from .training.dedup import simhash_fingerprints, simhash_near_dups
    fps = simhash_fingerprints(_docs_long(spark, sf_dir))
    return simhash_near_dups(fps, max_hamming=6,
                             materialize=not _plan_lazy()) \
        .orderBy("doc_a", "doc_b")


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.textqual import language_id
    return language_id(_docs_long(spark, sf_dir)).orderBy("doc_id")


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.textqual import token_counts
    return token_counts(_docs_long(spark, sf_dir)).orderBy("doc_id")


def _charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniff + decode (XmlDoc getCharset → iana_charset alias →
    Unicode conversion): deterministic raw page bytes are synthesized from
    the documents table in five encodings/declaration styles (utf-8 plain,
    BOM'd utf-16-le, http-header latin-1 (→cp1252 per HTML5), meta-tag
    windows-1252, http-header shift_jis), then decoded by the production
    kernel.  round_trip proves the detected codec reproduced the original
    text exactly."""
    import pandas as pd
    from pyspark.sql import types as T

    from .pipeline.udfs import charset_decode_map_in_pandas

    raw_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("raw", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("expected", T.StringType()),
    ])

    def _synth(it):
        for batch in it:
            ids, raws, ctypes, exps = [], [], [], []
            for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
                v = int(doc_id) % 5
                if v == 0:          # plain utf-8, no declaration
                    body, ctype = text + " café", None
                    raw = body.encode("utf-8")
                elif v == 1:        # BOM'd utf-16-le
                    body, ctype = text + " café", None
                    raw = b"\xff\xfe" + body.encode("utf-16-le")
                elif v == 2:        # http header declares latin-1
                    body = text + " café"
                    ctype = "text/html; charset=iso-8859-1"
                    raw = body.encode("cp1252", errors="replace")
                    body = raw.decode("cp1252")
                elif v == 3:        # meta tag declares windows-1252
                    body = ('<meta charset="windows-1252">' + text + " café")
                    ctype = "text/html"
                    raw = body.encode("cp1252", errors="replace")
                    body = raw.decode("cp1252")
                else:               # http header declares x-sjis alias
                    body = text + " テスト"
                    ctype = "text/html; charset=x-sjis"
                    raw = body.encode("shift_jis", errors="replace")
                    body = raw.decode("shift_jis")
                ids.append(int(doc_id))
                raws.append(raw)
                ctypes.append(ctype)
                exps.append(body)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "raw": pd.Series(raws, dtype="object"),
                                "content_type": pd.Series(ctypes,
                                                          dtype="object"),
                                "expected": pd.Series(exps, dtype="object")})

    raw_pages = _docs_long(spark, sf_dir).mapInPandas(_synth,
                                                      schema=raw_schema)
    decode_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("expected", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("charset_source", T.StringType()),
    ])
    decoded = raw_pages.mapInPandas(charset_decode_map_in_pandas,
                                    schema=decode_schema)
    return (decoded.select(
                "doc_id", "charset", "charset_source",
                F.length("text").cast("long").alias("n_chars"),
                (F.col("text") == F.col("expected")).alias("round_trip"))
            .orderBy("doc_id"))


def _bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE training (Sennrich 2016): distributed word-freq table ->
    bounded deterministic collect -> merge learning; the learned merge
    table IS the checkable artifact."""
    from .training.bpe import train_bpe
    merges = train_bpe(_docs_long(spark, sf_dir), n_merges=200)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string").orderBy("rank")


def _bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-encode: per-doc pre-token/BPE-piece counts plus the
    leading pieces (broadcast ranks, mapInPandas, no shuffle)."""
    from .training.bpe import apply_bpe, train_bpe
    docs = _docs_long(spark, sf_dir)
    merges = train_bpe(docs, n_merges=200)
    return apply_bpe(docs, merges).orderBy("doc_id")


def _quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.textqual import quality_signals
    register_views(spark, sf_dir)
    return quality_signals(spark.table("documents")).orderBy("doc_id")


def _embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.simsearch import lsh_topk
    register_views(spark, sf_dir)
    return lsh_topk(spark.table("embeddings"), query_vec_id=0, k=10,
                    n_planes=4)


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.multimodal import extract_features, media_from_documents
    register_views(spark, sf_dir)
    media = media_from_documents(spark.table("documents"))
    return (extract_features(media)
            .select("media_id", "kind", "payload_bytes",
                    F.round(F.element_at("feature", 1), 4).alias("feat_0"))
            .orderBy("media_id"))


# (name, fn, golden ORDER BY matching the Spark-side orderBy)
GOLDEN_QUERIES: list[tuple[str, Callable, str]] = [
    ("f1_url_normalize", _f1_normalize, "uh"),
    ("f2_uh48_hash", _f2_uh48, "uh"),
    ("f17_robots_match", _f17_robots, "uh"),
    ("dedup_minhash_sig", _dedup_minhash, "doc_id"),
    ("dedup_minhash_lsh_pairs", _dedup_minhash_pairs, "doc_a, doc_b"),
    ("dedup_simhash_fp", _dedup_simhash, "doc_id"),
    ("dedup_simhash_pairs", _dedup_simhash_pairs, "doc_a, doc_b"),
    ("lang_id_ngram", _lang_id, "doc_id"),
    ("token_count_bpe", _token_counts, "doc_id"),
    ("bpe_train_merges", _bpe_merges, "rank"),
    ("bpe_tokenize", _bpe_tokenize, "doc_id"),
    ("content_charset_decode", _charset_decode, "doc_id"),
    ("text_quality_catalyst", _quality, "doc_id"),
    ("embed_ann_lsh", _embed_ann, "dot_q DESC, vec_id"),
    ("multimodal_features", _multimodal_features, "media_id"),
]

def _register_golden(name: str, fn: Callable, order_sql: str) -> None:
    if not any(g[0] == name for g in GOLDEN_QUERIES):
        GOLDEN_QUERIES.append((name, fn, order_sql))
    _register(name, fn, _golden_oracle(name, order_sql))


for _name, _fn, _order in list(GOLDEN_QUERIES):
    _register(_name, _fn, _golden_oracle(_name, _order))


def _f4_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: spiderdb shard assignment — the real ``hash32h(firstIp,
    0x123456)`` tabulation mix (Hostdb.cpp:1745-1752) bucketing each IP
    onto one of 64 scheduling shards."""
    import pandas as pd
    from pyspark.sql import types as T
    from .functions.ghash import spider_shard

    def _shard_batch(ips):
        return pd.Series(spider_shard(ips.to_numpy(), 64), dtype="int32")

    shard_udf = F.pandas_udf(_shard_batch, T.IntegerType())

    register_views(spark, sf_dir)
    fr = spark.sql(FRONTIER_CTE + "SELECT DISTINCT first_ip FROM frontier")
    return (fr.withColumn("shard", shard_udf("first_ip"))
            .orderBy("first_ip"))


_register_golden("f4_shard_assignment", _f4_shard, "first_ip")
_register_golden("f31_proxy_rotation", _f31_proxy_rotation, "uh")


def _multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real decode → aspect-fit resample → PPM re-encode over every visual
    payload (the reference's ``*topnm | pnmscale -xysize`` thumbnail path,
    Images.cpp:160-178), reporting exact output geometry and byte size."""
    from .training.multimodal import media_from_documents, resize_media
    register_views(spark, sf_dir)
    media = media_from_documents(spark.table("documents"))
    return resize_media(media, 160, 120).orderBy("media_id")


def _multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame sampling from the raw-video container: decode, take up
    to 4 evenly spaced frames, emit real per-frame image features."""
    from .training.multimodal import media_from_documents, sample_frames
    register_views(spark, sf_dir)
    media = media_from_documents(spark.table("documents"))
    return (sample_frames(media, max_frames=4)
            .select("media_id", "frame_idx",
                    F.round(F.element_at("frame_feature", 4), 4)
                    .alias("luma_std"))
            .orderBy("media_id", "frame_idx"))


_register_golden("multimodal_resize", _multimodal_resize, "media_id")
_register_golden("multimodal_frame_sample", _multimodal_frames,
                 "media_id, frame_idx")


def _image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup pairs (training/imagedup.py): real
    decode → integer dHash over every image/video payload, then the SAME
    Manku c-of-k block-LSH Hamming join as the text SimHash path — one
    Arrow map stage plus a bucketed candidate join, never all-pairs.
    The fixture plants a 2x-upscaled, corner-brightened twin for every
    15th image so recovered pairs sit at small nonzero Hamming."""
    from .training.imagedup import image_neardup_pairs, plant_image_twins
    from .training.multimodal import media_from_documents
    register_views(spark, sf_dir)
    media = plant_image_twins(
        media_from_documents(spark.table("documents")), every=15)
    return (image_neardup_pairs(media, max_hamming=6,
                                materialize=not _plan_lazy())
            .orderBy("doc_a", "doc_b"))


_register_golden("dedup_image_dhash_pairs", _image_dhash_pairs,
                 "doc_a, doc_b")


def _audio_fp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral-fingerprint audio near-dup pairs (training/audiodup.py):
    real WAV decode → Haitsma-Kalker-style 64-bit band-energy hash over
    every audio payload, then the SAME Manku c-of-k block-LSH Hamming
    join as the text/image paths.  The fixture plants a volume-scaled,
    one-window-perturbed twin for every 15th audio clip so recovered
    pairs sit at small nonzero Hamming."""
    from .training.audiodup import audio_neardup_pairs, plant_audio_twins
    from .training.multimodal import media_from_documents
    register_views(spark, sf_dir)
    media = plant_audio_twins(
        media_from_documents(spark.table("documents")), every=15)
    return (audio_neardup_pairs(media, max_hamming=6,
                                materialize=not _plan_lazy())
            .orderBy("doc_a", "doc_b"))


_register_golden("dedup_audio_fp_pairs", _audio_fp_pairs,
                 "doc_a, doc_b")


def _corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report — the first readout of any curation run
    (doc/token/char totals per (lang, source) cell, the table the
    temperature-mixing and domain-quota stages consume).  Pure Catalyst,
    one map-side-combined aggregate; the result is bounded by the
    (lang, source) cardinality regardless of corpus size."""
    register_views(spark, sf_dir)
    return (spark.table("documents")
            .groupBy("lang", "source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.size(F.split(F.trim("text"), r"\s+"))
                       .cast("long")).alias("n_tokens"),
                 F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
                 F.min(F.col("n_chars").cast("long")).alias("min_chars"),
                 F.max(F.col("n_chars").cast("long")).alias("max_chars"))
            .orderBy("lang", "source"))


_register("corpus_stats_report", _corpus_stats, """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""")


def _embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB embedding near-dup path: banded sign-LSH blocking (no
    label column needed — the block key is derived from the vector) +
    exact integer-Gram verify per bucket.  Precision is exact (measured
    at sf0.01: 0 violations against a DuckDB all-pairs oracle); recall is
    the banding dial, and it is HIGH only in the near-duplicate regime
    the banding serves — at cos >= 0.9 (the planted-twin tests' regime)
    a 4x8 banding catches a pair with p = 1-(1-(1-acos(c)/pi)^8)^4, but
    against sf0.01's organic moderate-cosine pairs (0.15 <= cos <= 0.51)
    measured recall is only 0.03-0.08.  That is inherent: no LSH family
    gives sub-quadratic recall at a 0.15-cosine threshold; callers who
    mean "find actual near-duplicates" should treat min_dot_q ~ 900000 as
    the meaningful dial (or use the SimHash c-of-k path, which guarantees
    recall at a Hamming radius).  The committed golden pins this plan's
    exact output, not an all-pairs ideal."""
    from .training.simsearch import lsh_neardup_pairs
    register_views(spark, sf_dir)
    return (lsh_neardup_pairs(spark.table("embeddings"),
                              min_dot_q=150000, n_bands=4, band_planes=8)
            .orderBy("va", "vb"))


# Since r4 the PLAIN name is the LSH-blocked scale plan (same fn as the
# _lsh twin, kept for key stability), so no driver sf increase can ever
# select an O(n^2) plan (VERDICT r3 item 2).  The exact all-pairs side
# lives ONLY in the recall tests' independent DuckDB oracles
# (tests/test_training_ops.py::test_embed_cosine_lsh_recall_vs_exact).
_register_golden("dedup_embed_cosine_pairs", _embed_neardup_lsh, "va, vb")


def _token_jaccard_lsh_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for unigram-Jaccard near-dup pairs: no label-column
    blocking, no within-block all-pairs.  Candidates come from banded
    MinHash-LSH over shingle_k=1 signatures (the minhash of a token
    multiset equals the minhash of its set, so the estimator lives in
    exactly the space the verify measures); survivors are exact-verified
    with array_intersect/array_union.  The only wide operations are the
    band-bucket self-join (uniform hash keys, no skew) and one join back
    to the token arrays.  At 16 bands x 4 rows a true pair at j=0.8 is
    missed with probability (1-0.8^4)^16 ~= 2e-4; the golden pins the
    fixture's planted pairs, and the recall test cross-checks against the
    exact all-pairs computation at sf0.01."""
    from .training.dedup import lsh_candidate_pairs, minhash_signatures
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    sigs = minhash_signatures(docs, shingle_k=1)
    # generous LSH pre-filter (est >= 0.5) so estimator noise cannot drop
    # a true j>=0.8 pair; precision comes from the exact verify below
    cand = lsh_candidate_pairs(sigs, threshold=0.5,
                               materialize=not _plan_lazy())
    toks = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    return (
        cand
        .join(toks.select(F.col("doc_id").alias("doc_a"),
                          F.col("toks").alias("ta")), "doc_a")
        .join(toks.select(F.col("doc_id").alias("doc_b"),
                          F.col("toks").alias("tb")), "doc_b")
        .withColumn("jacc_x10000",
                    F.round(F.lit(10000.0)
                            * F.size(F.array_intersect("ta", "tb"))
                            / F.size(F.array_union("ta", "tb"))).cast("long"))
        .filter(F.col("jacc_x10000") >= 8000)
        .select(F.col("doc_a").cast("long").alias("da"),
                F.col("doc_b").cast("long").alias("db"), "jacc_x10000")
        .orderBy("da", "db")
    )


_register_golden("dedup_ngram_jaccard_pairs_lsh", _token_jaccard_lsh_spark,
                 "da, db")
# plain name → same LSH plan (see the dedup_embed_cosine_pairs note)
_register_golden("dedup_ngram_jaccard_pairs", _token_jaccard_lsh_spark,
                 "da, db")


def _search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/Q3 full path through the search module: inverted-index build →
    2-term AND intersection → tf+proximity scoring → top-K."""
    from .search.postings import build_postings, search
    register_views(spark, sf_dir)
    postings = build_postings(spark.table("documents"))
    return search(postings, ["data", "join"], k=10)


_register("search_postings_topk", _search_topk, """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS term,
         generate_subscripts(string_split(lower(text), ' '), 1) - 1 AS pos
  FROM documents
), postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
         list_sort(list(pos)) AS positions
  FROM tok WHERE length(term) > 0 GROUP BY term, doc_id
), joined AS (
  SELECT a.doc_id, a.tf AS tf_0, b.tf AS tf_1,
         (SELECT MIN(ABS(x.p1 - y.p2))
          FROM (SELECT unnest(a.positions) p1) x,
               (SELECT unnest(b.positions) p2) y) AS min_gap
  FROM postings a JOIN postings b ON a.doc_id = b.doc_id
  WHERE a.term = 'data' AND b.term = 'join'
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST((tf_0 + tf_1) * 10
            + CASE WHEN min_gap <= 1 THEN 50 WHEN min_gap <= 4 THEN 20
                   WHEN min_gap <= 16 THEN 5 ELSE 0 END AS BIGINT) AS score,
       CAST(min_gap AS BIGINT) AS min_gap
FROM joined
ORDER BY score DESC, doc_id
LIMIT 10
""")


def _q1_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 full path: parse 'data join -vector' (implicit AND + negation)
    → termlist joins + anti-join → tf-sum scoring → top-K."""
    from .search.postings import build_postings
    from .search.queryparse import search_query
    register_views(spark, sf_dir)
    postings = build_postings(spark.table("documents"))
    return search_query(postings, "data join -vector", k=10)


_register("q1_boolean_search", _q1_boolean, """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE length(term) > 0 GROUP BY term, doc_id
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST((a.tf + b.tf) * 10 AS BIGINT) AS score
FROM postings a JOIN postings b ON a.doc_id = b.doc_id
WHERE a.term = 'data' AND b.term = 'join'
  AND a.doc_id NOT IN (SELECT doc_id FROM postings WHERE term = 'vector')
ORDER BY score DESC, doc_id
LIMIT 10
""")


def _q1_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 phrase path: '"hash join"' — consecutive-position verify over
    the positions arrays (Query.cpp quoted-phrase semantics)."""
    from .search.postings import build_postings
    from .search.queryparse import search_query
    register_views(spark, sf_dir)
    postings = build_postings(spark.table("documents"))
    return search_query(postings, '"hash join"', k=10)


_register("q1_phrase_search", _q1_phrase, """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
         generate_subscripts(string_split(lower(text), ' '), 1) - 1 AS pos
  FROM documents
), postings AS (
  SELECT term, doc_id, list_sort(list(pos)) AS positions
  FROM tok WHERE length(term) > 0 GROUP BY term, doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(ptf * 10 * 2 + 50 AS BIGINT) AS score
FROM (
  SELECT a.doc_id,
         len(list_intersect(list_transform(a.positions, p -> p + 1),
                            b.positions)) AS ptf
  FROM postings a JOIN postings b
    ON a.doc_id = b.doc_id AND a.term = 'hash' AND b.term = 'join'
) t WHERE ptf > 0
ORDER BY score DESC, doc_id
LIMIT 10
""")


def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) over the events stream — batch
    form of the stateful streaming operator (streaming/sessionize.py)."""
    from .streaming.sessionize import sessionize_batch
    register_views(spark, sf_dir)
    s = sessionize_batch(spark.table("events"))
    return s.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_idx").cast("long").alias("session_idx"),
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
    ).orderBy("user_id", "session_idx")


_register("events_sessionize_gap", _sessionize, """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts))) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS sum_value,
       CAST(MIN(ts) AS STRING) AS session_start,
       CAST(MAX(ts) AS STRING) AS session_end
FROM numbered GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
""")


def _winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (rolling k-gram hash + window min,
    Schleimer et al.) — per-doc summary for copy detection."""
    from .training.dedup import winnow_profile
    return winnow_profile(_docs_long(spark, sf_dir)).orderBy("doc_id")


def _embed_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic coarse centroids, nprobe=2 probed lists."""
    from .training.simsearch import ivf_topk
    register_views(spark, sf_dir)
    return ivf_topk(spark.table("embeddings"), query_vec_id=0, k=10)


def _embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN (Jégou et al. 2011): deterministic per-subspace codebooks,
    8-byte codes, ADC table-gather scan, exact re-rank of the top 50 —
    the memory-bound tier where 10^10 float vectors cannot load but
    their codes can."""
    from .training.simsearch import pq_topk
    register_views(spark, sf_dir)
    return pq_topk(spark.table("embeddings"), query_vec_id=0, k=10)


_register_golden("doc_fingerprint_winnow", _winnow, "doc_id")
_register_golden("embed_ann_ivf", _embed_ivf, "dot_q DESC, vec_id")
_register_golden("embed_ann_pq", _embed_pq, "dot_q DESC, vec_id")


def _dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup decision: MinHash → LSH candidates →
    exact-Jaccard verify → keep-lowest-doc_id rule."""
    from .training.dedup import dedup_keepers
    return dedup_keepers(_docs_long(spark, sf_dir),
                         materialize=not _plan_lazy()).orderBy("doc_id")


def _semdedup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    semantic dedup — cluster with the IVF coarse quantizer, then a
    per-cluster greedy keep-low-centroid-sim scan with integer-exact
    quantized cosines.  Candidates are only ever within-cluster, never
    corpus-all-pairs."""
    from .training.semdedup import semdedup
    register_views(spark, sf_dir)
    return (semdedup(spark.table("embeddings"), eps=0.92, n_clusters=16,
                     materialize=not _plan_lazy())
            .orderBy("vec_id"))


def _semdedup_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup through the DISTRIBUTED clustering tier (r4): n_clusters
    above SMALL_K_MAX forces ``dkmeans.two_level_assign`` — coarse
    distributed Lloyd over integer-quantized partial sums, per-cell
    sub-centroids applied via cogroup — so the driver-gate pins the
    k~n paper-regime path, not just the ANN-sized quantizer.  Output is
    partition-count-deterministic by construction (integer partial
    sums), which is what makes a golden safe here — on a fixed BLAS
    build; see dkmeans' module docstring for the float-argmin caveat."""
    from .training.semdedup import semdedup
    register_views(spark, sf_dir)
    return (semdedup(spark.table("embeddings"), eps=0.92, n_clusters=300,
                     materialize=not _plan_lazy())
            .orderBy("vec_id"))


_register_golden("dedup_pipeline_keepers", _dedup_keepers, "doc_id")
_register_golden("dedup_embed_cosine_pairs_lsh", _embed_neardup_lsh,
                 "va, vb")
_register_golden("dedup_semantic_keepers", _semdedup_verdicts, "vec_id")
_register_golden("dedup_semantic_keepers_distributed",
                 _semdedup_distributed, "vec_id")


def _dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169):
    hashed unigram+bigram bag-of-words models for target (source=src0)
    vs the raw pool, integer-quantized log importance weights, Gumbel
    top-k sampling without replacement.  Bucket aggregate is bounded at
    n_buckets rows; the top-k boundary is a one-row collect broadcast as
    a literal — no global sort."""
    from .training.dsir import dsir_select
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text",
        (F.col("source") == "src0").alias("is_target"))
    return dsir_select(docs, k=100,
                       materialize=not _plan_lazy()).orderBy("doc_id")


_register_golden("dsir_importance_select", _dsir_select, "doc_id")


def _quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style quality filter (Brown 2020 App. A / Joulin 2016
    hashing trick, fit as closed-form NB over hashed unigram+bigram
    buckets): train reference (source=src0) vs random (src1/src2),
    score EVERY document with an integer-quantized log-odds and a MAP
    keep verdict.  Model is a bounded broadcast table; train is one
    map-side-combined aggregate."""
    from .training.qclassifier import quality_classify
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text",
        F.when(F.col("source") == "src0", F.lit(True))
        .when(F.col("source").isin("src1", "src2"), F.lit(False))
        .alias("label"))
    return quality_classify(docs).orderBy("doc_id")


_register_golden("text_quality_classifier", _quality_classifier, "doc_id")


def _shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle (seeded tabulation-hash
    permutation): every doc's exact 0-based position in the shuffled
    training stream, via the range-sharded two-pass prefix sum — the
    only unpartitioned window runs over the bounded partials table."""
    from .training.shuffle import shuffle_positions
    return (shuffle_positions(_docs_long(spark, sf_dir), seed=7)
            .orderBy("doc_id"))


_register_golden("training_shuffle_positions", _shuffle_positions,
                 "doc_id")


def _summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: result summaries/titles — best query-term window per doc
    (Summary.cpp getBestWindow analogue, pure Catalyst)."""
    from .search.summary import summarize
    return (summarize(_docs_long(spark, sf_dir), ["data", "join"])
            .orderBy("doc_id"))


_register_golden("q5_result_summaries", _summaries, "doc_id")


def _summaries_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5, reference-faithful engine: Summary.cpp ladder — description
    tags > greedy best-window loop with dead zones / retired terms >
    default longest-run summary (search/summary_ref.py, batch pandas
    UDF, zero shuffle)."""
    from .search.summary_ref import summarize_ref
    return (summarize_ref(_docs_long(spark, sf_dir),
                          query_terms=["data", "join"])
            .select("doc_id", "summary").orderBy("doc_id"))


_register_golden("q5_summary_engine", _summaries_ref, "doc_id")


def _titles_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5, reference-faithful title engine: Title.cpp candidate scoring
    (inlink anchor texts, query boost, pairwise similarity cross-boost,
    URL-path booster) over documents with deterministic synthetic
    inlinks derived from each doc's own leading tokens."""
    from .search.title_ref import title_ref
    docs = _docs_long(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    docs = (docs
            .withColumn("url", F.concat(
                F.lit("http://site"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit(".example.com/doc-"),
                F.col("doc_id").cast("string"), F.lit("/page")))
            .withColumn("anchors", F.array(
                F.struct(
                    F.concat_ws(" ", F.slice(toks, 1, 4)).alias("link_text"),
                    F.lit("").alias("rss_title"),
                    F.lit(True).alias("same_host")),
                F.struct(
                    F.concat_ws(" ", F.slice(toks, 3, 5)).alias("link_text"),
                    F.lit("").alias("rss_title"),
                    F.lit(False).alias("same_host")))))
    return (title_ref(docs, "text", "url", "anchors", ["data", "join"],
                      content_type="text")
            .select("doc_id", "title").orderBy("doc_id"))


_register_golden("q5_title_engine", _titles_ref, "doc_id")


def _serve_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Msg40 serve path: PosdbTable rank → broadcast Msg20
    join-back → Title.cpp/Summary.cpp engines → Msg51 cluster levels,
    one call (search/serve.py)."""
    from .search.serve import serve_results
    docs = _docs_long(spark, sf_dir).withColumn(
        "url", F.concat(F.lit("http://site"),
                        (F.col("doc_id") % 50).cast("string"),
                        F.lit(".example.com/doc-"),
                        F.col("doc_id").cast("string")))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    anchors = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(toks, 1, 4)).alias("link_text"),
        F.lit("").alias("rss_title"), F.lit(True).alias("same_host"))
    page = serve_results(docs, "data join", k=20, url_col="url",
                         anchors=anchors, content_type="text")
    return (page.select("rank", "doc_id", "url", "title", "summary",
                        F.col("score").cast("double").alias("score"),
                        "cluster_level")
            .orderBy("rank"))


_register_golden("q_serve_page", _serve_page, "rank")


def _search_input_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SearchInput parameter surface end-to-end (SearchInput.cpp +
    Parms.cpp OBJ_SI table, search/searchinput.py): an HttpRequest-style
    param dict — paging (n/s), advanced-query rewrite (plus/quotea →
    setQueryBuffers), site clustering (sc), dup removal (dr/pss/ddu),
    highlighting (qh) — parsed, derived, capped, composed and run
    through the Msg40 serve path."""
    from .search.searchinput import execute_search_input, parse_search_input
    docs = _docs_long(spark, sf_dir).withColumn(
        "url", F.concat(F.lit("http://site"),
                        (F.col("doc_id") % 50).cast("string"),
                        F.lit(".example.com/doc-"),
                        F.col("doc_id").cast("string")))
    si = parse_search_input({
        "q": "data join", "n": "8", "s": "2", "sc": "1",
        "dr": "1", "pss": "80", "ddu": "1", "qh": "1",
        "plus": "stream", "quotea": "",
    })
    page = execute_search_input(si, docs, url_col="url",
                                content_type="text")
    return (page.select("rank", "doc_id", "url", "title", "summary",
                        F.col("score").cast("double").alias("score"),
                        "cluster_level")
            .orderBy("rank"))


_register_golden("q_search_input_page", _search_input_page, "rank")


# ---------------------------------------------------------------------------
# Link-graph tier (Linkdb.cpp / Msg25 / siteRank): inlink aggregation and
# an integer-arithmetic PageRank over a deterministic link graph derived
# from the frontier (each page links to 3 modular targets).  Integer
# floor-division ranks are bit-identical across engines — the oracle is
# the same power iteration unrolled as a chain of CTEs.
# ---------------------------------------------------------------------------

_LINKS_CTE = """
, nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM frontier)
, links AS (
  SELECT DISTINCT f.uh AS src, (f.uh * 31 + j.j * 17) % nl.n AS dst
  FROM frontier f, nl,
       (SELECT 1 AS j UNION ALL SELECT 2 UNION ALL SELECT 3) j
  WHERE (f.uh * 31 + j.j * 17) % nl.n <> f.uh
)
"""


def _link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(FRONTIER_CTE + _LINKS_CTE
                     + "SELECT src, dst FROM links")


def _linkrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (siteRank analogue) — production graph.linkrank.pagerank
    (join-per-superstep Pregel pattern), 3 iterations, scaled-integer
    ranks."""
    from .graph.linkrank import pagerank
    edges = _link_edges(spark, sf_dir)
    nodes = spark.sql(FRONTIER_CTE + "SELECT uh AS node FROM frontier")
    return pagerank(edges, nodes, n_iter=3).orderBy("node")


def _linkrank_oracle(n_iter: int = 3) -> str:
    """The identical integer power iteration as unrolled DuckDB CTEs."""
    from .graph.linkrank import BASE_SHARE, DAMP_DEN, DAMP_NUM, RANK_SCALE
    parts = [FRONTIER_CTE + _LINKS_CTE]
    parts.append("""
, deg AS (SELECT src, COUNT(*) AS deg FROM links GROUP BY src)
, nodes AS (SELECT uh AS node FROM frontier)
, r0 AS (SELECT node, CAST(%d AS BIGINT) AS rank FROM nodes)
""" % RANK_SCALE)
    for i in range(1, n_iter + 1):
        parts.append(f"""
, c{i} AS (
  SELECT l.dst AS dst, SUM(r.rank // d.deg) AS inflow
  FROM links l
  JOIN r{i - 1} r ON r.node = l.src
  JOIN deg d ON d.src = l.src
  GROUP BY l.dst)
, r{i} AS (
  SELECT n.node,
         CAST({BASE_SHARE} + ({DAMP_NUM} * COALESCE(c.inflow, 0)) // {DAMP_DEN}
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node)
""")
    parts.append(f"SELECT node, rank FROM r{n_iter} ORDER BY node")
    return "".join(parts)


def _link_inlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Msg25 inlink aggregation over the same graph: distinct inlinkers
    per linkee (feeds numinlinks/siteNumInlinks rule atoms)."""
    from .graph.linkrank import inlink_counts
    return inlink_counts(_link_edges(spark, sf_dir)).orderBy("dst")


_register("linkgraph_pagerank", _linkrank, _linkrank_oracle(3))
_register("linkgraph_inlinks", _link_inlinks, FRONTIER_CTE + _LINKS_CTE + """
SELECT dst, COUNT(DISTINCT src) AS n_inlinks
FROM links GROUP BY dst ORDER BY dst
""")


# ---------------------------------------------------------------------------
# Gopher/C4 document-shape quality filters (training/gopher.py): scaled-
# integer measures + pass flag; the oracle recomputes the same integer
# arithmetic from DuckDB's own tokenization.
# ---------------------------------------------------------------------------

def _gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.gopher import gopher_quality
    return gopher_quality(_docs_long(spark, sf_dir)).orderBy("doc_id")


_register("text_gopher_quality", _gopher, r"""
WITH raw AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
         generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1)
           AS i
  FROM documents
), toks AS (SELECT doc_id, w, i FROM raw WHERE w <> ''),
base AS (
  SELECT doc_id, COUNT(*) AS n_words, SUM(length(w)) AS sum_len,
         SUM(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END)
           AS n_alpha,
         SUM(CASE WHEN w LIKE '%#%' OR w LIKE '%...%' OR w LIKE '%…%'
             THEN 1 ELSE 0 END) AS n_sym
  FROM toks GROUP BY doc_id),
bi AS (
  SELECT doc_id, w,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
  FROM toks),
bic AS (
  SELECT doc_id, w, w2, COUNT(*) AS c
  FROM bi WHERE w2 IS NOT NULL GROUP BY doc_id, w, w2),
bitop AS (SELECT doc_id, MAX(c) AS top_c FROM bic GROUP BY doc_id)
SELECT b.doc_id, b.n_words,
       CAST(100 * b.sum_len // b.n_words AS BIGINT) AS mean_word_len_x100,
       CAST(100 * b.n_alpha // b.n_words AS BIGINT) AS frac_alpha_x100,
       CAST(1000 * b.n_sym // b.n_words AS BIGINT) AS symbol_ratio_x1000,
       CAST(1000 * 2 * COALESCE(t.top_c, 0) // b.n_words AS BIGINT)
         AS top_bigram_x1000,
       (b.n_words BETWEEN 50 AND 100000)
         AND (100 * b.sum_len // b.n_words BETWEEN 300 AND 1000)
         AND (100 * b.n_alpha // b.n_words >= 80)
         AND (1000 * b.n_sym // b.n_words <= 100)
         AND (1000 * 2 * COALESCE(t.top_c, 0) // b.n_words <= 180)
         AS gopher_pass
FROM base b LEFT JOIN bitop t USING (doc_id)
ORDER BY b.doc_id
""")


# ---------------------------------------------------------------------------
# Line-tier corpus ops (training/lines.py, training/gopher.py): corpus-wide
# first-occurrence line dedup, Gopher repetition measures, and dup-ngram
# coverage.  Lines are deterministic 10-token segments (the fixture corpus
# carries no newlines); the segmentation regex is applied identically by
# both engines.
# ---------------------------------------------------------------------------

def _dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.lines import line_dedup, segment_text
    docs = _docs_long(spark, sf_dir).withColumn("text", segment_text("text"))
    return line_dedup(docs).orderBy("doc_id")


_register("dedup_lines", _dedup_lines, r"""
WITH seg AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_replace(text, '((?:\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS t
  FROM documents),
rawl AS (
  SELECT doc_id, unnest(string_split(t, chr(10))) AS l,
         generate_subscripts(string_split(t, chr(10)), 1) - 1 AS line_no
  FROM seg),
lines AS (
  SELECT doc_id, line_no, trim(l) AS line FROM rawl WHERE trim(l) <> ''),
ranked AS (
  SELECT doc_id, line_no, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
  FROM lines),
keptagg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY line_no) AS text_dedup
  FROM ranked WHERE rn = 1 GROUP BY doc_id),
tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(t.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(k.text_dedup, '') AS text_dedup
FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
LEFT JOIN tot t USING (doc_id) LEFT JOIN keptagg k USING (doc_id)
ORDER BY d.doc_id
""")


def _gopher_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.gopher import gopher_repetition
    return gopher_repetition(_docs_long(spark, sf_dir)).orderBy("doc_id")


_register("text_gopher_repetition", _gopher_rep, r"""
WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
seg AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS t
  FROM base),
rawl AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS l FROM seg),
lines AS (SELECT doc_id, trim(l) AS line FROM rawl WHERE trim(l) <> ''),
pl AS (SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
       FROM lines GROUP BY doc_id, line),
ls AS (SELECT doc_id, SUM(c) AS n_lines, SUM(c - 1) AS n_dup_lines,
              SUM(c * len) AS line_chars,
              SUM((c - 1) * len) AS dup_line_chars
       FROM pl GROUP BY doc_id),
rawt AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
         generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1)
           AS i
  FROM base),
toks AS (SELECT doc_id, w, i FROM rawt WHERE w <> ''),
tc AS (SELECT doc_id, SUM(length(w)) AS tok_chars FROM toks GROUP BY doc_id),
ld AS (SELECT doc_id, w,
              LEAD(w, 1) OVER win AS w1,
              LEAD(w, 2) OVER win AS w2,
              LEAD(w, 3) OVER win AS w3
       FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
grams AS (
  SELECT doc_id, 2 AS n, w || ' ' || w1 AS g FROM ld WHERE w1 IS NOT NULL
  UNION ALL
  SELECT doc_id, 3, w || ' ' || w1 || ' ' || w2 FROM ld WHERE w2 IS NOT NULL
  UNION ALL
  SELECT doc_id, 4, w || ' ' || w1 || ' ' || w2 || ' ' || w3
  FROM ld WHERE w3 IS NOT NULL),
tal AS (SELECT doc_id, n, g, COUNT(*) AS c FROM grams GROUP BY doc_id, n, g),
top AS (SELECT doc_id,
  MAX(CASE WHEN n = 2 AND c >= 2 THEN c * (length(g) - 1) ELSE 0 END) AS top2,
  MAX(CASE WHEN n = 3 AND c >= 2 THEN c * (length(g) - 2) ELSE 0 END) AS top3,
  MAX(CASE WHEN n = 4 AND c >= 2 THEN c * (length(g) - 3) ELSE 0 END) AS top4
  FROM tal GROUP BY doc_id)
SELECT ls.doc_id, CAST(ls.n_lines AS BIGINT) AS n_lines,
  CAST(1000 * ls.n_dup_lines // ls.n_lines AS BIGINT)
    AS dup_line_frac_x1000,
  CAST(1000 * ls.dup_line_chars // ls.line_chars AS BIGINT)
    AS dup_line_chars_x1000,
  CAST(1000 * COALESCE(top.top2, 0) // tc.tok_chars AS BIGINT)
    AS top2_chars_x1000,
  CAST(1000 * COALESCE(top.top3, 0) // tc.tok_chars AS BIGINT)
    AS top3_chars_x1000,
  CAST(1000 * COALESCE(top.top4, 0) // tc.tok_chars AS BIGINT)
    AS top4_chars_x1000,
  (1000 * ls.n_dup_lines // ls.n_lines <= 300)
    AND (1000 * ls.dup_line_chars // ls.line_chars <= 200)
    AND (1000 * COALESCE(top.top2, 0) // tc.tok_chars <= 200)
    AND (1000 * COALESCE(top.top3, 0) // tc.tok_chars <= 180)
    AND (1000 * COALESCE(top.top4, 0) // tc.tok_chars <= 160) AS rep_pass
FROM ls JOIN tc USING (doc_id) LEFT JOIN top USING (doc_id)
ORDER BY ls.doc_id
""")


def _dup_ngram_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.gopher import dup_ngram_coverage
    return dup_ngram_coverage(_docs_long(spark, sf_dir)).orderBy("doc_id")


_register_golden("text_dup_ngram_coverage", _dup_ngram_cov, "doc_id")


def _curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.pipeline import curate
    return curate(_docs_long(spark, sf_dir),
                  materialize=not _plan_lazy()).orderBy("doc_id")


_register_golden("training_curation_pipeline", _curation, "doc_id")


def _domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.pipeline import domain_quota_sample
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source")
    return domain_quota_sample(docs).orderBy("doc_id")


_register("domain_quota_sample", _domain_quota, r"""
WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM toks),
tot AS (SELECT SUM(n_tokens) AS total_tokens FROM toks)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       cum_tokens * 1000 <= 200 * total_tokens AS keep
FROM cum, tot
ORDER BY doc_id
""")


# ---------------------------------------------------------------------------
# Benchmark decontamination — flag training docs sharing a word n-gram
# with the eval split (GPT-3 appendix C / Gopher A.4 pipeline step; n=4
# here because the fixture docs are ~50 words, 13 in production).  Eval
# split = doc_id % 23 == 0; output covers every training doc.
# ---------------------------------------------------------------------------
def _decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.decontam import decontaminate
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    train = docs.filter(F.col("doc_id") % 23 != 0)
    evals = docs.filter(F.col("doc_id") % 23 == 0)
    return (decontaminate(train, evals, n=4)
            .orderBy("doc_id"))


_register("decontaminate_eval_overlap", _decontam, r"""
WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS ws
  FROM documents),
words AS (
  SELECT doc_id, ws[i] AS w, i AS ord
  FROM toks, UNNEST(range(1, len(ws)+1)) AS r(i)),
grams AS (
  SELECT doc_id,
         w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win
           || ' ' || lead(w,3) OVER win AS gram
  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY ord)
  QUALIFY lead(w,3) OVER win IS NOT NULL),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 23 = 0),
train_grams AS (
  SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 23 <> 0),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_shared_grams
  FROM train_grams t JOIN eval_grams e USING (gram)
  GROUP BY t.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(h.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
       COALESCE(h.n_shared_grams, 0) > 0 AS contaminated
FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
      WHERE doc_id % 23 <> 0) d
LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
""")


# ---------------------------------------------------------------------------
# PII scrub — per-doc PII class counts + typed-placeholder redaction
# (C4/RefinedWeb-style curation stage).  PII is planted deterministically
# in both engines (the fixture corpus has none), patterns stay in the
# Java-regex ∩ RE2 common subset so the same pattern text runs on both.
# ---------------------------------------------------------------------------
def _pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.pii import pii_profile, pii_redact
    register_views(spark, sf_dir)
    d = F.col("doc_id")
    aug = spark.table("documents").select(
        d.cast("long").alias("doc_id"),
        F.when(d % 7 == 0,
               F.concat(F.col("text"), F.lit(" contact user"),
                        d.cast("string"), F.lit("@example.com now")))
        .when(d % 7 == 1,
              F.concat(F.col("text"), F.lit(" call 555-123-4567 or visit "
                                            "10.0.0."),
                       (d % 255).cast("string")))
        .when(d % 7 == 2,
              F.concat(F.col("text"), F.lit(" ssn 123-45-6789 ip 10.1.2.3")))
        .otherwise(F.col("text")).alias("text"))
    prof = pii_profile(aug)
    red = pii_redact(aug).select("doc_id",
                                 F.col("text").alias("text_redacted"))
    return prof.join(red, "doc_id").orderBy("doc_id")


_register("pii_scrub", _pii_scrub, r"""
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CASE
      WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
           CAST(doc_id AS VARCHAR) || '@example.com now'
      WHEN doc_id % 7 = 1 THEN text || ' call 555-123-4567 or visit 10.0.0.'
           || CAST(doc_id % 255 AS VARCHAR)
      WHEN doc_id % 7 = 2 THEN text || ' ssn 123-45-6789 ip 10.1.2.3'
      ELSE text END AS text
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT)
    AS n_ssn,
  CAST(len(regexp_extract_all(text, '\b\d{3}[- ]\d{3}[- ]\d{4}\b'))
    AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(text,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text,
    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
     + len(regexp_extract_all(text, '\b\d{3}[- ]\d{3}[- ]\d{4}\b'))
     + len(regexp_extract_all(text,
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
     + len(regexp_extract_all(text,
         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT)
    AS n_pii,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
      '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '[PHONE]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g')
    AS text_redacted
FROM aug
ORDER BY doc_id
""")


# ---------------------------------------------------------------------------
# Query-time result post-filtering (Msg51 setClusterLevels + Msg40 loop):
# family/lang filters, hostname clustering, dup-URL removal — the PRODUCTION
# search.results.filter_results over a deterministic ranked "result page"
# derived from documents (rank = n_chars DESC; host = source; every 7th doc
# carries a www. prefix and every doc collides its path modulo 120 so the
# normalize-first-wins dup-URL stage genuinely fires).
# ---------------------------------------------------------------------------

def _result_cluster_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .search.results import filter_results
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    w = Window.orderBy(F.desc("n_chars"), "doc_id")  # one ranked result
    # page (bounded by docsWanted in production — global window is the
    # fixture form, not a scale path)
    res = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.row_number().over(w) - 1).cast("long").alias("rank"),
        F.concat(F.lit("http://"),
                 F.when(F.col("doc_id") % 7 == 0, F.lit("www."))
                 .otherwise(F.lit("")),
                 F.col("source"), F.lit(".example/doc/"),
                 (F.col("doc_id") % 120).cast("string")).alias("url"),
        F.col("lang"),
        (F.col("doc_id") % 37 == 0).alias("is_adult"),
        F.lit("t").alias("title"), F.lit("s").alias("summary"))
    out = filter_results(res, family_filter=True, lang_filter="en",
                         max_per_site=2, dedup_url=True)
    return (out.select("rank", "doc_id",
                       F.col("cluster_level").cast("int")
                       .alias("cluster_level"))
            .orderBy("rank"))


_register("q_result_cluster_filter", _result_cluster_filter, """
WITH r AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1
              AS BIGINT) AS rnk,
         CASE WHEN doc_id % 7 = 0 THEN 'www.' || source || '.example'
              ELSE source || '.example' END AS host,
         source || '.example/doc/' || CAST(doc_id % 120 AS VARCHAR)
           AS norm_key,
         lang, (doc_id % 37 = 0) AS is_adult
  FROM documents),
s1 AS (  -- Msg51: family filter then language filter
  SELECT *, CASE WHEN is_adult THEN 3
                 WHEN lang <> 'en' THEN 4 ELSE 16 END AS l1 FROM r),
s2 AS (  -- Msg51: 3rd+ still-visible result per hostname is clustered
  SELECT *, CASE WHEN l1 = 16 AND row_number()
                   OVER (PARTITION BY host, l1 ORDER BY rnk) > 2
                 THEN 5 ELSE l1 END AS l2 FROM s1),
s3 AS (  -- Msg40: first visible per normalized url wins
  SELECT *, CASE WHEN l2 = 16 AND row_number()
                   OVER (PARTITION BY norm_key, l2 ORDER BY rnk) > 1
                 THEN 14 ELSE l2 END AS l3 FROM s2)
SELECT rnk AS rank, doc_id, CAST(l3 AS INT) AS cluster_level
FROM s3 ORDER BY rank
""")


def _result_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy dup-summary removal (Msg40.cpp:1465-1520) over a ranked
    result page whose titles/summaries are the documents' own leading
    tokens — the corpus's planted near-duplicates make CR_DUP_SUMMARY
    fire at the reference's default threshold (percentSimilarSummary=90,
    Parms.cpp:7606); sequential-greedy is not SQL-expressible, hence
    golden."""
    from .search.results import filter_results
    register_views(spark, sf_dir)
    docs = (spark.table("documents")
            .orderBy(F.desc("n_chars"), "doc_id").limit(256))
    toks = F.split(F.lower(F.col("text")), r"\s+")
    w = Window.orderBy(F.desc("n_chars"), "doc_id")
    res = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.row_number().over(w) - 1).cast("long").alias("rank"),
        F.concat(F.lit("http://"), F.col("source"),
                 F.lit(".example/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.col("lang"),
        F.lit(False).alias("is_adult"),
        F.concat_ws(" ", F.slice(toks, 1, 6)).alias("title"),
        F.concat_ws(" ", F.slice(toks, 7, 20)).alias("summary"))
    out = filter_results(res, do_site_clustering=False, dedup_percent=90)
    return (out.select("rank", "doc_id",
                       F.col("cluster_level").cast("int")
                       .alias("cluster_level"))
            .orderBy("rank"))


_register_golden("q_result_dedup_summary", _result_dedup_summary, "rank")


def _q1_sortby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 numeric operators: 'data gbmin:n_chars:500 gbsortby:n_chars' —
    the gbmin: range constraint plus gbsortby: re-ranking (Query.cpp
    FIELD_GBNUMBERMIN/FIELD_GBSORTBY*, PosdbTable m_sortByTermNum)
    through the PRODUCTION parser and executor."""
    from .search.postings import build_postings
    from .search.queryparse import search_query
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    postings = build_postings(docs)
    meta = docs.select("doc_id", "n_chars")
    return search_query(postings, "data gbmin:n_chars:500 gbsortby:n_chars",
                        k=10, doc_meta=meta)


_register("q1_sortby_range", _q1_sortby, """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE length(term) > 0 GROUP BY term, doc_id
)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       CAST(p.tf * 10 AS BIGINT) AS score,
       CAST(d.n_chars AS DOUBLE) AS sort_key
FROM postings p JOIN documents d ON p.doc_id = d.doc_id
WHERE p.term = 'data' AND d.n_chars >= 500
ORDER BY sort_key ASC, doc_id
LIMIT 10
""")


def _q2_anchor_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text indexing (XmlDoc.cpp:4150-4172: incoming link text is
    hashed into the linked-to doc's term table via Msg25 LinkInfo).  A
    deterministic synthetic link graph — doc s links to doc
    (s*13+7) mod N with s's five leading tokens as anchor — feeds the
    PRODUCTION build_postings_with_anchors; the query returns every
    doc's combined tf for the term 'data'."""
    from .search.postings import build_postings_with_anchors
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    n = docs.count()
    toks = F.split(F.lower(F.col("text")), r"\s+")
    links = docs.select(
        ((F.col("doc_id") * 13 + 7) % n).alias("dst_doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, 5)).alias("anchor_text"))
    p = build_postings_with_anchors(docs, links)
    return (p.filter(F.col("term") == "data")
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("tf").cast("long").alias("tf"))
            .orderBy("doc_id"))


_register("q2_anchor_text_index", _q2_anchor_index, """
WITH n AS (SELECT COUNT(*) AS c FROM documents),
body AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), body_tf AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM body
  WHERE length(term) > 0 GROUP BY term, doc_id
), links AS (
  SELECT (doc_id * 13 + 7) % (SELECT c FROM n) AS doc_id,
         unnest(list_slice(string_split(lower(text), ' '), 1, 5)) AS term
  FROM documents
), anchor_tf AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM links
  WHERE length(term) > 0 GROUP BY term, doc_id
), merged AS (
  SELECT COALESCE(b.term, a.term) AS term,
         COALESCE(b.doc_id, a.doc_id) AS doc_id,
         COALESCE(b.tf, 0) + COALESCE(a.tf, 0) AS tf
  FROM body_tf b FULL OUTER JOIN anchor_tf a
    ON b.term = a.term AND b.doc_id = a.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(tf AS BIGINT) AS tf
FROM merged WHERE term = 'data' ORDER BY doc_id
""")


def _exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring dedup (Lee et al. 2021 ExactSubstr;
    training/substring.py): every occurrence of every corpus-duplicated
    8-token window is cut; the oracle recomputes over window STRINGS, so
    it also cross-checks the 64-bit rolling hash for collisions."""
    from .training.substring import exact_substring_dedup
    register_views(spark, sf_dir)
    return (exact_substring_dedup(spark.table("documents"), min_len=8)
            .orderBy("doc_id"))


_register("dedup_exact_substring", _exact_substr, """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), wins AS (
  SELECT doc_id, i - 1 AS start,
         array_to_string(list_slice(t, i, i + 7), ' ') AS w
  FROM toks, unnest(generate_series(1, len(t) - 7)) AS g(i)
  WHERE len(t) >= 8
), dups AS (
  SELECT w FROM wins GROUP BY w HAVING COUNT(*) >= 2
), marked AS (
  SELECT DISTINCT m.doc_id, p.pos
  FROM wins m JOIN dups USING (w),
       unnest(generate_series(m.start, m.start + 7)) AS p(pos)
), tk AS (
  SELECT doc_id, unnest(t) AS tok,
         generate_subscripts(t, 1) - 1 AS pos FROM toks
)
SELECT CAST(tk.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(mk.pos) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN mk.pos IS NULL THEN tk.tok END,
                           ' ' ORDER BY tk.pos), '') AS text_dedup
FROM tk LEFT JOIN marked mk ON mk.doc_id = tk.doc_id AND mk.pos = tk.pos
GROUP BY tk.doc_id
ORDER BY doc_id
""")


def _adult_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adult-content scoring (AdultCheck.cpp:498 getAdultPoints /
    XmlDoc.cpp:3142 threshold): once-per-needle weighted substring sum
    over text augmented with deterministic planted needles so every
    weight class and the clean-word offset fire."""
    from .training.adult import adult_points_col, is_adult_col
    register_views(spark, sf_dir)
    aug = (spark.table("documents")
           .withColumn("text2", F.concat(
               F.col("text"),
               F.when(F.col("doc_id") % 11 == 0, F.lit(" porn xxx"))
               .when(F.col("doc_id") % 11 == 1, F.lit(" nude escort"))
               .when(F.col("doc_id") % 11 == 2, F.lit(" sussex news"))
               .when(F.col("doc_id") % 11 == 3, F.lit(" adult smut"))
               .otherwise(F.lit("")))))
    return (aug.select(F.col("doc_id").cast("long").alias("doc_id"),
                       adult_points_col("text2").alias("points"),
                       is_adult_col("text2").alias("is_adult"))
            .orderBy("doc_id"))


_register("text_adult_score", _adult_score, """
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         lower(text || CASE
           WHEN doc_id % 11 = 0 THEN ' porn xxx'
           WHEN doc_id % 11 = 1 THEN ' nude escort'
           WHEN doc_id % 11 = 2 THEN ' sussex news'
           WHEN doc_id % 11 = 3 THEN ' adult smut'
           ELSE '' END) AS t
  FROM documents)
SELECT doc_id,
  CAST(
    CASE WHEN position('porn' IN t) > 0 THEN 2 ELSE 0 END +
    CASE WHEN position('xxx' IN t) > 0 THEN 2 ELSE 0 END +
    CASE WHEN position('smut' IN t) > 0 THEN 2 ELSE 0 END +
    CASE WHEN position('erotic' IN t) > 0 THEN 2 ELSE 0 END +
    CASE WHEN position('escort' IN t) > 0 THEN 1 ELSE 0 END +
    CASE WHEN position('nude' IN t) > 0 THEN 1 ELSE 0 END +
    CASE WHEN position('adult' IN t) > 0 THEN 1 ELSE 0 END +
    CASE WHEN position('sex' IN t) > 0 THEN 1 ELSE 0 END +
    CASE WHEN position('adultery' IN t) > 0 THEN -1 ELSE 0 END +
    CASE WHEN position('sussex' IN t) > 0 THEN -1 ELSE 0 END +
    CASE WHEN position('essex' IN t) > 0 THEN -1 ELSE 0 END +
    CASE WHEN position('middlesex' IN t) > 0 THEN -1 ELSE 0 END
  AS INT) AS points,
  (CASE WHEN position('porn' IN t) > 0 THEN 2 ELSE 0 END +
   CASE WHEN position('xxx' IN t) > 0 THEN 2 ELSE 0 END +
   CASE WHEN position('smut' IN t) > 0 THEN 2 ELSE 0 END +
   CASE WHEN position('erotic' IN t) > 0 THEN 2 ELSE 0 END +
   CASE WHEN position('escort' IN t) > 0 THEN 1 ELSE 0 END +
   CASE WHEN position('nude' IN t) > 0 THEN 1 ELSE 0 END +
   CASE WHEN position('adult' IN t) > 0 THEN 1 ELSE 0 END +
   CASE WHEN position('sex' IN t) > 0 THEN 1 ELSE 0 END +
   CASE WHEN position('adultery' IN t) > 0 THEN -1 ELSE 0 END +
   CASE WHEN position('sussex' IN t) > 0 THEN -1 ELSE 0 END +
   CASE WHEN position('essex' IN t) > 0 THEN -1 ELSE 0 END +
   CASE WHEN position('middlesex' IN t) > 0 THEN -1 ELSE 0 END) >= 2
  AS is_adult
FROM aug ORDER BY doc_id
""")


def _q3_score_boosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-score boosts (PosdbTable.cpp:4413-4426): tf base score for
    'data' through the PRODUCTION score_with_boosts — integer-exact
    siteRank multiplier (floats x9) + x20 sameLangWeight for same or
    unknown language vs qlang=en; deterministic site ranks derived from
    doc_id."""
    from .search.postings import build_postings, score_with_boosts
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    postings = build_postings(docs)
    base = (postings.filter(F.col("term") == "data")
            .select("doc_id", (F.col("tf") * 10).alias("score")))
    meta = docs.select(
        "doc_id", (F.col("doc_id") % 16).alias("site_rank"),
        ((F.col("doc_id") * 7) % 16).alias("highest_inlink_site_rank"),
        "lang")
    return (score_with_boosts(base, meta, qlang="en", k=50)
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("score").cast("long").alias("score")))


_register("q3_score_boosts", _q3_score_boosts, """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), base AS (
  SELECT doc_id, COUNT(*) * 10 AS score FROM tok
  WHERE term = 'data' GROUP BY doc_id
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(b.score
            * (3 * (d.doc_id % 16)
               + GREATEST((d.doc_id * 7) % 16 - d.doc_id % 16, 0) + 9)
            * (CASE WHEN d.lang = 'en' THEN 20 ELSE 1 END)
         AS BIGINT) AS score
FROM base b JOIN documents d ON b.doc_id = d.doc_id
ORDER BY score DESC, doc_id
LIMIT 50
""")


def _q1_link_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """link:/sitelink: query fields (Query.cpp FIELD_LINK/FIELD_SITELINK
    over the Linkdb dimension): 'data sitelink:src3.example' — docs
    containing 'data' that link anywhere on host src3.example, over the
    same deterministic synthetic link graph as q2_anchor_text_index."""
    from .search.postings import build_postings
    from .search.queryparse import search_query
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    n = docs.count()
    dst = docs.select(F.col("doc_id").alias("dst_id"),
                      F.col("source").alias("dst_source"))
    links = (docs.select("doc_id",
                         ((F.col("doc_id") * 13 + 7) % n).alias("dst_id"))
             .join(dst, "dst_id")
             .select(F.col("doc_id").alias("src_doc_id"),
                     F.concat(F.lit("http://"), F.col("dst_source"),
                              F.lit(".example/doc/"),
                              F.col("dst_id").cast("string"))
                     .alias("dst_url")))
    postings = build_postings(docs)
    return search_query(postings, "data sitelink:src3.example", k=50,
                        links=links)


_register("q1_link_fields", _q1_link_fields, """
WITH n AS (SELECT COUNT(*) AS c FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, COUNT(*) AS tf FROM tok WHERE term = 'data'
  GROUP BY doc_id
), linkers AS (
  SELECT DISTINCT s.doc_id
  FROM documents s
  JOIN documents d ON d.doc_id = (s.doc_id * 13 + 7) % (SELECT c FROM n)
  WHERE d.source = 'src3'
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(t.tf * 10 AS BIGINT) AS score
FROM tf t JOIN linkers l ON l.doc_id = t.doc_id
ORDER BY score DESC, doc_id
LIMIT 50
""")


def _q1_meta_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-attribute meta-term fields (XmlDoc_Indexing.cpp:1856-1966
    hashLanguage/hashCountry/hashIsAdult; Query.cpp:2707-2760 documents
    the gblang:/gbcountry:/gbisadult: user syntax):
    'data (gblang:de OR gbcountry:fr) gbisadult:0' — the language id
    comes from the real Lang.cpp abbr table over the corpus lang column,
    the country from the guessCountryTLD URL ladder over a deterministic
    synthetic URL, and the adult bit from the AdultCheck points
    threshold over needle-augmented text."""
    from .functions.country import country_id_col
    from .functions.langcodes import lang_id_from_detector_col
    from .search.postings import build_postings
    from .search.queryparse import search_query
    from .training.adult import is_adult_col
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    d = F.col("doc_id")
    url = (F.when(d % 6 == 0, F.format_string("http://d%d.example/a", d))
           .when(d % 6 == 1, F.format_string("http://de.d%d.example/a", d))
           .when(d % 6 == 2, F.format_string("http://d%d.fr/a", d))
           .when(d % 6 == 3, F.format_string("http://d%d.co.jp/a", d))
           .when(d % 6 == 4, F.format_string("http://fr.d%d.co.uk/a", d))
           .otherwise(F.format_string("http://xx.d%d.info/a", d)))
    aug = F.concat(F.col("text"),
                   F.when(d % 11 == 0, F.lit(" porn xxx"))
                   .when(d % 11 == 1, F.lit(" nude escort"))
                   .when(d % 11 == 2, F.lit(" sussex news"))
                   .when(d % 11 == 3, F.lit(" adult smut"))
                   .otherwise(F.lit("")))
    meta = docs.select(
        d.cast("long").alias("doc_id"),
        lang_id_from_detector_col("lang").alias("lang_id"),
        country_id_col(url).alias("country_id"),
        is_adult_col(aug).alias("is_adult"))
    postings = build_postings(docs)
    return search_query(postings,
                        "data (gblang:de OR gbcountry:fr) gbisadult:0",
                        k=50, doc_meta=meta)


def _q1_meta_fields_oracle() -> str:
    """DuckDB recomputes every dimension from first principles: the
    Lang.cpp abbr table as a VALUES join (zh → zh_cn per the detector
    alias), the country guess from the code table + label extracts
    (doc_country_id pattern), the adult points from the needle CASE."""
    from .functions.country import COUNTRY_CODES, COUNTRY_ID
    from .functions.langcodes import LANG_ABBR, LANG_ID
    lang_values = ", ".join(
        f"('{a}', {i})" for i, a in enumerate(LANG_ABBR) if i)
    lang_values += f", ('zh', {LANG_ID['zh_cn']})"
    cc_values = ", ".join(f"('{c}', {i})"
                          for i, c in enumerate(COUNTRY_CODES) if i)
    de_id = LANG_ID["de"]
    fr_cid = COUNTRY_ID["fr"]
    return f"""
WITH langmap(code, lid) AS (VALUES {lang_values}),
codes(cc, cid) AS (VALUES {cc_values}),
tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, COUNT(*) AS tf FROM tok WHERE term = 'data'
  GROUP BY doc_id
), u AS (
  SELECT doc_id, lang, lower(text || CASE
           WHEN doc_id % 11 = 0 THEN ' porn xxx'
           WHEN doc_id % 11 = 1 THEN ' nude escort'
           WHEN doc_id % 11 = 2 THEN ' sussex news'
           WHEN doc_id % 11 = 3 THEN ' adult smut'
           ELSE '' END) AS t,
         CASE CAST(doc_id % 6 AS INT)
           WHEN 0 THEN 'http://d' || doc_id || '.example/a'
           WHEN 1 THEN 'http://de.d' || doc_id || '.example/a'
           WHEN 2 THEN 'http://d' || doc_id || '.fr/a'
           WHEN 3 THEN 'http://d' || doc_id || '.co.jp/a'
           WHEN 4 THEN 'http://fr.d' || doc_id || '.co.uk/a'
           ELSE 'http://xx.d' || doc_id || '.info/a'
         END AS url
  FROM documents
), parts AS (
  SELECT doc_id, lang, t,
         regexp_extract(regexp_extract(url, '^[a-z]+://([^/:?]+)', 1),
                        '^([^.]{{2}})\\.', 1) AS first2,
         regexp_extract(regexp_extract(url, '^[a-z]+://([^/:?]+)', 1),
                        '\\.([^.]{{2}})$', 1) AS last2
  FROM u
), meta AS (
  SELECT p.doc_id,
         coalesce(lm.lid, 0) AS lang_id,
         coalesce(cp.cid, ct.cid, 0) AS country_id,
         (CASE WHEN position('porn' IN p.t) > 0 THEN 2 ELSE 0 END +
          CASE WHEN position('xxx' IN p.t) > 0 THEN 2 ELSE 0 END +
          CASE WHEN position('smut' IN p.t) > 0 THEN 2 ELSE 0 END +
          CASE WHEN position('erotic' IN p.t) > 0 THEN 2 ELSE 0 END +
          CASE WHEN position('escort' IN p.t) > 0 THEN 1 ELSE 0 END +
          CASE WHEN position('nude' IN p.t) > 0 THEN 1 ELSE 0 END +
          CASE WHEN position('adult' IN p.t) > 0 THEN 1 ELSE 0 END +
          CASE WHEN position('sex' IN p.t) > 0 THEN 1 ELSE 0 END +
          CASE WHEN position('adultery' IN p.t) > 0 THEN -1 ELSE 0 END +
          CASE WHEN position('sussex' IN p.t) > 0 THEN -1 ELSE 0 END +
          CASE WHEN position('essex' IN p.t) > 0 THEN -1 ELSE 0 END +
          CASE WHEN position('middlesex' IN p.t) > 0 THEN -1 ELSE 0 END
         ) AS pts
  FROM parts p
  LEFT JOIN langmap lm ON p.lang = lm.code
  LEFT JOIN codes cp ON p.first2 = cp.cc
  LEFT JOIN codes ct ON p.last2 = ct.cc
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(t.tf * 10 AS BIGINT) AS score
FROM tf t JOIN meta m ON m.doc_id = t.doc_id
WHERE (m.lang_id = {de_id} OR m.country_id = {fr_cid}) AND m.pts < 2
ORDER BY score DESC, doc_id
LIMIT 50
"""


_register("q1_meta_field_search", _q1_meta_fields, _q1_meta_fields_oracle())


def _q1_synonyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synonym expansion (Synonyms.cpp synsets; Conf::m_synonymWeight 0.9,
    Parms.cpp:4369-4374) fed by the DICTIONARY fixture — the
    Wiktionary.cpp analogue (fixtures/synsets/synsets.parquet via
    search.synsets.load_synsets): 'fast merge' where merge->{join,...}
    per the fixture — a doc scores the BEST form per term group, base
    tf*10 vs synonym tf*9, and EVERY query term is expanded through the
    dictionary like getSynSet runs per query word."""
    from .search.postings import build_postings
    from .search.queryparse import search_query
    from .search.synsets import load_synsets
    register_views(spark, sf_dir)
    postings = build_postings(spark.table("documents"))
    return search_query(postings, "fast merge", k=20,
                        synonyms=load_synsets())


_register("q1_synonym_search", _q1_synonyms, f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE length(term) > 0 GROUP BY term, doc_id
), syn AS (
  SELECT term, alt FROM '{_SYNSETS_PARQUET}'
), grp_fast AS (
  SELECT doc_id,
         MAX(CASE WHEN term = 'fast' THEN tf * 10 ELSE tf * 9 END) AS sp
  FROM postings
  WHERE term = 'fast'
     OR term IN (SELECT alt FROM syn WHERE syn.term = 'fast')
  GROUP BY doc_id
), grp_merge AS (
  SELECT doc_id,
         MAX(CASE WHEN term = 'merge' THEN tf * 10 ELSE tf * 9 END) AS sp
  FROM postings
  WHERE term = 'merge'
     OR term IN (SELECT alt FROM syn WHERE syn.term = 'merge')
  GROUP BY doc_id
)
SELECT CAST(f.doc_id AS BIGINT) AS doc_id,
       CAST(f.sp + m.sp AS BIGINT) AS score
FROM grp_fast f JOIN grp_merge m USING (doc_id)
ORDER BY score DESC, doc_id
LIMIT 20
""")


def _q1_fieldmatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gbfieldmatch:field:value (Query.cpp:1760-1825 FIELD_GBFIELDMATCH):
    exact case-SENSITIVE field-value equality intersected with a term."""
    from .search.postings import build_postings
    from .search.queryparse import search_query
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    postings = build_postings(docs)
    return search_query(postings, "data gbfieldmatch:source:src3", k=50,
                        doc_meta=docs.select("doc_id", "source"))


_register("q1_fieldmatch", _q1_fieldmatch, """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, COUNT(*) AS tf FROM tok WHERE term = 'data'
  GROUP BY doc_id
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(t.tf * 10 AS BIGINT) AS score
FROM tf t JOIN documents d ON d.doc_id = t.doc_id
WHERE d.source = 'src3'
ORDER BY score DESC, doc_id
LIMIT 50
""")


def _q_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet tables (gbfacetstr family; XmlDoc_Indexing.cpp:844 facet
    hashing): value->count histograms of source and lang over every doc
    matching 'data' — tallied across the FULL match set, not the page."""
    from .search.facets import search_with_facets
    from .search.postings import build_postings
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    postings = build_postings(docs)
    _page, facets = search_with_facets(
        postings, "data", docs.select("doc_id", "source", "lang"),
        ["source", "lang"], k=10)
    return facets


_register("q_facet_counts", _q_facets, """
WITH hits AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
    FROM documents) WHERE term = 'data'
), u AS (
  SELECT 'source' AS field, d.source AS value
  FROM documents d JOIN hits h ON h.doc_id = d.doc_id
  UNION ALL
  SELECT 'lang' AS field, d.lang AS value
  FROM documents d JOIN hits h ON h.doc_id = d.doc_id
)
SELECT field, value, CAST(COUNT(*) AS BIGINT) AS count
FROM u GROUP BY field, value
ORDER BY field, count DESC, value
""")


def _q_facet_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed numeric facet (gbfacetint:field:a-b,... form) over
    n_chars for docs matching 'join'."""
    from .search.facets import facet_int_ranges
    from .search.postings import build_postings
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    postings = build_postings(docs)
    hits = postings.filter(F.col("term") == "join").select("doc_id")
    return facet_int_ranges(hits, docs.select("doc_id", "n_chars"),
                            "n_chars", [0, 200, 400, 800, 1600, 3200])


_register("q_facet_int_ranges", _q_facet_ranges, """
WITH hits AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
    FROM documents) WHERE term = 'join'
), b AS (
  SELECT CASE WHEN d.n_chars >= 0    AND d.n_chars < 200  THEN 0
              WHEN d.n_chars >= 200  AND d.n_chars < 400  THEN 200
              WHEN d.n_chars >= 400  AND d.n_chars < 800  THEN 400
              WHEN d.n_chars >= 800  AND d.n_chars < 1600 THEN 800
              WHEN d.n_chars >= 1600 AND d.n_chars < 3200 THEN 1600
         END AS range_lo,
         CASE WHEN d.n_chars >= 0    AND d.n_chars < 200  THEN 200
              WHEN d.n_chars >= 200  AND d.n_chars < 400  THEN 400
              WHEN d.n_chars >= 400  AND d.n_chars < 800  THEN 800
              WHEN d.n_chars >= 800  AND d.n_chars < 1600 THEN 1600
              WHEN d.n_chars >= 1600 AND d.n_chars < 3200 THEN 3200
         END AS range_hi
  FROM documents d JOIN hits h ON h.doc_id = d.doc_id
)
SELECT CAST(range_lo AS BIGINT) AS range_lo,
       CAST(range_hi AS BIGINT) AS range_hi,
       CAST(COUNT(*) AS BIGINT) AS count
FROM b WHERE range_lo IS NOT NULL
GROUP BY range_lo, range_hi
ORDER BY range_lo
""")


def _speller_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified popularity dictionary (Speller.cpp:66 generateDicts /
    Speller.cpp:469 getPhrasePopularity): distributed word-frequency
    count over the corpus."""
    from .search.speller import build_unified_dict
    register_views(spark, sf_dir)
    return (build_unified_dict(spark.table("documents"))
            .orderBy(F.desc("pop"), "word"))


_register("speller_unified_dict", _speller_dict, """
SELECT word, CAST(COUNT(*) AS BIGINT) AS pop FROM (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents)
WHERE length(word) > 0
GROUP BY word
ORDER BY pop DESC, word
""")


def _speller_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound-word splitting (Speller.cpp:553-770 canSplitWords /
    findNext): run-together strings built from each doc's first two
    tokens, split back against the corpus unified dict — the
    did-you-mean / adult-domain surface.  The backtracking kernel is not
    SQL-expressible; the oracle is the pytest-pinned golden."""
    from .search.speller import build_unified_dict, split_compounds
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    # bounded driver collect: top-N like the reference's numWordsToDump
    # (Speller.cpp:66) — the unified dict is a capped artifact by design
    dict_words = frozenset(
        r["word"] for r in build_unified_dict(docs,
                                              top_n=100_000).collect())
    compounds = docs.select(
        "doc_id",
        F.concat_ws("", F.slice(F.split(F.lower("text"), r"\s+"), 1, 2))
        .alias("compound"))
    return (split_compounds(compounds, "compound", dict_words)
            .select("doc_id", "compound", "can_split", "is_porn",
                    "split_words")
            .orderBy("doc_id"))


_register_golden("speller_split_compounds", _speller_split, "doc_id")


def _q2_hashgroups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashgroup-weighted ranking (Posdb.h:70-86; PosdbTable.cpp:564-575
    s_hashGroupWeights; Parms.cpp:4234-4364 defaults — title 8x, heading
    1.5x, body 1x, integer-exact at x10): deterministic regions carved
    from each doc (title = tokens 1-4, heading = 5-7, body = rest), then
    the PRODUCTION region-postings build + weighted AND search."""
    from .search.hashgroups import (build_postings_by_region,
                                    search_weighted)
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.lower("text"), r"\s+")
    regions = (docs.select(
        "doc_id", F.lit("title").alias("hashgroup"),
        F.array_join(F.slice(toks, 1, 4), " ").alias("text"))
        .unionByName(docs.select(
            "doc_id", F.lit("heading").alias("hashgroup"),
            F.array_join(F.slice(toks, 5, 3), " ").alias("text")))
        .unionByName(docs.select(
            "doc_id", F.lit("body").alias("hashgroup"),
            F.array_join(F.slice(toks, 8, F.size(toks)), " ")
            .alias("text"))))
    hg = build_postings_by_region(regions)
    return search_weighted(hg, ["data", "join"], k=25)


_register("q2_hashgroup_weights", _q2_hashgroups, """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), regions AS (
  SELECT doc_id, 'title' AS hashgroup,
         unnest(list_slice(t, 1, 4)) AS term FROM toks
  UNION ALL
  SELECT doc_id, 'heading', unnest(list_slice(t, 5, 7)) FROM toks
  UNION ALL
  SELECT doc_id, 'body', unnest(list_slice(t, 8, len(t))) FROM toks
), hg AS (
  SELECT term, doc_id, hashgroup, COUNT(*) AS tf
  FROM regions WHERE length(term) > 0
  GROUP BY term, doc_id, hashgroup
), scored AS (
  SELECT term, doc_id,
         SUM(tf * CASE hashgroup WHEN 'title' THEN 80
                                 WHEN 'heading' THEN 15
                                 ELSE 10 END) AS sp
  FROM hg WHERE term IN ('data', 'join') GROUP BY term, doc_id
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST(a.sp + b.sp AS BIGINT) AS score
FROM scored a JOIN scored b ON a.doc_id = b.doc_id
WHERE a.term = 'data' AND b.term = 'join'
ORDER BY score DESC, doc_id
LIMIT 25
""")


def _q2_termfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-termfreq weighting (getTermFreqWeight,
    PosdbTable.cpp:613-628; scale_linear defaults Parms.cpp:4138-4186:
    df-ratio [0,0.5] -> weight [0.5,1.0], integer-exact x1000): 'data'
    (in ~all docs, weight 1.0) AND 'dup' (rare, weight ~0.55) — the rare
    term's hits are deliberately DAMPED like the reference."""
    from .search.postings import build_postings, search_tfw
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    postings = build_postings(docs)
    return search_tfw(postings, ["data", "dup"], docs.count(), k=25)


_register("q2_termfreq_weight", _q2_termfreq, """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE length(term) > 0 GROUP BY term, doc_id
), n AS (SELECT COUNT(*) AS c FROM documents),
w AS (
  SELECT term,
         500 + LEAST(500, (1000 * COUNT(DISTINCT doc_id))
                          // (SELECT c FROM n)) AS w1000
  FROM postings WHERE term IN ('data', 'dup') GROUP BY term
), scored AS (
  SELECT p.term, p.doc_id, p.tf * 10 * w.w1000 AS s
  FROM postings p JOIN w ON w.term = p.term
  WHERE p.term IN ('data', 'dup')
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST(a.s + b.s AS BIGINT) AS score
FROM scored a JOIN scored b ON a.doc_id = b.doc_id
WHERE a.term = 'data' AND b.term = 'dup'
ORDER BY score DESC, doc_id
LIMIT 25
""")


def _q1_phrase_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexed-bigram phrase path (Phrases.h:3-6: the reference hashes
    every 2-word phrase into the term table, so a quoted pair is ONE
    termlist): same query as q1_phrase_search, answered from the bigram
    index instead of the positions join — results must be identical."""
    from .search.postings import build_bigram_postings, build_postings
    from .search.queryparse import search_query
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    return search_query(build_postings(docs), '"hash join"', k=10,
                        bigrams=build_bigram_postings(docs))


_register("q1_phrase_bigram", _q1_phrase_bigram, """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term,
         generate_subscripts(string_split(lower(text), ' '), 1) - 1 AS pos
  FROM documents
), a AS (SELECT doc_id, pos FROM tok WHERE term = 'hash'),
b AS (SELECT doc_id, pos FROM tok WHERE term = 'join'),
p AS (
  SELECT a.doc_id, COUNT(*) AS ptf
  FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY a.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(ptf * 10 * 2 + 50 AS BIGINT) AS score
FROM p
ORDER BY score DESC, doc_id
LIMIT 10
""")


def _reindex_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-based reindex (PageReindex.cpp:224-426 Msg1c::reindexQuery):
    'data join' through the production Q1 executor -> one spider request
    per matching docid with the reference's synthetic firstIp
    ((docId>>6)&0xff domain-hash bits, 0->1) and flag set."""
    from .pipeline.reindex import reindex_query
    from .search.postings import build_postings
    register_views(spark, sf_dir)
    postings = build_postings(spark.table("documents"))
    return (reindex_query(postings, "data join", now=1700000000)
            .orderBy("uh48"))


_register("reindex_query_requests", _reindex_query, """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), hits AS (
  SELECT DISTINCT a.doc_id
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id
  WHERE a.term = 'data' AND b.term = 'join'
)
SELECT CAST(doc_id AS BIGINT) AS uh48,
       CAST(doc_id AS VARCHAR) AS url,
       CAST(CASE WHEN (doc_id // 64) % 256 = 0 THEN 1
                 ELSE (doc_id // 64) % 256 END AS BIGINT) AS first_ip,
       -1 AS hop_count,
       1700000000 AS added_time,
       TRUE AS is_page_reindex,
       TRUE AS url_is_doc_id,
       TRUE AS fake_first_ip,
       FALSE AS force_delete
FROM hits
ORDER BY uh48
""")


def _q_cached_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached-page serving with highlight (PageGet.cpp titleRec get +
    Highlight.cpp gbcnstNN term spans): every doc matching 'data join'
    served from the titledb analogue with both terms highlighted."""
    from .search.cached import cached_page, highlight, is_no_archive
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    hits = (docs.filter(F.col("text").rlike(r"(?i)\bdata\b"))
            .filter(F.col("text").rlike(r"(?i)\bjoin\b"))
            .select("doc_id", "text"))
    na = is_no_archive(F.col("text"))
    return (hits.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(na, F.lit(None))
        .otherwise(highlight(F.col("text"), ["data", "join"]))
        .alias("content"),
        na.alias("no_archive"))
        .orderBy("doc_id"))


_register("q_cached_pages_highlight", _q_cached_pages, r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       regexp_replace(
         regexp_replace(text, '(?i)\b(data)\b',
                        '<span class=''gbcnst00''>\1</span>', 'g'),
         '(?i)\b(join)\b',
         '<span class=''gbcnst01''>\1</span>', 'g') AS content,
       FALSE AS no_archive
FROM documents
WHERE regexp_matches(text, '(?i)\bdata\b')
  AND regexp_matches(text, '(?i)\bjoin\b')
ORDER BY doc_id
""")


def _q2_posdb_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Posdb ranking pipeline (PosdbTable.cpp): rank-carrying
    index build (wordpos/density/diversity/wordspam, XmlDoc.cpp:21133,
    21226, 21305, 20674) + the min-term-pair sliding-window scorer with
    title sub-outs, siterank and same-language multipliers
    (PosdbTable.cpp:4096-4430).  Documents are wrapped into
    deterministic HTML (title = tokens 1-4, h1 = 5-7, body = rest) so
    hashgroups, sentences and word positions are all exercised."""
    from .search.posdbrank import (build_posdb_index, posdb_rank_search,
                                   posdb_rank_search_capped)
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.lower("text"), r"\s+")
    html = F.concat(
        F.lit("<html><head><title>"),
        F.array_join(F.slice(toks, 1, 4), " "),
        F.lit("</title></head><body><h1>"),
        F.array_join(F.slice(toks, 5, 3), " "),
        F.lit("</h1><p>"),
        F.array_join(F.slice(toks, 8, F.size(toks)), " "),
        F.lit(".</p></body></html>"))
    hdocs = docs.select(
        "doc_id", html.alias("content"),
        (F.col("doc_id") % 10).cast("int").alias("site_rank"),
        "lang")
    idx = build_posdb_index(hdocs)
    n_docs = docs.count()
    if _plan_lazy():
        # audit mode: the full-scan plan (groupBy + applyInPandas) stays
        # visible; the capped path is eager and would truncate it
        out = posdb_rank_search(idx, hdocs, ["data", "join"],
                                num_docs=n_docs, k=25, qlang="en")
    else:
        # production route (VERDICT r4 item 5): the admissible-bound
        # two-phase ranker — kernel runs over ~candidate_cap docs, not
        # the whole match set; proven result-equal to the full scan
        out = posdb_rank_search_capped(idx, hdocs, ["data", "join"],
                                       num_docs=n_docs, k=25,
                                       candidate_cap=100, qlang="en")
    return (out.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.round("score", 6).alias("score"))
            .orderBy("doc_id"))


_register_golden("q2_posdb_rank_topk", _q2_posdb_rank, "doc_id")


def _q2_posdb_synonym_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posdb ranking with the QueryTermInfo synonym sublist mini-merge
    (PosdbTable.cpp:929-932 0.9 weight per synonym occurrence) fed by
    the DICTIONARY fixture (Wiktionary.cpp analogue,
    search.synsets.load_synsets): 'data merge' where the fixture expands
    merge->{join,...} — a doc matches term 2 through ANY form and
    synonym occurrences score at 0.9."""
    from .search.posdbrank import (build_posdb_index, posdb_rank_search,
                                   posdb_rank_search_capped)
    from .search.synsets import load_synsets
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.lower("text"), r"\s+")
    html = F.concat(
        F.lit("<html><head><title>"),
        F.array_join(F.slice(toks, 1, 4), " "),
        F.lit("</title></head><body><h1>"),
        F.array_join(F.slice(toks, 5, 3), " "),
        F.lit("</h1><p>"),
        F.array_join(F.slice(toks, 8, F.size(toks)), " "),
        F.lit(".</p></body></html>"))
    hdocs = docs.select(
        "doc_id", html.alias("content"),
        (F.col("doc_id") % 10).cast("int").alias("site_rank"),
        "lang")
    idx = build_posdb_index(hdocs)
    n_docs = docs.count()
    syn = {t: list(a) for t, a in load_synsets().items()}
    if _plan_lazy():
        out = posdb_rank_search(idx, hdocs, ["data", "merge"],
                                num_docs=n_docs, k=25, qlang="en",
                                synonyms=syn)
    else:
        # capped production route (r5): synonym forms share the base
        # term's group in the bound; result-equal to the full scan
        out = posdb_rank_search_capped(idx, hdocs, ["data", "merge"],
                                       num_docs=n_docs, k=25,
                                       candidate_cap=100, qlang="en",
                                       synonyms=syn)
    return (out.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.round("score", 6).alias("score"))
            .orderBy("doc_id"))


_register_golden("q2_posdb_synonym_rank", _q2_posdb_synonym_rank, "doc_id")


def _text_site_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-templated boilerplate removal (Sections.cpp tag-path hashing
    + sectiondb SectionVote, Sections.h:282-298): docs of one source
    share a nav section; the vote flags it and the strip removes it
    while unique body text survives.  The training-pipeline use of the
    reference's SEC_DUP machinery."""
    from .functions.sections import (build_sections, site_dup_sections,
                                     strip_site_boilerplate)
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    html = F.concat(
        F.lit('<html><body><div class="nav">site menu '),
        F.col("source"),
        F.lit(' home products</div><div class="main"><p>'),
        F.col("text"),
        F.lit("</p></div></body></html>"))
    hdocs = docs.select("doc_id", html.alias("content"),
                        F.col("source").alias("site"))
    secs = build_sections(hdocs)
    dup = site_dup_sections(secs, min_docs=2)
    out = strip_site_boilerplate(hdocs, dup, sections=secs)
    return (out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.substring("text", 1, 48).alias("text_head"),
        F.col("n_sections").cast("int").alias("n_sections"),
        F.col("n_boilerplate").cast("int").alias("n_boilerplate"))
        .orderBy("doc_id"))


_register_golden("text_site_boilerplate", _text_site_boilerplate, "doc_id")


def _q_json_field_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON document field indexing (Json.cpp + hashJSONFields2,
    XmlDoc_Indexing.cpp:2805-2918): docs wrapped into deterministic
    JSON (title = first 4 tokens, meta.source, body, plus the skipped
    diffbot html field), flattened to compound-name field postings, and
    searched as title:data AND title:row with hashgroup-weighted tf
    (title = x80).  The oracle recomputes the same result from the raw
    columns — a true cross-engine check."""
    from .search.jsonfields import build_json_postings, search_json_field
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.lower("text"), r"\s+")
    js = F.concat(
        F.lit('{"title": "'), F.array_join(F.slice(toks, 1, 4), " "),
        F.lit('", "meta": {"source": "'), F.col("source"),
        F.lit('"}, "body": "'), F.lower("text"),
        F.lit('", "html": "ignored"}'))
    jdocs = docs.select("doc_id", js.alias("json"))
    p = build_json_postings(jdocs)
    return search_json_field(p, "title", ["data", "row"], k=10)


_register("q_json_field_search", _q_json_field_search, """
WITH toks AS (
  SELECT doc_id, list_slice(string_split(lower(text), ' '), 1, 4) AS t
  FROM documents
), cnt AS (
  SELECT doc_id,
         len(list_filter(t, x -> x = 'data')) AS c1,
         len(list_filter(t, x -> x = 'row'))  AS c2
  FROM toks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(80 * (c1 + c2) AS BIGINT) AS score
FROM cnt WHERE c1 > 0 AND c2 > 0
ORDER BY score DESC, doc_id
LIMIT 10
""")


def _q1_phrase_posdb_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parsed quoted-phrase query through the FULL Posdb ranker: the
    quoted pair must appear at query spacing (m_quotedStartIds gate,
    PosdbTable.cpp:787-838 + 1505-1521) and survivors carry the
    min-term-pair score."""
    from .search.posdbrank import build_posdb_index, parsed_rank_search
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.lower("text"), r"\s+")
    html = F.concat(
        F.lit("<html><head><title>"),
        F.array_join(F.slice(toks, 1, 4), " "),
        F.lit("</title></head><body><p>"),
        F.array_join(F.slice(toks, 5, F.size(toks)), " "),
        F.lit(".</p></body></html>"))
    hdocs = docs.select(
        "doc_id", html.alias("content"),
        (F.col("doc_id") % 10).cast("int").alias("site_rank"), "lang")
    idx = build_posdb_index(hdocs)
    out = parsed_rank_search(idx, hdocs, '"data join"',
                             num_docs=docs.count(), k=25, qlang="en",
                             capped=not _plan_lazy())
    return (out.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.round("score", 6).alias("score"))
            .orderBy("doc_id"))


_register_golden("q1_phrase_posdb_rank", _q1_phrase_posdb_rank, "doc_id")


def _q2_wiki_phrase_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wiki-phrase query weighting through the FULL Posdb ranker: the
    ENCYCLOPEDIA-TITLE fixture (Wiki.cpp:29-167 wikititles load,
    search.wikiphrases.load_wiki_titles) marks the query run 'hash
    table' as one wiki phrase (Wiki::getNumWordsInWikiPhrase,
    Wiki.cpp:175 greedy longest run), so that pair targets its QUERY
    spacing and is scored as a unit while 'scan' stays independent
    (PosdbTable.cpp m_wikiPhraseIds handling)."""
    from .search.posdbrank import build_posdb_index, parsed_rank_search
    from .search.wikiphrases import load_wiki_titles
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.lower("text"), r"\s+")
    html = F.concat(
        F.lit("<html><head><title>"),
        F.array_join(F.slice(toks, 1, 4), " "),
        F.lit("</title></head><body><p>"),
        F.array_join(F.slice(toks, 5, F.size(toks)), " "),
        F.lit(".</p></body></html>"))
    hdocs = docs.select(
        "doc_id", html.alias("content"),
        (F.col("doc_id") % 10).cast("int").alias("site_rank"), "lang")
    idx = build_posdb_index(hdocs)
    out = parsed_rank_search(idx, hdocs, "hash table scan",
                             num_docs=docs.count(), k=25, qlang="en",
                             wiki_titles=load_wiki_titles(),
                             capped=not _plan_lazy())
    return (out.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.round("score", 6).alias("score"))
            .orderBy("doc_id"))


_register_golden("q2_wiki_phrase_rank", _q2_wiki_phrase_rank, "doc_id")


def _q_thumbnail_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail candidate selection (Images.cpp:118-230): blacklist
    substrings, <50px declared dims, domain validity, the site-reuse
    vote (gbimage uniqueness), first-in-document-order pick.  Media
    rows are synthesized deterministically per doc; the oracle
    recomputes every rule in SQL."""
    from .functions.images import image_candidates, select_thumbnails
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    base = F.concat(F.lit("http://img."), F.col("source"),
                    F.lit(".example/"))
    did = F.col("doc_id").cast("string")

    def mk(url, order, w, h):
        return docs.select(
            "doc_id", F.col("source").alias("site"),
            url.alias("img_url"), F.lit(order).alias("img_order"),
            F.lit(w).cast("int").alias("width"),
            F.lit(h).cast("int").alias("height"))

    media = (mk(F.concat(base, F.lit("logo_"), did, F.lit(".jpg")), 0,
                None, None)
             .unionByName(mk(F.concat(base, F.lit("small_"), did,
                                      F.lit(".jpg")), 1, 32, 32))
             .unionByName(mk(F.concat(base, F.lit("shared.jpg")), 2,
                             None, None))
             .unionByName(mk(F.concat(base, F.lit("photo_"), did,
                                      F.lit(".jpg")), 3, 640, 480)))
    out = select_thumbnails(image_candidates(media))
    return (out.select(F.col("doc_id").cast("long").alias("doc_id"),
                       "thumbnail")
            .orderBy("doc_id"))


_register("q_thumbnail_select", _q_thumbnail_select, r"""
WITH media AS (
  SELECT doc_id, source AS site,
         'http://img.' || source || '.example/logo_' || doc_id || '.jpg'
           AS img_url, 0 AS o, NULL::INT AS w, NULL::INT AS h
  FROM documents
  UNION ALL
  SELECT doc_id, source,
         'http://img.' || source || '.example/small_' || doc_id || '.jpg',
         1, 32, 32 FROM documents
  UNION ALL
  SELECT doc_id, source,
         'http://img.' || source || '.example/shared.jpg',
         2, NULL, NULL FROM documents
  UNION ALL
  SELECT doc_id, source,
         'http://img.' || source || '.example/photo_' || doc_id || '.jpg',
         3, 640, 480 FROM documents
), cand AS (
  SELECT * FROM media
  WHERE (w IS NULL OR w >= 50) AND (h IS NULL OR h >= 50)
    AND regexp_matches(img_url, '^https?://[^/]+\.[^/]+/')
    AND NOT contains(lower(img_url), 'logo')
    AND NOT contains(lower(img_url), 'comment')
    AND NOT contains(lower(img_url), 'print')
    AND NOT contains(lower(img_url), 'subscribe')
    AND NOT contains(lower(img_url), 'header')
    AND NOT contains(lower(img_url), 'footer')
    AND NOT contains(lower(img_url), 'menu')
    AND NOT contains(lower(img_url), 'button')
    AND NOT contains(lower(img_url), 'banner')
    AND NOT contains(lower(img_url), 'ad.doubleclick.')
    AND NOT contains(lower(img_url), 'ads.webfeat.')
    AND NOT contains(lower(img_url), 'xads.zedo.')
), reused AS (
  SELECT site, img_url FROM cand
  GROUP BY site, img_url HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
       arg_min(c.img_url, c.o) AS thumbnail
FROM cand c
LEFT JOIN reused r ON c.site = r.site AND c.img_url = r.img_url
WHERE r.img_url IS NULL
GROUP BY c.doc_id
ORDER BY doc_id
""")


# ---------------------------------------------------------------------------
# Link-spam tier (linkspam.cpp isLinkSpam — Linkdb vote suppression)
# ---------------------------------------------------------------------------
def _linkspam_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic linker-URL shapes cycling the URL-level spam rungs
    (TLD bans, guestbook hostnames, CGI, the path-needle ladder)."""
    from .functions.linkspam import url_spam_note_col
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    d = F.col("doc_id")
    url = (F.when(d % 8 == 0, F.format_string(
               "http://d%d.x.example/ok/page.html", d))
           .when(d % 8 == 1, F.format_string("http://d%d.info/a", d))
           .when(d % 8 == 2, F.format_string("http://d%d.biz/a", d))
           .when(d % 8 == 3, F.format_string(
               "http://guestbook.d%d.example/a", d))
           .when(d % 8 == 4, F.format_string("http://d%d.example/a?x=1", d))
           .when(d % 8 == 5, F.format_string("http://d%d.example/guest/p", d))
           .when(d % 8 == 6, F.format_string(
               "http://d%d.example/linkexchange/p", d))
           .otherwise(F.format_string(
               "http://d%d.example/blog/trackbacks-not/p", d)))
    return (docs.withColumn("url", url)
            .withColumn("note", url_spam_note_col("url"))
            .select("doc_id", "url", "note").orderBy("doc_id"))


def _linkspam_url_oracle() -> str:
    """DuckDB genuinely recomputes the ladder from string ops — a true
    cross-engine oracle (same rung order as linkspam.cpp:650-741)."""
    from .functions.linkspam import PATH_NEEDLES
    rungs = "\n".join(
        f"    WHEN length(path) > 1 AND contains(path, '{needle}') "
        f"THEN '{note}'" for needle, note in PATH_NEEDLES)
    return f"""
WITH u AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE CAST(doc_id % 8 AS INT)
           WHEN 0 THEN 'http://d' || doc_id || '.x.example/ok/page.html'
           WHEN 1 THEN 'http://d' || doc_id || '.info/a'
           WHEN 2 THEN 'http://d' || doc_id || '.biz/a'
           WHEN 3 THEN 'http://guestbook.d' || doc_id || '.example/a'
           WHEN 4 THEN 'http://d' || doc_id || '.example/a?x=1'
           WHEN 5 THEN 'http://d' || doc_id || '.example/guest/p'
           WHEN 6 THEN 'http://d' || doc_id || '.example/linkexchange/p'
           ELSE 'http://d' || doc_id || '.example/blog/trackbacks-not/p'
         END AS url
  FROM documents
), parts AS (
  SELECT doc_id, url,
         regexp_extract(url, '^[a-z]+://([^/:?]+)', 1) AS host,
         lower(regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1)) AS path
  FROM u
), parts2 AS (
  SELECT *, regexp_extract(host, '\\.([^.]+)$', 1) AS tld,
         substr(host, 1, length(host)
                - length(regexp_extract(host, '([^.]+\\.[^.]+)$', 1)))
           AS sub
  FROM parts
)
SELECT doc_id, url,
  CASE
    WHEN tld = 'info' THEN '.info tld'
    WHEN tld = 'biz' THEN '.biz tld'
    WHEN length(sub) > 0 AND length(sub) < 30
         AND contains(sub, 'guestbook') THEN 'guestbook in hostname'
    WHEN contains(url, '?') THEN 'path is cgi'
{rungs}
  END AS note
FROM parts2 ORDER BY doc_id
"""


def _linkspam_votes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-outlink isLinkSpam verdicts (the mapInPandas operator)
    over deterministic linker pages cycling the content rungs: clean
    text, comment-section markers before/after the link, needle phrases,
    bare link chains, post forms."""
    from .graph.spamvotes import link_spam_votes_df
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    d = F.col("doc_id")
    link = F.format_string(
        '<a href="http://t%d.example/p.html">t</a>', d)
    clean = F.concat(F.lit("<p>alpha text before "), link,
                     F.lit(" alpha text after</p>"))
    html = (F.when(d % 6 == 0, clean)
            .when(d % 6 == 1, F.concat(
                F.lit('<div class="comment">c</div>'), clean))
            .when(d % 6 == 2, F.concat(
                clean, F.lit('<div class="comment">c</div>')))
            .when(d % 6 == 3, F.concat(F.lit("<div>"), link,
                                       F.lit("</div>")))
            .when(d % 6 == 4, F.concat(
                clean, F.lit("<p>please add your url</p>")))
            .otherwise(F.concat(
                clean, F.lit('<textarea name=c></textarea>'
                             '<input type="submit" value="s">'))))
    page_url = (F.when(d % 12 == 7, F.format_string("http://d%d.info/a.html", d))
                .otherwise(F.format_string("http://d%d.example/a.html", d)))
    docs = docs.select(
        "doc_id", page_url.alias("url"),
        F.array(F.struct(F.lit("text").alias("kind"), html.alias("text"),
                         F.lit(None).cast("string").alias("media_ref"),
                         F.lit(0).alias("offset"))).alias("spans"))
    return (link_spam_votes_df(docs)
            .select("doc_id", "url_norm", "is_spam", "note")
            .orderBy("doc_id", "url_norm"))


_register("linkspam_url_rules", _linkspam_urls, _linkspam_url_oracle())
_register_golden("linkspam_votes", _linkspam_votes_q, "doc_id, url_norm")


# ---------------------------------------------------------------------------
# Country identification (XmlDoc::getCountryId → guessCountryTLD)
# ---------------------------------------------------------------------------
def _doc_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Country ids over deterministic URL shapes cycling the guess rules:
    2-letter first-label wins, else ccTLD, else 0 — the production
    pure-Catalyst expression (``country_id_col``)."""
    from .functions.country import country_id_col
    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    d = F.col("doc_id")
    url = (F.when(d % 6 == 0, F.format_string("http://d%d.example/a", d))
           .when(d % 6 == 1, F.format_string("http://de.d%d.example/a", d))
           .when(d % 6 == 2, F.format_string("http://d%d.fr/a", d))
           .when(d % 6 == 3, F.format_string("http://d%d.co.jp/a", d))
           .when(d % 6 == 4, F.format_string("http://fr.d%d.co.uk/a", d))
           .otherwise(F.format_string("http://xx.d%d.info/a", d)))
    return (docs.withColumn("url", url)
            .withColumn("country_id", country_id_col("url"))
            .select("doc_id", "url", "country_id").orderBy("doc_id"))


def _doc_country_oracle() -> str:
    """DuckDB recomputes the guess from the code table (a VALUES CTE in
    the reference's exact order) + the same label extracts."""
    from .functions.country import COUNTRY_CODES
    values = ", ".join(f"('{c}', {i})"
                       for i, c in enumerate(COUNTRY_CODES) if i)
    return f"""
WITH codes(cc, cid) AS (VALUES {values}),
u AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE CAST(doc_id % 6 AS INT)
           WHEN 0 THEN 'http://d' || doc_id || '.example/a'
           WHEN 1 THEN 'http://de.d' || doc_id || '.example/a'
           WHEN 2 THEN 'http://d' || doc_id || '.fr/a'
           WHEN 3 THEN 'http://d' || doc_id || '.co.jp/a'
           WHEN 4 THEN 'http://fr.d' || doc_id || '.co.uk/a'
           ELSE 'http://xx.d' || doc_id || '.info/a'
         END AS url
  FROM documents
), parts AS (
  SELECT doc_id, url,
         regexp_extract(regexp_extract(url, '^[a-z]+://([^/:?]+)', 1),
                        '^([^.]{{2}})\\.', 1) AS first2,
         regexp_extract(regexp_extract(url, '^[a-z]+://([^/:?]+)', 1),
                        '\\.([^.]{{2}})$', 1) AS last2
  FROM u
)
SELECT p.doc_id, p.url,
       CAST(coalesce(cp.cid, ct.cid, 0) AS INT) AS country_id
FROM parts p
LEFT JOIN codes cp ON p.first2 = cp.cc
LEFT JOIN codes ct ON p.last2 = ct.cc
ORDER BY p.doc_id
"""


_register("doc_country_id", _doc_country, _doc_country_oracle())


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk, GPT-style): tokenized docs joined
# by EOS into per-source streams, cut into fixed context windows.  The
# Spark side is the PRODUCTION two-pass range-sharded prefix sum; the
# oracle recomputes with one plain window per source.
# ---------------------------------------------------------------------------
def _pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training.packing import pack_sequences
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    return (pack_sequences(docs, context_len=512, group_col="source")
            .orderBy("group", "chunk_id", "doc_id"))


_register("training_pack_sequences", _pack_sequences, """
WITH toks AS (
  SELECT source AS grp, CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(string_split(trim(text), ' ')) + 1 AS BIGINT)
           AS n_tokens
  FROM documents
), placed AS (
  SELECT grp, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY grp ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS tok_offset
  FROM toks
), chunks AS (
  SELECT grp, doc_id, n_tokens, tok_offset,
         unnest(generate_series(
           CAST(tok_offset // 512 AS BIGINT),
           CAST((tok_offset + n_tokens - 1) // 512 AS BIGINT)))
           AS chunk_id
  FROM placed
)
SELECT grp AS "group", doc_id, n_tokens, CAST(chunk_id AS BIGINT)
         AS chunk_id,
       CAST(GREATEST(chunk_id * 512 - tok_offset, 0) AS BIGINT) AS tok_start,
       CAST(LEAST(chunk_id * 512 + 512 - tok_offset, n_tokens) AS BIGINT)
         AS tok_end
FROM chunks
ORDER BY "group", chunk_id, doc_id
""")


# ---------------------------------------------------------------------------
# Sections.cpp sentence machine (addSentences, Sections.cpp:1460-1780)
# over the Words.cpp token stream, with the Abbreviations.cpp table.
# Synthetic inputs cycle the break-rule families; the oracle pins the
# hand-derived sentence lists as literal arrays.
# ---------------------------------------------------------------------------
_SENT_CASES = [
    "First one. Second one.",
    "visit example.com today. Next one",
    "Winter hours Oct. 15 start early. Next",
    "open 9 am. Monday we close",
    "<p>First para</p><p>Second para</p>",
    "1. library name",
]
_SENT_EXPECT = [
    ["First one", "Second one"],
    ["visit example.com today", "Next one"],
    ["Winter hours Oct. 15 start early", "Next"],
    ["open 9 am", "Monday we close"],
    ["First para", "Second para"],
    ["1. library name"],
]


def _sentence_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION sentence kernel (sentences_batch, Arrow-batched
    pandas_udf) — one row per sentence with its position."""
    from pyspark.sql.functions import pandas_udf

    from .functions.sentences import sentences_batch
    register_views(spark, sf_dir)

    @pandas_udf("array<string>")
    def _seg(texts):
        return sentences_batch(texts, has_tags=True)

    docs = spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    txt = F.element_at(F.array(*[F.lit(t) for t in _SENT_CASES]),
                       (F.col("doc_id") % 6 + 1).cast("int"))
    return (docs.withColumn("_s", _seg(txt))
            .select("doc_id", F.posexplode("_s").alias("sent_no", "sent"))
            .orderBy("doc_id", "sent_no"))


def _sentence_segment_oracle() -> str:
    rows = ", ".join(
        f"({k}, {n}, '{s}')"
        for k, sents in enumerate(_SENT_EXPECT)
        for n, s in enumerate(sents))
    return f"""
WITH expect(k, sent_no, sent) AS (VALUES {rows})
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(e.sent_no AS INT) AS sent_no,
       e.sent AS sent
FROM documents d
JOIN expect e ON e.k = CAST(d.doc_id % 6 AS INT)
ORDER BY d.doc_id, e.sent_no
"""


_register("text_sentence_segment", _sentence_segment,
          _sentence_segment_oracle())


# ---------------------------------------------------------------------------
# Statsdb per-second stat buckets (Statsdb.cpp:244-420 addStat): each op
# spread across the one-second buckets it overlaps, weighted by the
# fraction of its duration inside each (integer-exact ppm form).
# ---------------------------------------------------------------------------
def _statsdb_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION add_stats aggregate over ops derived from events:
    label = event_type, op window = [ts, ts + event_id % 4500 ms]
    (zero-duration ops exercise the t2++ rule), value = round(100x)."""
    from .pipeline.statsdb import add_stats
    register_views(spark, sf_dir)
    ev = spark.table("events")
    # ts is TIMESTAMP_NTZ: epoch ms via tz-free timestampdiff (matches
    # DuckDB's epoch_ms on the naive value regardless of session tz)
    t1 = F.expr(
        "timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01', ts)")
    ops = ev.select(
        F.col("event_type").alias("label"),
        t1.alias("t1_ms"),
        (t1 + F.col("event_id") % 4500).alias("t2_ms"),
        F.round(F.col("value") * 100).cast("long").alias("value"))
    return add_stats(ops).orderBy("label", "t_sec")


_register("statsdb_second_buckets", _statsdb_buckets, """
WITH ops AS (
  SELECT event_type AS label,
         CAST(epoch_ms(ts) AS BIGINT) AS t1,
         CAST(epoch_ms(ts) AS BIGINT)
           + CAST(event_id % 4500 AS BIGINT) AS t2r,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
), bumped AS (
  SELECT label, t1,
         CASE WHEN t2r = t1 THEN t1 + 1 ELSE t2r END AS t2, v
  FROM ops
), bounded AS (
  SELECT label, t1, t2, v, t2 - t1 AS dt
  FROM bumped WHERE t2 - t1 > 0 AND t2 - t1 < 30000
), buckets AS (
  SELECT label, t1, t2, v, dt,
         unnest(generate_series(t1 // 1000, (t2 - 1) // 1000)) AS t_sec
  FROM bounded
), contrib AS (
  SELECT label, t_sec, v, dt,
         LEAST(t2, (t_sec + 1) * 1000)
           - GREATEST(t1, t_sec * 1000) AS ov
  FROM buckets
)
SELECT label, CAST(t_sec AS BIGINT) AS t_sec,
       CAST(SUM(ov * 1000000 // dt) AS BIGINT) AS total_ops_ppm,
       CAST(SUM(v * ov * 1000000 // dt) AS BIGINT) AS total_quantity_ppm,
       CAST(SUM(ov) AS BIGINT) AS total_time_ms
FROM contrib
GROUP BY label, t_sec
ORDER BY label, t_sec
""")


# ---------------------------------------------------------------------------
# Words.cpp segmentation (addWords, Words.cpp:210-430): the tokenizer
# every reference indexing path sits on.  Synthetic inputs cycle the
# rule families (suffix exceptions, digit grouping, apostrophe latch,
# tag tokens, bare '<'); the oracle pins the hand-derived expected
# token sequences as literal arrays.
# ---------------------------------------------------------------------------
_WORDS_CASES = [
    "foo, bar!",
    "java++ and c# win",
    "1,000,000.50 units",
    "we're dave's o'clock",
    "<p>hi <b>x</b></p>",
    "price < 5 today",
]
_WORDS_EXPECT = [
    ["foo", "bar"],
    ["java++", "and", "c#", "win"],
    ["1,000,000.50", "units"],
    ["we're", "dave's", "o'clock"],
    ["hi", "x"],
    ["price", "5", "today"],
]


def _words_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION segmenter (words_batch via Arrow-batched
    pandas_udf) over per-doc synthetic texts; one row per token with its
    position."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    from .functions.words import words_batch
    register_views(spark, sf_dir)

    @pandas_udf("array<string>")
    def _seg(texts):
        return words_batch(texts, has_tags=True)

    docs = spark.table("documents").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    txt = F.element_at(F.array(*[F.lit(t) for t in _WORDS_CASES]),
                       (F.col("doc_id") % 6 + 1).cast("int"))
    return (docs.withColumn("_w", _seg(txt))
            .select("doc_id", F.posexplode("_w").alias("word_no", "word"))
            .orderBy("doc_id", "word_no"))


def _words_segment_oracle() -> str:
    rows = ", ".join(
        f"({k}, {n}, '{w.replace(chr(39), chr(39) * 2)}')"
        for k, words in enumerate(_WORDS_EXPECT)
        for n, w in enumerate(words))
    return f"""
WITH expect(k, word_no, word) AS (VALUES {rows})
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(e.word_no AS INT) AS word_no,
       e.word AS word
FROM documents d
JOIN expect e ON e.k = CAST(d.doc_id % 6 AS INT)
ORDER BY d.doc_id, e.word_no
"""


_register("words_segment_tokens", _words_segment, _words_segment_oracle())


# ---------------------------------------------------------------------------
# High-frequency term shortcuts (HighFrequencyTermShortcuts.cpp:15-22):
# stopword-frequency termlists are pre-truncated offline so a broad query
# never scans the full list.  Spark side = the production extract +
# substitution path; oracle recomputes both from raw documents.
# ---------------------------------------------------------------------------
def _q2_hf_shortcuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'data' is stopword-frequent in the fixture corpus (df ~ every
    doc), so the shortcut table truncates its termlist to the top 8
    postings (tf desc, doc_id asc) and the search only sees those."""
    from .search.hfterms import hf_term_shortcuts, search_with_shortcuts
    from .search.postings import build_postings
    register_views(spark, sf_dir)
    postings = build_postings(spark.table("documents"))
    shortcuts = hf_term_shortcuts(postings, min_df=50, top_n=8)
    return search_with_shortcuts(postings, shortcuts, ["data"], k=25)


_register("q2_hf_term_shortcuts", _q2_hf_shortcuts, """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE length(term) > 0 GROUP BY term, doc_id
), hf AS (
  SELECT term FROM postings GROUP BY term HAVING COUNT(*) > 50
), sub AS (
  SELECT term, doc_id, tf FROM (
    SELECT term, doc_id, tf,
           ROW_NUMBER() OVER (PARTITION BY term
                              ORDER BY tf DESC, doc_id) AS rn
    FROM postings WHERE term IN (SELECT term FROM hf)
  ) s WHERE rn <= 8
  UNION ALL
  SELECT term, doc_id, tf FROM postings
  WHERE term NOT IN (SELECT term FROM hf)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(tf * 10 AS BIGINT) AS score,
       CAST(NULL AS BIGINT) AS min_gap
FROM sub WHERE term = 'data'
ORDER BY score DESC, doc_id
LIMIT 25
""")


# ---------------------------------------------------------------------------
def _docid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Titledb docid assignment end-to-end: every url's 38-bit probable
    docid with the domain hash8 in bits 6-13 (Titledb.h:46-58), then the
    Msg22 availDocId collision machine inside the 64-slot block
    (Msg22.cpp:515-612) against a planted set of already-live docids —
    every doc_id%3 page's own pd is taken (forcing the ad2 slot walk),
    doc_id%9 pages additionally have pd+1 taken, and the lowest doc_id's
    whole block is full (the availDocId==0 failure -> NULL).  Cogrouped
    per block: disjoint 64-slot key ranges, hash-even at 10^10 urls."""
    from .functions.docids import assign_docids, probable_docid_udf

    register_views(spark, sf_dir)
    docs = (spark.table("documents").select("doc_id")
            .withColumn("url", F.concat(
                F.lit("http://site"), (F.col("doc_id") % 50).cast("string"),
                F.lit(".example"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".com/doc-"), F.col("doc_id").cast("string")))
            .withColumn("domain", F.concat(
                F.lit("example"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".com"))))
    with_pd = docs.withColumn("pd", probable_docid_udf()("url", "domain"))
    taken = (
        with_pd.filter(F.col("doc_id") % 3 == 0)
        .select(F.col("pd").alias("docid"))
        .unionAll(with_pd.filter(F.col("doc_id") % 9 == 0)
                  .select((F.col("pd") + 1).alias("docid")))
        .unionAll(with_pd.orderBy("doc_id").limit(1)
                  .select(F.shiftleft(F.shiftright("pd", 6), 6).alias("d1"))
                  .select(F.explode(F.sequence(F.lit(0), F.lit(63)))
                          .alias("off"), "d1")
                  .select((F.col("d1") + F.col("off")).alias("docid"))))
    assigned = assign_docids(docs, taken)
    return (docs.select("doc_id", "url")
            .join(assigned, "url")
            .select("doc_id", "url", "probable_docid", "assigned_docid")
            .orderBy("doc_id"))


_register_golden("docid_assign", _docid_assign, "doc_id")


# ---------------------------------------------------------------------------
def _cluster_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clusterdb cluster-rec build + field extraction end-to-end: each
    doc's 96-bit rec packs (docid 38 | adult 1 | lang 6 | hostHash32&26bit
    | half | live) exactly as makeClusterRecKey (Clusterdb.cpp:149-177,
    XmlDoc.cpp:13885-13896 passes the doc's adult flag + langid + host
    hash32), then the Msg51-side getters read every field back
    (Clusterdb.h:73-99).  One Arrow-batched kernel pass, no shuffle."""
    import pandas as pd
    from pyspark.sql import types as T
    from .functions.clusterdb import (cluster_docid, cluster_has_adult,
                                      cluster_language, cluster_site_hash26,
                                      host_hash32, make_cluster_rec_key)

    register_views(spark, sf_dir)
    docs = (spark.table("documents").select("doc_id")
            .withColumn("host", F.concat(
                F.lit("site"), (F.col("doc_id") % 50).cast("string"),
                F.lit(".example"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".com")))
            .withColumn("is_adult", F.col("doc_id") % 11 == 0)
            .withColumn("langid", (F.col("doc_id") % 13).cast("int")))

    out_t = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n1", T.LongType()),
        T.StructField("n0", T.LongType()),
        T.StructField("site_hash26", T.LongType()),
        T.StructField("lang_out", T.LongType()),
        T.StructField("adult_out", T.BooleanType()),
    ])

    def _recs(batches):
        for pdf in batches:
            hh = host_hash32(pdf["host"])
            n1, n0 = make_cluster_rec_key(
                pdf["doc_id"].to_numpy(), pdf["is_adult"].to_numpy(),
                pdf["langid"].to_numpy(), hh)
            yield pd.DataFrame({
                "doc_id": cluster_docid(n1, n0),
                "n1": n1, "n0": n0,
                "site_hash26": cluster_site_hash26(n0),
                "lang_out": cluster_language(n0),
                "adult_out": cluster_has_adult(n0)})

    return docs.mapInPandas(_recs, schema=out_t).orderBy("doc_id")


_register_golden("q_cluster_recs", _cluster_recs, "doc_id")


# ---------------------------------------------------------------------------
def _spiderdb_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiderdb key128 pack + unpack end-to-end (Spider.cpp:642-674
    makeKey; Spider.h:437-460 getters): every frontier row's request AND
    latest-reply key, returned in the Rdb SCAN order — proof the parquet
    sort columns (first_ip, uh48, is_request) reproduce the reference's
    byte order (the S4 range-scan contract).  One Arrow kernel pass."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from .functions.ghash import uh48_bytes
    from .functions.spiderkeys import key_uh48, make_spiderdb_key

    register_views(spark, sf_dir)
    fr = spark.sql(FRONTIER_CTE + """
        SELECT uh, first_ip, url, CAST(uh % 97 = 0 AS BOOLEAN) AS is_reply
        FROM frontier""")

    out_t = T.StructType([
        T.StructField("first_ip", T.LongType()),
        T.StructField("uh48", T.LongType()),
        T.StructField("is_request", T.BooleanType()),
        T.StructField("n1", T.LongType()),
        T.StructField("n0", T.LongType()),
        T.StructField("uh48_out", T.LongType()),
    ])

    def _keys(batches):
        for pdf in batches:
            uh = uh48_bytes(pdf["url"].str.encode("utf-8"))
            is_req = ~pdf["is_reply"].to_numpy(dtype=bool)
            n1, n0 = make_spiderdb_key(
                pdf["first_ip"].to_numpy(), uh, is_req,
                np.zeros(len(pdf), dtype=np.int64))
            yield pd.DataFrame({
                "first_ip": pdf["first_ip"].to_numpy(),
                "uh48": uh, "is_request": is_req,
                "n1": n1, "n0": n0,
                "uh48_out": key_uh48(n1, n0)})

    return (fr.mapInPandas(_keys, schema=out_t)
            .orderBy("first_ip", "uh48", "is_request"))


_register_golden("q_spiderdb_keys", _spiderdb_keys,
                 "first_ip, uh48, is_request")


# ---------------------------------------------------------------------------
def _posdb_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real Posdb shard records: the rank-carrying index build
    (wordpos/density/diversity/wordspam hashgroups) packed into 18-byte
    key144 postings exactly as Posdb::makeKey lays them out
    (Posdb.cpp:307-393), then read back through the Posdb.h getters —
    termId48 = hash64Lower of the term (hash.h:139, the reference's
    term id), docid/siterank/langid straddling the n2/n1/n0 words.
    Returned in ascending key order == (termId, docId, wordPos): the
    bucketed-postings byte layout."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from .functions.ghash import hash64_lower_batch
    from .functions.posdbkeys import (TERMID_MASK, make_posdb_key,
                                      pkey_doc_id, pkey_term_id,
                                      pkey_word_pos)
    from .search.posdbrank import build_posdb_index

    register_views(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.lower("text"), r"\s+")
    html = F.concat(
        F.lit("<html><head><title>"),
        F.array_join(F.slice(toks, 1, 4), " "),
        F.lit("</title></head><body><p>"),
        F.array_join(F.slice(toks, 5, F.size(toks)), " "),
        F.lit(".</p></body></html>"))
    hdocs = docs.select("doc_id", html.alias("content"),
                        (F.col("doc_id") % 10).cast("int")
                        .alias("site_rank"), "lang")
    idx = build_posdb_index(hdocs).join(
        hdocs.select("doc_id", "site_rank"), "doc_id")

    out_t = T.StructType([
        T.StructField("n2", T.LongType()),
        T.StructField("n1", T.LongType()),
        T.StructField("n0", T.IntegerType()),
        T.StructField("term_id", T.LongType()),
        T.StructField("doc_id_out", T.LongType()),
        T.StructField("word_pos", T.LongType()),
    ])

    def _pack(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            tid = (hash64_lower_batch(list(pdf["term"]))
                   & np.uint64(TERMID_MASK)).astype(np.int64)
            n2, n1, n0 = make_posdb_key(
                tid, pdf["doc_id"].to_numpy(),
                pdf["pos"].to_numpy(), pdf["density"].to_numpy(),
                pdf["diversity"].to_numpy(), pdf["wordspam"].to_numpy(),
                pdf["site_rank"].to_numpy(),
                pdf["hashgroup"].to_numpy(),
                np.zeros(len(pdf), dtype=np.int64),
                is_synonym=pdf["is_syn"].to_numpy(dtype=bool))
            yield pd.DataFrame({
                "n2": n2, "n1": n1, "n0": n0,
                "term_id": pkey_term_id(n2),
                "doc_id_out": pkey_doc_id(n2, n1),
                "word_pos": pkey_word_pos(n1)})

    return (idx.mapInPandas(_pack, schema=out_t)
            .orderBy("term_id", "doc_id_out", "word_pos", "n1", "n0"))


_register_golden("q_posdb_keys", _posdb_keys,
                 "term_id, doc_id_out, word_pos, n1, n0")


def _lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek 2020 §4.3): add-one bigram
    LM trained on the corpus, every doc scored by integer-exact
    cross-entropy (micro-nat NLL sums — associative BIGINT, partitioning-
    invariant), then per-language head/middle/tail perplexity terciles.
    The training-data tier's quality-bucket step; no reference analogue
    (the engine ranks pages, it does not LM-score them)."""
    from .training.lmscore import (ccnet_buckets, lm_cross_entropy,
                                   train_bigram_lm)
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text", "lang")
    uni, bi, vocab = train_bigram_lm(docs)
    scores = lm_cross_entropy(docs, uni, bi, vocab)
    return ccnet_buckets(scores, docs).orderBy("doc_id")


_register_golden("text_lm_perplexity", _lm_perplexity, "doc_id")


def _temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-α corpus mixing (XLM-R §3.1 / GPT-3 §2.2 weighted
    sampling): per-source rates q ∝ p^0.3 solved over the bounded
    source aggregate, materialized as deterministic hash-coin
    keep/repeat decisions per doc (training/mixing.py).  The mega-source
    flattening step a pretraining mix runs after curation."""
    from .training.mixing import temperature_sample
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text", "source")
    return (temperature_sample(docs, alpha=0.3, seed=42)
            .orderBy("doc_id", "copy"))


_register_golden("training_temperature_mix", _temperature_mix,
                 "doc_id, copy")
