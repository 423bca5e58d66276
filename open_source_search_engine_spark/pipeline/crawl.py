"""Batch-iterative crawl driver: the Spark re-expression of Gigablast's
spider loop (SpiderLoop.cpp) with round-boundary parity vs the Python oracle.

One round =
  candidates = dedup(requests)                       # F7 keep-rule
      ⟕ latest_reply                                 # F8 (max_by per uh48)
      ⟕ host_state (per-IP last download end)        # F21
      ⟕ cd_table (per-domain crawl-delay)            # F20
      → ufn/priority via compiled when() ladder      # F9
      → eligible_ms = greatest(...)                  # F10
  wave = per-IP winner Window + global cap + fetch_at spacing  # F11/F14/F16
  fetch-sim → replies + outlinks                     # F22-F25
  append to state dir, commit manifest snapshot      # F26 checkpoint

Scale notes (the 10^10 design):
- requests/replies are append-only parquet partitioned by round; at scale
  these are Iceberg tables bucketed by ``bucket(N, first_ip)`` so the dedup
  Window, the reply join, and the winner Window all run shuffle-free within
  co-located buckets (SURVEY §1.4).  The per-round shuffle here is one hash
  exchange on uh48 + one on first_ip.
- host_state and cd_table are tiny per-IP / per-domain aggregates —
  broadcast-joined (no shuffle of the big side).
- the global-cap Window is a single-partition sort but its input is already
  capped at (num_ips × ip_max) rows by the per-IP Window, i.e. bounded and
  small; at true web scale the global budget is enforced per scheduling
  shard exactly like the reference's host-local doledb (Hostdb.cpp:1761).
- mega-host skew: AQE skew-join is on (session.py); the winner Window for a
  hot IP is a single partition's sort — `MAX_WINNER_NODES` bounds what
  survives it, and the overflow guard (F27) drops ingest for IPs past 10M.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import (AUTO_BACKOFF_DELAY_MS, BANNED_HTTP_STATUSES,
                      ERR_DOC_DUP, HORIZON_MS, VERSION_MIX,
                      VERSION_PERIOD_S, VOLATILE_MOD, CrawlConfig,
                      _SITE_RANK_STEPS)
from . import snapshots as snap
from .tableformat import ManifestParquetFormat
from .filters import compile_rule_match, rule_arrays
from .udfs import (domain_ip_udf, domain_of_host_udf, hash32_udf,
                   make_normalize_udf, make_robots_udfs,
                   outlinks_map_in_pandas, uh48_udf, OUTLINK_STRUCT)

ERR_TMP = 32769
ERR_NOT_FOUND = 32780

REQUEST_COLS = [
    "first_ip", "uh48", "url", "host", "domain", "tld", "path_cgi",
    "hop_count", "added_time", "discovery_time", "parent_uh48",
    "parent_domain", "is_add_url", "is_injecting", "is_www",
    "robots_allowed", "robots_delay_ms", "round",
]
REPLY_COLS = [
    "first_ip", "uh48", "domain", "spidered_time", "err_code", "err_count",
    "http_status", "is_indexed", "content_hash32", "site_rank",
    "crawl_delay_ms", "download_end_ms", "percent_changed_per_day", "round",
]


def _site_rank_col(sni):
    """siteRank from siteNumInlinks as a Catalyst when-chain
    (Linkdb.cpp:5163-5181 getSiteRank)."""
    expr = F.lit(15)
    for rank in range(len(_SITE_RANK_STEPS) - 1, -1, -1):
        expr = F.when(sni <= _SITE_RANK_STEPS[rank],
                      F.lit(rank)).otherwise(expr)
    return expr.cast("int")


WAVE_COLS = [
    "round", "seq_in_round", "uh48", "url", "first_ip", "priority",
    "hop_count", "fetch_at_ms", "delay_ms",
]


@dataclass
class RoundStats:
    round: int
    wave_rows: int
    new_requests: int
    jumped: bool


# numeric scheduling columns the winner/budget pipeline actually reads —
# the wide string payload (url, domain, ...) rides along for ONLY the
# <= global_cap winners via a broadcast join-back, so the two full-frontier
# winner shuffles move ~60 B/row instead of ~200 B/row (the sort is
# memory-bandwidth-bound at high core counts)
_WAVE_SCHED_COLS = [
    "first_ip", "uh48", "priority", "hop_count", "eligible_ms",
    "ip_max", "ufn", "max_per_rule", "ip_wait_ms", "robots_delay_ms",
    "ip_last_end", "ip_twitchy", "site_num_inlinks", "harvest",
]


def dedup_requests(requests: DataFrame) -> DataFrame:
    """F7 merge keep-rule: per uh48 keep min (hopCount, discoveryTime,
    parent, round) — Spider.cpp:3883-3922 / SpiderColl.cpp:3125-3164.
    Module-level (r5) so the catalog's ``f7_request_dedup`` driver gate
    runs THIS production code; ``CrawlRunner._dedup_requests``
    delegates here."""
    w = Window.partitionBy("uh48").orderBy(
        "hop_count", "discovery_time", "parent_uh48", "round")
    return (requests.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def latest_reply(replies: DataFrame) -> DataFrame:
    """F8: only the newest reply per uh48 survives (Spider.cpp:664-667).
    Module-level (r5) for the ``f8_latest_reply_join`` driver gate;
    ``CrawlRunner._latest_reply`` delegates here."""
    w = Window.partitionBy("uh48").orderBy(
        F.desc("download_end_ms"), F.desc("round"))
    return (replies.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def eligible_ms_expr(crawl_delay_cap_ms: int) -> F.Column:
    """F10 next-eligible-time (SpiderColl.cpp:4083-4180): greatest() of
    the scheduling clocks — add time, per-IP politeness, the clamped
    robots Crawl-delay, and the respider-frequency clock.  Module-level
    so the driver-contract catalog (``f10_eligible_time``) exercises
    EXACTLY the production expression ``_candidates`` schedules with.

    Expects columns: added_time (s), ip_last_end (ms), ip_wait_ms,
    cd_ms (nullable), has_reply, last_spider_time_s, spider_freq_ms."""
    return F.greatest(
        F.col("added_time") * 1000,
        F.col("ip_last_end") + F.col("ip_wait_ms"),
        F.when(F.col("cd_ms").isNotNull(),
               F.col("ip_last_end")
               + F.least(F.col("cd_ms"),
                         F.lit(crawl_delay_cap_ms)))
        .otherwise(F.lit(0).cast("long")),
        F.when(F.col("has_reply"),
               F.col("last_spider_time_s") * 1000
               + F.col("spider_freq_ms"))
        .otherwise(F.lit(0).cast("long")),
    )


def assemble_wave_from_candidates(cand: DataFrame, cfg: CrawlConfig,
                                  wave_start: int, rnd: int,
                                  payload: DataFrame | None = None) -> DataFrame:
    """The production wave assembly: F11 winner Window + F14 budgets + F16
    politeness spacing.  Module-level so the bench and the driver-contract
    catalog exercise EXACTLY this code path (not a SQL twin).

    ``payload``: optional (uh48, url, domain, ...) frame the winner rows'
    string columns are recovered from; defaults to ``cand`` itself (right
    when cand is cached, as in the crawl round) — pass the cheapest
    uh48-unique ancestor when cand's lineage is expensive to recompute."""
    from .scale import apply_wave_budgets, salted_topk_per_key

    src = payload if payload is not None else cand
    payload_cols = [c for c in ("url", "domain") if c in src.columns]
    sched_cols = [c for c in _WAVE_SCHED_COLS if c in cand.columns]
    wide = src.select("uh48", *payload_cols)
    cand = cand.select(*sched_cols)

    order = [F.desc("priority"), F.asc("hop_count"),
             F.asc("eligible_ms"), F.asc("uh48")]
    # salted two-phase top-K (scale.py): provably identical to a single
    # per-IP Window, but a 30%-of-frontier mega-host sorts in parallel
    # salt shards instead of one straggler task.  Phase-1 K only needs
    # to cover the largest possible per-IP launch cap (the reference's
    # 2000-node winner tree exists to feed its winner-list CACHE across
    # scans — a batch round launches at most ip_max per IP, so ranks
    # beyond max(spiderIpMaxSpiders) can never reach the wave).
    k_eff = min(cfg.max_winner_nodes,
                max(r.spider_ip_max_spiders for r in cfg.url_filters))
    sel = salted_topk_per_key(cand, "first_ip", order,
                              k=k_eff, rank_name="ip_rn")
    w_ip = Window.partitionBy("first_ip").orderBy(*order)
    sel = (
        sel.withColumn("ip_k", F.first("ip_max").over(w_ip))
        .filter(F.col("ip_rn") <= F.col("ip_k"))
    )
    # per-rule launch budget (maxSpidersPerRule, SpiderLoop.cpp:683-731)
    # and the global MAX_SPIDERS cap, enforced per scheduling shard like
    # the reference's host-local doledb (scale.py apply_wave_budgets)
    wave = apply_wave_budgets(sel, order, cfg.max_spiders_global,
                              rule_budget_col="max_per_rule",
                              n_shards=cfg.n_wave_shards)
    # politeness delay per IP over SELECTED rows (hammer-queue analogue):
    # max(sameIpWait, clamp(robots crawl-delay, 0, 60 s))
    w_ip_all = Window.partitionBy("first_ip")
    delay_terms = [
        F.max("ip_wait_ms").over(w_ip_all),
        F.least(F.greatest(F.max("robots_delay_ms").over(w_ip_all),
                           F.lit(0)),
                F.lit(cfg.crawl_delay_cap_ms)),
    ]
    if cfg.auto_backoff and "ip_twitchy" in wave.columns:
        # Msg13.cpp:2030-2038: downloads from a twitchy IP are spaced at
        # least AUTOCRAWLDELAY apart (fetch-time raise only — the
        # scheduler's cdTable value is NOT rewritten, so eligible_ms is
        # untouched, exactly like the reference's hammer-queue-only raise)
        delay_terms.append(
            F.when(F.max("ip_twitchy").over(w_ip_all),
                   F.lit(AUTO_BACKOFF_DELAY_MS)).otherwise(F.lit(0)))
    wave = wave.withColumn(
        "delay_ms", F.greatest(*delay_terms).cast("long"))
    w_ip_seq = Window.partitionBy("first_ip").orderBy("seq_in_round")
    wave = (
        wave.withColumn("ip_rank", F.row_number().over(w_ip_seq) - 1)
        .withColumn("fetch_at_ms",
                    F.greatest(F.lit(wave_start),
                               F.col("ip_last_end") + F.col("delay_ms"))
                    + F.col("ip_rank") * F.col("delay_ms"))
        .withColumn("round", F.lit(rnd))
    )
    if not payload_cols:
        return wave
    # recover the string payload for the bounded winner set: broadcasting
    # the <= global_cap wave rows makes this one scan of the frontier
    # projection, no shuffle of the big side
    return wide.join(F.broadcast(wave), "uh48", "inner")


class CrawlRunner:
    def __init__(self, spark: SparkSession, corpus_dir: str, state_dir: str,
                 cfg: CrawlConfig | None = None, use_bloom_seen: bool = False,
                 table_format=None):
        self.spark = spark
        self.corpus_dir = corpus_dir
        self.state_dir = state_dir
        self.cfg = cfg or CrawlConfig()
        # the table-format seam (VERDICT r3 item 6): every manifest/path
        # operation below goes through this interface; swapping the
        # manifest+parquet store for Iceberg/Delta is a backend change
        # (see pipeline/tableformat.py for the method-by-method mapping;
        # r5: the seam is exercised by a SECOND in-tree backend,
        # DirectoryLogFormat, parametrized through the checkpoint/
        # time-travel/vacuum/fsck/resume test matrix)
        self.fmt = table_format if table_format is not None \
            else ManifestParquetFormat(state_dir)
        self.use_bloom_seen = use_bloom_seen
        self._bloom = None   # incremental BloomState, built on first use
        # background OR-merge of the round's appended keys into _bloom
        # (r5): joined before every bloom access; its exception (if any)
        # surfaces at the join point
        self._bloom_thread = None
        self._bloom_thread_exc: BaseException | None = None
        # per-stage wall clocks of the most recent round (_run_round) —
        # the statsdb/PagePerf-style breakdown bench.py reports
        self.last_round_timings: dict[str, float] = {}
        self._normalize = make_normalize_udf(strip_params=True,
                                             strip_common_file=True)
        self._robots_allowed, self._robots_delay = make_robots_udfs(
            self.cfg.user_agent)
        # dims — hosts gets its robots crawl-delay compiled once (F17/F19:
        # robots are cached per host, 24 h TTL); a host whose robots body
        # CHANGES mid-crawl (robots_txt_after / robots_change_at_s corpus
        # columns) is picked up at the next TTL refresh, not before —
        # exactly the reference's cache behavior
        self.hosts = self._compile_hosts(self.cfg.wave_start_ms // 1000)
        self.docs = spark.read.parquet(
            os.path.join(corpus_dir, "docs.parquet"))
        # meta-noindex dim (XmlDoc::hasNoIndexMetaTag, XmlDoc.cpp:
        # 11067-11084 + 13240-13267): pages carrying
        # <meta name=noindex content=1> are fetched and their outlinks
        # harvested, but the doc itself is never indexed
        self._noindex = (
            self.docs.select(
                F.col("doc_id").alias("ni_url"),
                F.exists(
                    "spans",
                    lambda s: F.coalesce(
                        s["text"].contains("<meta name=noindex content=1>"),
                        F.lit(False)))
                .alias("has_noindex"))
            .filter(F.col("has_noindex")))
        self.outcomes = spark.read.parquet(
            os.path.join(corpus_dir, "outcomes.parquet")).cache()
        self._robots_compiled_at_ms: int | None = None
        self.robots_refreshes = 0
        # site list = the seed list's registered domains
        # (Spider.cpp:1631-1750 updateSiteListBuf → m_siteListDomTable;
        # PageBasic.cpp getMatchingUrlPattern dom fast path) — feeds the
        # `insitelist` rule atom.  Empty list = user is spidering the whole
        # internet → every URL matches (Spider.cpp:2426-2428).
        seeds = spark.read.parquet(os.path.join(corpus_dir, "seeds.parquet"))
        self.site_list_domains = (
            seeds.select(self._normalize("url").alias("n"))
            .select(F.col("n.domain").alias("domain"))
            .filter(F.col("domain").isNotNull() & (F.col("domain") != ""))
            .distinct().cache())
        self._site_list_empty = self.site_list_domains.limit(1).count() == 0

    def _compile_hosts(self, now_s: int) -> DataFrame:
        """Compile the per-host robots dimension EFFECTIVE at ``now_s``: a
        host carrying (robots_txt_after, robots_change_at_s) serves the new
        body once the compile clock passes the change time — the webserver
        changed its file; whether the crawler SEES it is gated by the 24 h
        cache TTL in _maybe_refresh_robots."""
        raw = self.spark.read.parquet(
            os.path.join(self.corpus_dir, "hosts.parquet"))
        if "robots_txt_after" in raw.columns:
            raw = raw.withColumn(
                "robots_txt",
                F.when(F.col("robots_txt_after").isNotNull()
                       & F.col("robots_change_at_s").isNotNull()
                       & (F.col("robots_change_at_s") <= F.lit(now_s)),
                       F.col("robots_txt_after"))
                .otherwise(F.col("robots_txt")))
        return (raw.drop("robots_txt_after", "robots_change_at_s")
                .withColumn("robots_delay_ms",
                            self._robots_delay("robots_txt"))
                .cache())

    def _maybe_refresh_robots(self, now_ms: int) -> None:
        """F19: the robots cache has a 24 h TTL (Msg13.cpp:477-484).  When
        the crawl clock moves past the TTL, re-read and recompile the
        per-host robots dimension — picking up any robots bodies that
        changed since the last compile (static hosts make it a no-op on
        results)."""
        from ..config import ROBOTS_TTL_S
        if self._robots_compiled_at_ms is None:
            self._robots_compiled_at_ms = now_ms
            return
        if now_ms - self._robots_compiled_at_ms > ROBOTS_TTL_S * 1000:
            self.hosts.unpersist()
            self.hosts = self._compile_hosts(now_ms // 1000)
            self._robots_compiled_at_ms = now_ms
            self.robots_refreshes += 1

    # ------------------------------------------------------------------ io
    def _write_data(self, df: DataFrame, table: str, rnd: int,
                    partitions: int = 0, extra_metrics=None):
        """The Spark half of :meth:`_write` — runs the write action and
        returns ``(n, extras)`` WITHOUT touching the manifest, so
        independent writes can run on concurrent driver threads and the
        (driver-local, ordering-sensitive) manifest records happen on the
        caller's thread after the jobs finish."""
        from pyspark.sql import Observation
        path = self.fmt.data_path(table, rnd)
        if partitions:
            df = df.repartition(partitions)
        # observation metrics ride the write job itself — no second pass
        # over the written files.  ``extra_metrics`` (name -> Column)
        # fuses caller aggregates into the same job (e.g. the wave
        # write's max fetch-end, which sets the next round's clock).
        obs = Observation()
        metrics = [F.count(F.lit(1)).alias("n")]
        extra = dict(extra_metrics or {})
        metrics += [c.alias(name) for name, c in extra.items()]
        df.observe(obs, *metrics).write.mode("overwrite").parquet(path)
        row = obs.get
        n = int(row["n"])
        return n, {name: row[name] for name in extra}

    def _write(self, df: DataFrame, table: str, rnd: int, m: snap.Manifest,
               partitions: int = 0, extra_metrics=None):
        n, extras = self._write_data(df, table, rnd, partitions,
                                     extra_metrics)
        self.fmt.record_write(m, table, rnd, n)
        # return shape follows the ARGUMENT's presence, not the dict's
        # truthiness: extra_metrics=None -> n; extra_metrics=dict (even
        # empty) -> (n, extras)
        if extra_metrics is not None:
            return n, extras
        return n

    def _read_all(self, table: str,
                  m: snap.Manifest | None) -> DataFrame | None:
        if m is None:          # never-committed state dir: same as no rows
            return None
        dirs = self.fmt.committed_paths(table, m)
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    # -------------------------------------------------------------- ingest
    def _normalize_url_table(self, df: DataFrame, is_add_url: bool,
                             is_injecting: bool) -> DataFrame:
        """(url, added_time) → normalized request rows (F1-F5): normalize,
        uh48, firstIp via the hosts dim (broadcast) with deterministic
        fallback, robots evaluated once per request (static robots model)."""
        n = df.withColumn("n", self._normalize("url"))
        req = (
            n.filter(F.col("n.url_norm").isNotNull())
            .select(
                F.col("n.url_norm").alias("url"),
                F.col("n.host").alias("host"),
                F.col("n.domain").alias("domain"),
                F.col("n.tld").alias("tld"),
                F.col("n.path_cgi").alias("path_cgi"),
                F.col("n.is_www").alias("is_www"),
                F.col("added_time"),
            )
            .withColumn("uh48", uh48_udf("url"))
            .withColumn("hop_count", F.lit(0))
            .withColumn("discovery_time", F.col("added_time"))
            .withColumn("parent_uh48", F.lit(-1).cast("long"))
            .withColumn("parent_domain", F.lit(None).cast("string"))
            .withColumn("is_add_url", F.lit(is_add_url))
            .withColumn("is_injecting", F.lit(is_injecting))
        )
        return self._attach_host_dim(req)

    def ingest_seeds(self, m: snap.Manifest) -> int:
        """Seeds + injected URLs → round-0 request rows.  Injection is the
        PageInject surface: content-supplied pages flagged m_isInjecting
        (Spider.cpp:4286-4360) that match 'isinjecting' filter rows."""
        seeds = self.spark.read.parquet(
            os.path.join(self.corpus_dir, "seeds.parquet"))
        req = self._normalize_url_table(seeds, is_add_url=True,
                                        is_injecting=False)
        inj_path = os.path.join(self.corpus_dir, "injects.parquet")
        if os.path.exists(inj_path):
            injects = self.spark.read.parquet(inj_path)
            req = req.unionByName(self._normalize_url_table(
                injects, is_add_url=False, is_injecting=True))
        req = req.withColumn("round", F.lit(0)).select(*REQUEST_COLS)
        return self._write(req, "requests", 0, m)

    def _attach_host_dim(self, df: DataFrame) -> DataFrame:
        """Join the hosts dim (broadcast — it is the small side) for
        first_ip + robots; unknown hosts fall back to the deterministic
        domain hash (F3) and 'no robots' (allow all, delay -1)."""
        dim = self.hosts.select("host", F.col("first_ip").alias("dim_ip"),
                                "robots_txt", "robots_delay_ms")
        out = (
            df.join(F.broadcast(dim), "host", "left")
            .withColumn("first_ip",
                        F.coalesce(F.col("dim_ip"),
                                   domain_ip_udf(F.coalesce("domain", "host"))))
            .withColumn("robots_delay_ms",
                        F.coalesce(F.col("robots_delay_ms"), F.lit(-1)))
            .withColumn("robots_allowed",
                        F.when(F.col("robots_txt").isNull(), F.lit(True))
                        .otherwise(self._robots_allowed("robots_txt", "path_cgi")))
            .drop("dim_ip", "robots_txt")
        )
        return out

    # ------------------------------------------------------------- assembly
    def _join_bloom_thread(self) -> None:
        """Serialize with the background bloom maintenance thread (if
        one is in flight) and re-raise anything it threw."""
        t = self._bloom_thread
        if t is not None:
            t.join()
            self._bloom_thread = None
        exc = self._bloom_thread_exc
        if exc is not None:
            self._bloom_thread_exc = None
            raise exc

    def _dedup_requests(self, requests: DataFrame) -> DataFrame:
        return dedup_requests(requests)

    def _latest_reply(self, replies: DataFrame) -> DataFrame:
        return latest_reply(replies)

    def _candidates(self, requests: DataFrame, replies: DataFrame | None,
                    wave_start: int,
                    lr: DataFrame | None = None) -> DataFrame:
        cfg = self.cfg
        deduped = self._dedup_requests(requests)
        # sniTable analogue (SpiderColl.cpp:580-610): siteNumInlinks per
        # host = distinct external linking domains over the deduped
        # frontier (robots-disallowed targets still evidence inlinks)
        sni = (deduped.filter(F.col("parent_domain").isNotNull()
                              & (F.col("parent_domain") != F.col("domain")))
               .groupBy("host")
               .agg(F.least(F.count_distinct("parent_domain"), F.lit(255))
                    .alias("site_num_inlinks")))
        # robots verdict + delay are evaluated per ROUND against the
        # CURRENT cached robots dim (the oracle checks robots_of(host) at
        # candidate time, and the reference checks its Msg13 robots cache
        # at spider time) — not the creation-time snapshot stored on the
        # request row, which a TTL refresh may have superseded.  The tagdb
        # site-tags column (S8/Tagdb.cpp, tag: atoms) rides the SAME
        # hosts-dim projection so the round pays one host-keyed broadcast
        # build instead of two.
        cur = self.hosts.select(
            "host", F.col("robots_txt").alias("_cur_robots"),
            F.col("robots_delay_ms").alias("_cur_delay"),
            F.col("tags").alias("site_tags"))
        deduped = (
            deduped.drop("robots_delay_ms")
            .join(F.broadcast(cur), "host", "left")
            .withColumn("_cur_allowed",
                        F.when(F.col("_cur_robots").isNull(), F.lit(True))
                        .otherwise(self._robots_allowed("_cur_robots",
                                                        "path_cgi")))
            .withColumn("robots_delay_ms",
                        F.coalesce(F.col("_cur_delay"), F.lit(-1)))
            .drop("_cur_robots", "_cur_delay"))
        req = (deduped.filter(F.col("_cur_allowed")).drop("_cur_allowed")
               .join(F.broadcast(sni), "host", "left")
               .fillna({"site_num_inlinks": 0}))
        # insitelist (Spider.cpp:2418-2441): domain membership in the seed
        # site list; an empty list matches everything
        if self._site_list_empty:
            req = req.withColumn("in_site_list", F.lit(True))
        else:
            req = (req.join(F.broadcast(self.site_list_domains.withColumn(
                       "in_site_list", F.lit(True))), "domain", "left")
                   .fillna({"in_site_list": False}))
        if replies is not None:
            rep = (lr if lr is not None
                   else self._latest_reply(replies)).select(
                "uh48", "err_code", "err_count", "http_status", "is_indexed",
                "percent_changed_per_day",
                F.col("spidered_time").alias("last_spider_time_s"))
            host_state = replies.groupBy("first_ip").agg(
                F.max("download_end_ms").alias("ip_last_end"),
                # twitchy table (Msg13.cpp:416-427): an IP any of whose
                # replies carried a ban-indicating status stays twitchy
                F.max(F.col("http_status")
                      .isin(*BANNED_HTTP_STATUSES)).alias("ip_twitchy"))
            # F20: first write per domain wins (SpiderColl.cpp:699-732) —
            # the delay of the EARLIEST reply (download-end time order,
            # uh48 tie-break), not a max over all replies; a domain whose
            # hosts advertise different Crawl-delays keeps the first one
            cd = (replies.filter(F.col("crawl_delay_ms") >= 0)
                  .groupBy("domain")
                  .agg(F.min_by("crawl_delay_ms",
                                F.struct("round", "download_end_ms", "uh48"))
                       .alias("cd_ms")))
            cand = (
                req.join(rep, "uh48", "left")
                .withColumn("has_reply", F.col("last_spider_time_s").isNotNull())
                .fillna({"err_code": 0, "err_count": 0, "http_status": 0,
                         "is_indexed": False, "last_spider_time_s": 0,
                         "percent_changed_per_day": 0})
                .join(F.broadcast(host_state), "first_ip", "left")
                .join(F.broadcast(cd), "domain", "left")
                .fillna({"ip_last_end": 0, "ip_twitchy": False})
            )
        else:
            cand = (req.withColumn("has_reply", F.lit(False))
                    .withColumn("err_code", F.lit(0))
                    .withColumn("err_count", F.lit(0))
                    .withColumn("http_status", F.lit(0))
                    .withColumn("is_indexed", F.lit(False))
                    .withColumn("percent_changed_per_day", F.lit(0))
                    .withColumn("last_spider_time_s", F.lit(0).cast("long"))
                    .withColumn("ip_last_end", F.lit(0).cast("long"))
                    .withColumn("ip_twitchy", F.lit(False))
                    .withColumn("cd_ms", F.lit(None).cast("int")))
        # F29: page_num_inlinks = distinct /24 C-blocks of linking parents
        # per uh48, cap 20 (SpiderColl.cpp:2701-2742) — counted over ALL
        # stored request rows (each link occurrence), like the reference's
        # scan; compaction collapses duplicates just like the Rdb merge.
        # hasauthorityinlink (Spider.cpp m_hasAuthorityInlink; Linkdb feeds
        # it from inlinkers whose tagdb site carries the 'authority' tag)
        # rides the same aggregate: a link occurrence whose parent domain
        # belongs to an authority-tagged site sets the flag.
        auth_dom = (self.hosts
                    .filter(F.array_contains("tags", "authority"))
                    .select(domain_of_host_udf("host")
                            .alias("parent_domain"))
                    .distinct())
        pni = (requests.filter(F.col("parent_domain").isNotNull())
               .join(F.broadcast(auth_dom.withColumn(
                   "_auth", F.lit(True))), "parent_domain", "left")
               .select("uh48", "_auth",
                       F.floor(domain_ip_udf("parent_domain") / 256)
                       .alias("cblock"))
               .groupBy("uh48")
               .agg(F.least(F.count_distinct("cblock"), F.lit(20))
                    .alias("page_num_inlinks"),
                    F.max(F.coalesce("_auth", F.lit(False)))
                    .alias("has_authority_inlink")))
        cand = (cand.join(F.broadcast(pni), "uh48", "left")
                .fillna({"page_num_inlinks": 0,
                         "has_authority_inlink": False}))
        # F28: site/domain page quotas = distinct indexed uh48 per SITE /
        # domain (SpiderColl.cpp:2754-2798 m_siteHash32), feeding the
        # sitepages / domainpages rule atoms (Spider.cpp:2949-2961).
        # The site is the SiteGetter definition (hostname, or the
        # host + user-area prefix for /~user-style URLs) so a hosted
        # user area carries its own quota.
        from ..functions.sitegetter import site_expr
        cand = cand.withColumn(
            "site", site_expr(F.col("url"), F.col("host"),
                              F.col("domain")))
        if replies is not None:
            # quota aggregates over a SLIM projection of the post-robots
            # frontier joined with the latest-reply is_indexed bit — NOT
            # over ``cand`` itself, whose full join lineage would be
            # re-executed inside each broadcast build.  Row-for-row
            # equivalent: every join between ``req`` and this point is a
            # left join against a unique-keyed right side, so cand rows
            # == req rows 1:1 and cand.is_indexed == coalesce(rep
            # .is_indexed, false) exactly as rebuilt here.
            slim = (req.select("uh48", "url", "host", "domain")
                    .withColumn("site", site_expr(
                        F.col("url"), F.col("host"), F.col("domain")))
                    .join(rep.select("uh48", "is_indexed"), "uh48", "left")
                    .fillna({"is_indexed": False}))
            sitep = (slim.groupBy("site")
                     .agg(F.count_distinct(
                         F.when(F.col("is_indexed"), F.col("uh48")))
                         .alias("site_pages")))
            domp = (slim.groupBy("domain")
                    .agg(F.count_distinct(
                        F.when(F.col("is_indexed"), F.col("uh48")))
                        .alias("domain_pages")))
            cand = (cand.join(F.broadcast(sitep), "site", "left")
                    .join(F.broadcast(domp), "domain", "left")
                    .fillna({"site_pages": 0, "domain_pages": 0}))
        else:
            # no replies yet ⇒ nothing is indexed ⇒ both quota counts are
            # identically zero; skip the two aggregate broadcasts
            cand = (cand.withColumn("site_pages", F.lit(0).cast("long"))
                    .withColumn("domain_pages", F.lit(0).cast("long")))
        now_s = wave_start // 1000
        cand = cand.withColumn(
            "ufn", compile_rule_match(cfg.url_filters, now_s))
        arrays = rule_arrays(cfg.url_filters)
        for name, col in arrays.items():
            cand = cand.withColumn(name, col)
        cand = cand.filter((F.col("ufn") >= 0) & ~F.col("force_delete"))
        cand = cand.withColumn(
            "eligible_ms", eligible_ms_expr(cfg.crawl_delay_cap_ms))
        return cand

    def _assemble_wave(self, cand: DataFrame, wave_start: int,
                       rnd: int) -> DataFrame:
        return assemble_wave_from_candidates(cand, self.cfg, wave_start, rnd)

    # ---------------------------------------------------------------- fetch
    def _simulate_fetch(self, wave: DataFrame, replies: DataFrame | None,
                        rnd: int,
                        lr: DataFrame | None = None) -> tuple[DataFrame, DataFrame]:
        """F25: deterministic fetch over the docs/outcomes tables; returns
        (new_replies, new_requests[outlinks]).  Both derive from one
        lazy fetch frame that each write job re-runs COLUMN-PRUNED (the
        cached wave feeds both, so the prune reaches the scans) — see
        the in-body note for why this beats persisting the frame.
        ``lr`` is the round's shared persisted latest-reply frame (r5:
        without it, the latest-reply window over the whole reply log
        re-shuffles once per consumer per write job)."""
        cfg = self.cfg
        prev_errs = None
        if replies is not None:
            prev_errs = (lr if lr is not None
                         else self._latest_reply(replies)).select(
                "uh48", F.col("err_count").alias("prev_err_count"),
                F.col("content_hash32").alias("prev_hash32"),
                F.col("spidered_time").alias("prev_spidered_s"))
        f = wave.join(self.outcomes.withColumnRenamed("url", "o_url"),
                      wave["url"] == F.col("o_url"), "left").drop("o_url")
        if prev_errs is not None:
            f = f.join(F.broadcast(prev_errs), "uh48", "left")
        else:
            f = (f.withColumn("prev_err_count", F.lit(None).cast("int"))
                 .withColumn("prev_hash32", F.lit(None).cast("long"))
                 .withColumn("prev_spidered_s", F.lit(None).cast("long")))
        f = (
            f.fillna({"prev_err_count": 0})
            # exact-content identity: mirror pages share their canonical's
            # content_key (corpus guarantees identical spans); unique
            # pages key on their own URL
            .withColumn("content_key",
                        F.coalesce(F.col("content_key"), F.col("url")))
            .withColumn("site_rank",
                        _site_rank_col(F.col("site_num_inlinks")))
            .withColumn("download_end_ms",
                        F.col("fetch_at_ms") + cfg.fetch_duration_ms)
            .withColumn("spidered_time",
                        (F.col("download_end_ms") / 1000).cast("long"))
            .withColumn("ok", F.col("outcome") == "ok")
            .withColumn("is_redirect", F.col("outcome") == "redirect")
            # "throttled" answers 503 — a retryable tmp error that also
            # flags the IP twitchy (Msg13.cpp ipWasBanned -> twitchyTable)
            .withColumn("err_code",
                        F.when(F.col("ok") | F.col("is_redirect"), 0)
                        .when(F.col("outcome").isin("tmp", "throttled"),
                              ERR_TMP)
                        .otherwise(ERR_NOT_FOUND))
            .withColumn("err_count",
                        F.when(F.col("ok") | F.col("is_redirect"), 0)
                        .otherwise(F.col("prev_err_count") + 1))
            .withColumn("http_status",
                        F.when(F.col("ok"), 200)
                        .when(F.col("is_redirect"), 301)
                        .when(F.col("outcome") == "throttled", 503)
                        .when(F.col("outcome") == "tmp", 0).otherwise(404))
            .withColumn("is_indexed", F.col("ok"))
            # meta noindex: fetched + links harvested, never indexed
            # (XmlDoc.cpp:13257-13265 m_usePosdb=false etc.)
            .join(F.broadcast(self._noindex),
                  F.col("url") == F.col("ni_url"), "left")
            .drop("ni_url")
            .withColumn("is_indexed",
                        F.col("is_indexed")
                        & ~F.coalesce(F.col("has_noindex"), F.lit(False)))
            .drop("has_noindex")
            # volatile pages: content hash advances with the version clock
            # so refetches observe change (drives percentchangedperday)
            .withColumn(
                "content_hash32",
                F.when(
                    F.col("ok"),
                    F.when(
                        F.col("uh48") % VOLATILE_MOD == 0,
                        hash32_udf("url").bitwiseXOR(
                            (F.floor(F.col("spidered_time")
                                     / VERSION_PERIOD_S) * VERSION_MIX)
                            .cast("long"))
                        .bitwiseAND(F.lit(0xFFFFFFFF)))
                    # getExactContentHash64 analogue: mirror pages hash to
                    # their canonical's value (the corpus keeps mirror
                    # pools off volatile URLs, so the branches never mix)
                    .otherwise(hash32_udf("content_key")))
                .otherwise(F.lit(0).cast("long")))
            # m_percentChangedPerDay: 100/days between DIFFERING indexed
            # fetches, capped 100; 0 on first fetch or unchanged content
            .withColumn(
                "percent_changed_per_day",
                F.when(
                    F.col("ok") & F.col("prev_hash32").isNotNull()
                    & (F.col("prev_hash32") != 0)
                    & (F.col("content_hash32") != F.col("prev_hash32")),
                    F.least(
                        F.lit(100),
                        F.floor(F.lit(100 * 86400)
                                / F.greatest(F.col("spidered_time")
                                             - F.col("prev_spidered_s"),
                                             F.lit(1))).cast("int")))
                .otherwise(F.lit(0)).cast("int"))
            .withColumn("crawl_delay_ms", F.col("robots_delay_ms"))
            .withColumn("round", F.lit(rnd))
        )
        # F-dup: index-time exact-content dedup (XmlDoc::getIsDup,
        # XmlDoc.cpp:5042-5136).  A fetched non-root page is EDOCDUP when
        # the committed index (PRIOR rounds — the batch commit unit; the
        # reference checks posdb at its index instant) holds the same
        # content hash under another uh48 whose at-index-time site rank
        # >= this page's current rank ("he was here first").  Root URLs
        # are never discarded (Parms.cpp:8644).
        if cfg.deduping_enabled and replies is not None:
            idx = ((lr if lr is not None else self._latest_reply(replies))
                   .filter(F.col("is_indexed"))
                   .select(F.col("uh48").alias("idx_uh48"),
                           F.col("content_hash32").alias("content_hash32"),
                           F.col("site_rank").alias("idx_sr")))
            # exists-other-with-rank>=mine, computed scale-safely as two
            # bounded aggregates (never a per-hash collect): the global
            # (rank, uh48) max per hash + the max over the remainder
            best = idx.groupBy("content_hash32").agg(
                F.max_by(F.struct(F.col("idx_sr").alias("sr1"),
                                  F.col("idx_uh48").alias("uh1")),
                         F.struct("idx_sr", "idx_uh48")).alias("m1"))
            second = (idx.join(best, "content_hash32")
                      .filter(F.col("idx_uh48") != F.col("m1.uh1"))
                      .groupBy("content_hash32")
                      .agg(F.max("idx_sr").alias("sr2")))
            dup = (best.join(second, "content_hash32", "left")
                   .select("content_hash32", F.col("m1.sr1").alias("sr1"),
                           F.col("m1.uh1").alias("uh1"), "sr2"))
            # the wave is <= the global launch cap: semi-reduce the dup
            # table to the wave's hashes first so the final enrich join
            # broadcasts a bounded frame, not the whole index aggregate
            wave_hashes = f.select("content_hash32").distinct()
            dup = dup.join(F.broadcast(wave_hashes), "content_hash32",
                           "left_semi")
            f = f.join(F.broadcast(dup), "content_hash32", "left")
            other_sr = F.when(F.col("uh1") != F.col("uh48"),
                              F.col("sr1")).otherwise(F.col("sr2"))
            f = f.withColumn(
                "is_dup",
                F.coalesce(
                    F.col("ok")
                    & ~F.col("url").rlike("^https?://[^/]+/$")
                    & (other_sr >= F.col("site_rank")),
                    F.lit(False)))
        else:
            f = f.withColumn("is_dup", F.lit(False))
        f = (
            f.withColumn("err_code",
                         F.when(F.col("is_dup"), ERR_DOC_DUP)
                         .otherwise(F.col("err_code")))
            .withColumn("err_count",
                        F.when(F.col("is_dup"),
                               F.col("prev_err_count") + 1)
                        .otherwise(F.col("err_count")))
            .withColumn("is_indexed", F.col("is_indexed") & ~F.col("is_dup"))
            .withColumn("percent_changed_per_day",
                        F.when(F.col("is_dup"), F.lit(0))
                        .otherwise(F.col("percent_changed_per_day")))
        )
        # NOT cached, deliberately (r4): the replies and requests writes
        # each re-run this lineage COLUMN-PRUNED to what they project —
        # measured 3x cheaper at fixture scale than persisting the full
        # frame (a persist materializes every column and planning below
        # the InMemoryRelation loses the pruned scans; see BENCH/
        # BASELINE.md "Crawl-round fusion"), and at 100 TB the same
        # holds: two pruned scans of the wave-bounded frame beat one
        # unpruned materialization.
        new_replies = f.select(*REPLY_COLS)

        parents = (
            f.filter(F.col("ok") & F.col("harvest") & ~F.col("is_dup"))
            .join(self.docs, f["url"] == self.docs["doc_id"], "inner")
            .select("url", "spans", "hop_count", "spidered_time", "uh48")
        )
        raw_links = parents.mapInPandas(outlinks_map_in_pandas,
                                        schema=OUTLINK_STRUCT)
        new_req = (
            self._attach_host_dim(raw_links)
            .withColumn("is_add_url", F.lit(False))
            .withColumn("is_injecting", F.lit(False))
            .withColumn("round", F.lit(rnd + 1))
            .select(*REQUEST_COLS)
        )
        # redirect targets join the frontier with hopCount UNCHANGED
        # (XmlDoc.cpp:15371-15385); the 301 source is never indexed and
        # contributes no sniTable inlink (parent_domain null)
        red = (f.filter(F.col("is_redirect")
                        & F.col("redirect_to").isNotNull())
               .select(F.col("redirect_to").alias("url"),
                       F.col("hop_count").alias("src_hop"),
                       F.col("spidered_time").alias("added_time"),
                       F.col("uh48").alias("src_uh48")))
        n = red.withColumn("n", self._normalize("url"))
        red_req = (
            n.filter(F.col("n.url_norm").isNotNull())
            .select(F.col("n.url_norm").alias("url"),
                    F.col("n.host").alias("host"),
                    F.col("n.domain").alias("domain"),
                    F.col("n.tld").alias("tld"),
                    F.col("n.path_cgi").alias("path_cgi"),
                    F.col("n.is_www").alias("is_www"),
                    "added_time", "src_hop", "src_uh48")
            .withColumn("uh48", uh48_udf("url"))
            .withColumn("hop_count",
                        F.when(F.col("path_cgi") == "/", 0)
                        .otherwise(F.col("src_hop")).cast("int"))
            .withColumn("discovery_time", F.col("added_time"))
            .withColumn("parent_uh48", F.col("src_uh48"))
            .withColumn("parent_domain", F.lit(None).cast("string"))
            .withColumn("is_add_url", F.lit(False))
            .withColumn("is_injecting", F.lit(False))
        )
        red_req = (self._attach_host_dim(red_req)
                   .withColumn("round", F.lit(rnd + 1))
                   .select(*REQUEST_COLS))
        return new_replies, new_req.unionByName(red_req)

    # ----------------------------------------------------------------- run
    def run(self, max_rounds: int | None = None,
            progress=None) -> snap.Manifest:
        """Run (or resume) the crawl to completion.  Resume reads the last
        committed manifest and continues from completed_rounds — a killed
        job replays nothing and loses nothing (snapshot isolation)."""
        cfg = self.cfg
        max_rounds = max_rounds or cfg.max_rounds
        m = self.fmt.load()
        if m is None:
            m = self.fmt.begin(wave_start_ms=cfg.wave_start_ms)
            self.ingest_seeds(m)
            self.fmt.commit(m)
        while not m.finished and m.completed_rounds < max_rounds:
            stats = self._run_round(m)
            if progress:
                progress(stats)
            # periodic Rdb-merge analogue: bound the per-round re-read cost
            # (each round unions all live generations) by rewriting the log
            # to its keep-rule base every compact_every rounds
            if (cfg.compact_every and not m.finished
                    and m.completed_rounds % cfg.compact_every == 0):
                self.compact()
                m = self.fmt.load()
        return m

    def step(self) -> RoundStats | None:
        """Run exactly ONE spider round (ingesting seeds first if this is
        a fresh state dir); None once the crawl is complete.  This is the
        single-collection launch unit the multi-collection round-robin
        scheduler rotates over (SpiderLoop.cpp:503-539)."""
        m = self.fmt.load()
        if m is None:
            m = self.fmt.begin(wave_start_ms=self.cfg.wave_start_ms)
            self.ingest_seeds(m)
            self.fmt.commit(m)
        if m.finished:
            return None
        return self._run_round(m)

    def _run_round(self, m: snap.Manifest) -> RoundStats:
        rnd = m.completed_rounds
        wave_start = m.wave_start_ms
        if self._robots_compiled_at_ms is None and m.robots_compiled_at_ms:
            # resume: restore the robots-cache stamp and the dim effective
            # AT that stamp, so refresh timing matches a continuous run
            self._robots_compiled_at_ms = m.robots_compiled_at_ms
            self.hosts.unpersist()
            self.hosts = self._compile_hosts(m.robots_compiled_at_ms // 1000)
        self._maybe_refresh_robots(wave_start)
        m.robots_compiled_at_ms = self._robots_compiled_at_ms or 0
        requests = self._read_all("requests", m)
        replies = self._read_all("replies", m)
        # per-stage wall clocks at the plan's action boundaries — the
        # statsdb/PagePerf-style breakdown bench.py reports per round so a
        # regression shows up per STAGE, not just in the round total.
        # (wave is cached, so each later action pays only its own stage.)
        import time as _time
        stage_t: dict[str, float] = {}
        _t0 = _time.time()
        # the round's SHARED latest-reply frame (F8), persisted once: it
        # feeds _candidates' rep, both write jobs' prev_errs and the
        # EDOCDUP index — five per-uh48 window shuffles over the growing
        # reply log per round without it (r5, VERDICT r4 item 3).  The
        # wave-write action (first job) materializes it as a side effect
        # of cand, so the persist costs no extra serial job.
        lr = (self._latest_reply(replies).persist()
              if replies is not None else None)
        cand = self._candidates(requests, replies, wave_start,
                                lr=lr).cache()
        wave = None
        try:
            eligible = cand.filter(F.col("eligible_ms") <= wave_start)
            wave = self._assemble_wave(eligible, wave_start, rnd).cache()
            # FUSED (r4, VERDICT r3 item 4): the wave write IS the
            # assemble action — row count and the next round's clock
            # (max fetch end) ride the write job as Observations, so the
            # old separate wave.agg() job is gone.  An empty wave writes
            # an empty dir, which committed_dirs skips (rows == 0).
            n_wave, obs = self._write(
                wave.select(*WAVE_COLS), "waves", rnd, m,
                extra_metrics={"max_end": F.max(
                    F.col("fetch_at_ms") + self.cfg.fetch_duration_ms)})
            max_end = obs["max_end"]
            stage_t["assemble_wave_write"] = _time.time() - _t0
            if n_wave == 0:
                row = (cand.filter(F.col("eligible_ms") > wave_start)
                       .agg(F.min("eligible_ms").alias("mf")).collect()[0])
                min_future = row["mf"]
                self.fmt.record_write(m, "replies", rnd, 0)
                m.completed_rounds = rnd + 1
                if (min_future is not None
                        and min_future - wave_start <= HORIZON_MS):
                    m.wave_start_ms = max(
                        int(min_future),
                        wave_start + self.cfg.round_interval_ms)
                else:
                    m.finished = True
                self.fmt.commit(m)
                return RoundStats(rnd, 0, 0, jumped=not m.finished)

            _t0 = _time.time()
            new_replies, new_req = self._simulate_fetch(wave, replies, rnd,
                                                        lr=lr)
            if self.use_bloom_seen:
                # F5 scale path: Bloom-prefilter new outlinks against the
                # URL-seen set with exact hop-aware fallback (seen.py —
                # provably byte-identical to the append-everything path).
                # The BloomState is maintained incrementally: seeded from
                # the frontier once (or on resume), then OR-updated with
                # each round's appended keys — no per-round rebuild.
                from .seen import BloomState, filter_new_requests_incremental
                # exact-fallback seen set: the keep-rule comparison only
                # needs min (hop_count, discovery_time) per uh48 — a
                # partial-aggregating groupBy (map-side combine) instead
                # of the full F7 row_number window (r5): same values the
                # window's first row carries for those two fields, one
                # cheaper shuffle over the frontier inside the requests
                # write job.
                seen = (requests.groupBy("uh48")
                        .agg(F.min(F.struct("hop_count", "discovery_time"))
                             .alias("_m"))
                        .select("uh48",
                                F.col("_m.hop_count").alias("hop_count"),
                                F.col("_m.discovery_time")
                                .alias("discovery_time")))
                self._join_bloom_thread()
                if self._bloom is None or self._bloom.overfull():
                    # size the (re)build from the observed frontier so a
                    # rebuild can't be immediately overfull again
                    n_seen = requests.count()
                    if self._bloom is not None:
                        self._bloom.release()
                    self._bloom = BloomState(
                        bits_per_bucket=BloomState.size_bits_per_bucket(
                            n_seen))
                    self._bloom.add_df(requests.select("uh48", "first_ip"))
                new_req = filter_new_requests_incremental(
                    new_req, seen, self._bloom).select(*REQUEST_COLS)
            # the replies and requests writes each run the fetch-sim
            # lineage column-pruned to their own projection (cheaper
            # than persisting the full frame — see _simulate_fetch).
            # They are INDEPENDENT given the cached wave (different
            # output tables, different projections), so the two write
            # jobs run on concurrent driver threads: at fixture scale
            # the round cost is fixed job-submission + broadcast-build
            # latency, and overlapping the two pipelines hides one
            # side's latency behind the other (at cluster scale they
            # simply share the executor pool, like any two concurrent
            # Spark jobs under the default FIFO scheduler).  Manifest
            # records happen on this thread, after both finish, in the
            # original replies-then-requests order.
            from pyspark.util import InheritableThread
            results: dict[str, object] = {}

            def _bg(name: str, df: DataFrame, table: str, r: int) -> None:
                try:
                    results[name] = self._write_data(df, table, r)
                except BaseException as exc:  # surface on the main thread
                    results[name] = exc

            t_rep = InheritableThread(
                target=_bg, args=("replies", new_replies, "replies", rnd))
            t_req = InheritableThread(
                target=_bg, args=("requests", new_req, "requests", rnd + 1))
            # start/join under try/finally: if a start() throws or the
            # main thread is interrupted mid-sequence, every thread that
            # DID start is still joined before the exception propagates —
            # otherwise the finally below would unpersist cand/wave under
            # an in-flight write job (ADVICE r4)
            started = []
            try:
                for t in (t_rep, t_req):
                    t.start()
                    started.append(t)
            finally:
                for t in started:
                    t.join()
            for name in ("replies", "requests"):
                res = results.get(name)
                if isinstance(res, BaseException):
                    raise res
                if res is None:  # thread never started/never reported
                    raise RuntimeError(
                        f"{name} write thread produced no result")
            self.fmt.record_write(m, "replies", rnd, results["replies"][0])
            n_new = results["requests"][0]
            self.fmt.record_write(m, "requests", rnd + 1, n_new)
            stage_t["replies_and_requests_writes"] = _time.time() - _t0
            self.last_round_timings = stage_t
            if self.use_bloom_seen and n_new:
                # Bloom maintenance off the round's critical path (r5):
                # the OR-merge + eager checkpoint of the appended keys is
                # only needed by the NEXT round's probe, so it overlaps
                # the manifest commit and the next round's candidate
                # build; _join_bloom_thread() re-serializes before any
                # bloom access (probe/rebuild/release).
                delta = (self.spark.read.parquet(
                    self.fmt.data_path("requests", rnd + 1))
                    .select("uh48", "first_ip"))

                def _bloom_bg(bloom=self._bloom, df=delta) -> None:
                    try:
                        bloom.add_df(df)
                    except BaseException as exc:
                        self._bloom_thread_exc = exc

                t_bloom = InheritableThread(target=_bloom_bg)
                t_bloom.start()
                self._bloom_thread = t_bloom
            m.completed_rounds = rnd + 1
            # next round's clock: prior fetches done, and no earlier than
            # the micro-batch trigger cadence (round_interval_ms — the
            # batch analogue of the reference's continuous spider loop
            # re-entering SpiderLoop::spiderDoledUrls on a timer)
            m.wave_start_ms = max(wave_start + 1, int(max_end),
                                  wave_start + self.cfg.round_interval_ms)
            self.fmt.commit(m)
            return RoundStats(rnd, n_wave, n_new, jumped=False)
        finally:
            cand.unpersist()
            if wave is not None:
                wave.unpersist()
            if lr is not None:
                lr.unpersist()

    def close(self) -> None:
        """Release every block-manager resource this runner holds: the
        cached dimension frames (which stay usable — they just recompute
        if referenced again) and the Bloom URL-seen checkpoints (which do
        not).  Idempotent.  A long test session that builds many runners
        against one SparkSession leaks all of these without it."""
        from ..memutil import safe_unpersist
        safe_unpersist(self.hosts)
        safe_unpersist(self.outcomes)
        safe_unpersist(self.site_list_domains)
        self._join_bloom_thread()
        if self._bloom is not None:
            self._bloom.release()
            self._bloom = None

    # ----------------------------------------------------------- compaction
    def compact(self) -> None:
        """F7 physical compaction — the Rdb merge (RdbMerge.cpp:532 →
        Spider.cpp:3714-4021) as a table rewrite: requests collapse to the
        per-uh48 keep-rule winner (carrying min(round) so url_seen is
        preserved), replies collapse to the newest per uh48.  Crash-safe:
        the compacted generation writes to fresh ``round=-G`` dirs and only
        the atomic manifest commit switches readers over — a crash mid-
        compaction leaves the old snapshot intact (Iceberg-style rewrite)."""
        # an in-flight background bloom add reads the newest requests dir
        # — finish it before rewriting the table underneath it
        self._join_bloom_thread()
        m = self.fmt.load()
        if m is None or self._read_all("requests", m) is None:
            return    # nothing committed yet — compaction is a no-op
        gen = min([0] + [int(k.split("/")[1]) for k in m.rows
                         if k.startswith("requests/")]) - 1
        requests = self._read_all("requests", m)
        replies = self._read_all("replies", m)
        w_seen = Window.partitionBy("uh48")
        req_base = (self._dedup_requests(
            requests.withColumn("round", F.min("round").over(w_seen)))
            .select(*REQUEST_COLS))
        old_req_keys = [k for k in m.rows if k.startswith("requests/")]
        n = self._write(req_base, "requests", gen, m)
        for k in old_req_keys:
            m.rows.pop(k, None)
            m.files.pop(k, None)
        if replies is not None:
            rep_base = self._latest_reply(replies).select(*REPLY_COLS)
            old_rep_keys = [k for k in m.rows if k.startswith("replies/")]
            self._write(rep_base, "replies", gen, m)
            for k in old_rep_keys:
                m.rows.pop(k, None)
                m.files.pop(k, None)
        self.fmt.commit(m)

    # -------------------------------------------------------------- outputs
    # All accessors return schema-correct EMPTY frames when the crawl never
    # committed the corresponding log (e.g. every seed robots-blocked or
    # quota-rejected before wave 1) — a zero-fetch crawl is a legitimate
    # outcome, not an assertion failure.
    def crawl_order(self) -> DataFrame:
        m = self.fmt.load()
        waves = self._read_all("waves", m)
        if waves is None:
            return self.spark.createDataFrame(
                [], "round int, seq_in_round int, uh48 long, "
                    "url_norm string, first_ip long, priority int, "
                    "hop_count int, fetch_at_ms long")
        return waves.select("round", "seq_in_round", "uh48",
                            F.col("url").alias("url_norm"), "first_ip",
                            "priority", "hop_count", "fetch_at_ms")

    def url_seen(self) -> DataFrame:
        m = self.fmt.load()
        req = self._read_all("requests", m)
        if req is None:
            return self.spark.createDataFrame(
                [], "uh48 long, url_norm string, first_seen_round int")
        return req.groupBy("uh48").agg(
            F.min_by("url", "round").alias("url_norm"),
            F.min("round").alias("first_seen_round"))

    def replies_log(self) -> DataFrame:
        """The committed reply log (one row per simulated fetch, all
        rounds) — the input the statsdb bridge
        (pipeline.statsdb.crawl_stats_to_statsdb) turns into per-second
        scheduler stat buckets, mirroring the reference's addStat calls
        from the spider loop (Statsdb.cpp)."""
        m = self.fmt.load()
        rep = self._read_all("replies", m)
        if rep is None:
            return self.spark.createDataFrame(
                [], "first_ip long, uh48 long, domain string, "
                    "spidered_time long, err_code int, err_count int, "
                    "http_status int, is_indexed boolean, "
                    "content_hash32 long, site_rank int, "
                    "crawl_delay_ms long, download_end_ms long, "
                    "percent_changed_per_day double, round int")
        return rep.select(*REPLY_COLS)

    def crawl_stats(self) -> DataFrame:
        """Crawlinfo (SpiderLoop.cpp:2041-2360 aggregated every 20 s in the
        reference): per-round fetch counts, error breakdown, discovery rate,
        politeness utilization — one aggregate over the committed logs."""
        m = self.fmt.load()
        replies = self._read_all("replies", m)
        requests = self._read_all("requests", m)
        waves = self._read_all("waves", m)
        if replies is None or requests is None:
            # legitimate zero-fetch crawl (all seeds robots-blocked /
            # force-deleted): empty frame, stable schema
            return self.spark.createDataFrame(
                [], "round int, fetched long, indexed long, errors long, "
                    "ips_touched long, wave_span_ms long, "
                    "discovered_links long, distinct_urls long, "
                    "max_delay_ms long")
        rep = replies.groupBy("round").agg(
            F.count("*").alias("fetched"),
            F.sum(F.when(F.col("err_code") == 0, 1).otherwise(0))
            .alias("indexed"),
            F.sum(F.when(F.col("err_code") != 0, 1).otherwise(0))
            .alias("errors"),
            F.count_distinct("first_ip").alias("ips_touched"),
            (F.max("download_end_ms") - F.min("download_end_ms"))
            .alias("wave_span_ms"))
        disc = requests.groupBy("round").agg(
            F.count("*").alias("discovered_links"),
            F.count_distinct("uh48").alias("distinct_urls"))
        wv = waves.groupBy("round").agg(
            F.max("delay_ms").alias("max_delay_ms")) if waves is not None \
            else None
        out = rep.join(disc, "round", "full")
        if wv is not None:
            out = out.join(wv, "round", "left")
        return out.orderBy("round")

    def link_graph(self) -> DataFrame:
        """Linkdb analogue over the crawl's own discoveries: one
        (src, dst) row per distinct parent→child link observed in the
        request log (Linkdb.cpp stores one key per linkee/linker pair;
        Msg25 aggregates them).  Seeds/injects (no parent) are excluded.
        Feed to ``graph.linkrank.inlink_counts`` / ``pagerank`` for the
        siteNumInlinks / siteRank signals the reference derives from
        Linkdb."""
        m = self.fmt.load()
        req = self._read_all("requests", m)
        if req is None:
            return self.spark.createDataFrame([], "src long, dst long")
        return (req.filter((F.col("parent_uh48") >= 0)   # -1 = seed/inject
                           & (F.col("parent_uh48") != F.col("uh48")))
                .select(F.col("parent_uh48").alias("src"),
                        F.col("uh48").alias("dst"))
                .distinct())

    def indexed_docs(self) -> DataFrame:
        """Titledb analogue: the pages the crawl actually INDEXED — the
        latest reply per uh48 with ``is_indexed`` (XmlDoc indexes the doc
        into titledb/posdb after a good download, XmlDoc.cpp indexDoc
        path) — joined back to the docs dimension for their span content.

        Returns (uh48, url, spans, text) where ``text`` is the
        concatenation of the text spans in offset order (media_ref spans
        excluded), ready for ``search.postings.build_postings`` /
        ``search.summary.summarize`` — the hand-off from the crawl tier
        to the query-serving tier."""
        m = self.fmt.load()
        replies = self._read_all("replies", m)
        waves = self._read_all("waves", m)
        if replies is None or waves is None:
            from ..schemas import SPAN
            return self.spark.createDataFrame([], T.StructType([
                T.StructField("uh48", T.LongType(), False),
                T.StructField("url", T.StringType(), False),
                T.StructField("spans", T.ArrayType(SPAN), False),
                T.StructField("text", T.StringType(), False)]))
        indexed = (self._latest_reply(replies)
                   .filter(F.col("is_indexed")).select("uh48"))
        urls = waves.select("uh48", "url").distinct()
        text = F.concat_ws(
            " ",
            F.transform(
                F.filter("spans", lambda s: s["kind"] == F.lit("text")),
                lambda s: s["text"]))
        return (indexed.join(urls, "uh48")
                .join(self.docs, F.col("url") == F.col("doc_id"))
                .select("uh48", "url", "spans", text.alias("text")))

    def host_final(self) -> DataFrame:
        m = self.fmt.load()
        replies = self._read_all("replies", m)
        waves = self._read_all("waves", m)
        if replies is None or waves is None:
            return self.spark.createDataFrame(
                [], "first_ip long, last_download_end_ms long, "
                    "crawl_delay_ms long")
        ends = replies.groupBy("first_ip").agg(
            F.max("download_end_ms").alias("last_download_end_ms"))
        delays = waves.groupBy("first_ip").agg(
            F.max_by("delay_ms", F.struct("round", "fetch_at_ms"))
            .alias("crawl_delay_ms"))
        return ends.join(delays, "first_ip", "left")
