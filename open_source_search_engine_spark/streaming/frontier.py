"""Streaming crawl frontier: the spider loop as Structured Streaming.

The reference's add-url surface (PageAddUrl.cpp) feeds SpiderLoop's
event loop continuously; SURVEY.md §7 maps a crawl round to a batch
job.  This module is the streaming form of that loop's admission path:

- ``stream_url_seen`` — F5 (URL-seen dedup) on an unbounded request
  stream: the first request per uh48 survives, later sightings drop.
  Spiderdb's url-seen state is permanent, so the faithful form keeps
  unbounded dedup state (Spark scales it with RocksDB state stores);
  ``bounded=True`` switches to ``dropDuplicatesWithinWatermark`` for
  deployments that can bound re-sighting lag.
- ``stream_crawl_waves`` — micro-batch = crawl round: each trigger
  anti-joins the batch against the accumulated seen-state (exact F5),
  runs the PRODUCTION wave assembly (pipeline.crawl
  assemble_wave_from_candidates: filter ladder -> eligibility ->
  salted winner top-K -> sharded budgets -> politeness) over the new
  requests, and appends the wave.  Wave start times advance
  deterministically per batch id so runs are replayable.

Both reuse the batch plans unchanged — the point of declaring the
logical plan once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REQUEST_STREAM_SCHEMA = ("uh48 long, url string, first_ip long, "
                         "hop_count int, added_time long")


def stream_url_seen(requests: DataFrame, bounded: bool = False,
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming F5: keep the first request per uh48.

    ``requests`` needs ``uh48`` and ``added_time`` (epoch seconds).
    Unbounded state by default — url-seen is forever, like Spiderdb;
    ``bounded=True`` uses the watermark-scoped dedup operator instead."""
    ts = requests.withColumn(
        "_ts", F.timestamp_seconds(F.col("added_time")))
    if bounded:
        return (ts.withWatermark("_ts", watermark)
                .dropDuplicatesWithinWatermark(["uh48"]).drop("_ts"))
    return ts.dropDuplicates(["uh48"]).drop("_ts")


def _batch_candidates(batch: DataFrame, wave_start_ms: int):
    """Minimal candidate projection for never-fetched requests — the
    same ladder + eligibility glue the bench's production path uses
    (requests carry no reply yet, so the reply-side atoms see the
    new-request defaults)."""
    from ..config import CrawlConfig, default_url_filters
    from ..pipeline.filters import compile_rule_match, rule_arrays

    cfg = CrawlConfig()
    cand = (batch
            # ladder inputs derived from the request itself (new
            # requests carry no reply): path+cgi from the url, add-url
            # provenance from hop 0, www from the host label
            .withColumn("path_cgi", F.regexp_replace(
                F.col("url"), r"^[a-z][a-z0-9+.-]*://[^/]*", ""))
            .withColumn("path_cgi",
                        F.when(F.col("path_cgi") == "", "/")
                        .otherwise(F.col("path_cgi")))
            .withColumn("is_add_url", F.col("hop_count") == 0)
            .withColumn("is_injecting", F.lit(False))
            .withColumn("is_www", F.col("url").rlike(r"^https?://www\."))
            .withColumn("site_num_inlinks", F.lit(0))
            .withColumn("robots_delay_ms", F.lit(0).cast("long"))
            .withColumn("ip_twitchy", F.lit(False))
            .withColumn("has_reply", F.lit(False))
            .withColumn("err_code", F.lit(0))
            .withColumn("err_count", F.lit(0))
            .withColumn("http_status", F.lit(0))
            .withColumn("is_indexed", F.lit(False))
            .withColumn("last_spider_time_s", F.lit(0).cast("long"))
            .withColumn("ip_last_end", F.lit(0).cast("long"))
            .withColumn("ufn", compile_rule_match(
                default_url_filters(), wave_start_ms // 1000)))
    for name, col in rule_arrays(default_url_filters()).items():
        cand = cand.withColumn(name, col)
    cand = (cand.filter((F.col("ufn") >= 0) & ~F.col("force_delete"))
            .withColumn("eligible_ms",
                        F.greatest(F.col("added_time") * 1000,
                                   F.col("ip_last_end")
                                   + F.col("ip_wait_ms")))
            .filter(F.col("eligible_ms") <= wave_start_ms))
    return cand, cfg


def stream_crawl_waves(spark: SparkSession, source_dir: str,
                       state_dir: str,
                       base_wave_start_ms: int = 1_700_086_400_000,
                       round_interval_ms: int = 60_000,
                       trigger_once: bool = True):
    """readStream over a drop-directory of request parquet → per
    micro-batch: exact URL-seen anti-join vs accumulated state, then
    the production wave assembly over the survivors, appending
    ``waves/`` and ``seen/`` under ``state_dir``."""
    from ..pipeline.crawl import assemble_wave_from_candidates

    seen_dir = os.path.join(state_dir, "seen")
    waves_dir = os.path.join(state_dir, "waves")
    checkpoint = os.path.join(state_dir, "checkpoint")

    def _one_round(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        new = batch.dropDuplicates(["uh48"])
        if os.path.isdir(seen_dir) and any(
                f.endswith(".parquet") for f in os.listdir(seen_dir)):
            seen = sp.read.parquet(seen_dir).select("uh48")
            new = new.join(seen, "uh48", "left_anti")
        new = new.localCheckpoint()         # cut the double-read lineage
        wave_start = base_wave_start_ms + batch_id * round_interval_ms
        cand, cfg = _batch_candidates(new, wave_start)
        wave = assemble_wave_from_candidates(
            cand, cfg, wave_start, rnd=batch_id,
            payload=new.select("uh48", "url"))
        wave.write.mode("append").parquet(waves_dir)
        new.select("uh48").write.mode("append").parquet(seen_dir)

    raw = (spark.readStream.schema(REQUEST_STREAM_SCHEMA)
           .option("maxFilesPerTrigger", 1)     # one drop = one round
           .parquet(source_dir))
    writer = (raw.writeStream.foreachBatch(_one_round)
              .option("checkpointLocation", checkpoint))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
