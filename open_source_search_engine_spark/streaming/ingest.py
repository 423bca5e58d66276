"""Structured Streaming surface.

The reference has no streaming runtime — its 'streaming' is the 50 ms/20 s
timer event loop (``Loop.cpp``/``JobScheduler.cpp``); SURVEY.md §7 maps the
spider round to batch jobs.  These entry points exist for the cases where a
Spark deployment WOULD stream:

- **continuous seed ingest**: `add-url` endpoints become a file/Kafka
  stream of raw URLs; `stream_seed_ingest` normalizes + hashes them with
  the same Arrow kernels inside ``foreachBatch`` and appends request rows
  to the frontier state dir, one committed micro-batch per round id.
- **windowed crawl telemetry**: the crawlinfo aggregation the reference
  refreshes every 20 s (``SpiderLoop.cpp:2041-2360``) as a watermarked
  tumbling-window aggregate over the reply stream.

Both reuse the batch plans unchanged — the point of declaring the logical
plan once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.udfs import make_normalize_udf, uh48_udf


def normalize_seed_stream(raw: DataFrame) -> DataFrame:
    """Streaming-safe projection: raw(url, added_time) → normalized request
    columns.  Works identically on a batch or streaming DataFrame (no
    aggregation, pure per-row projection through the Arrow kernels)."""
    n = make_normalize_udf()
    return (
        raw.withColumn("n", n("url"))
        .filter(F.col("n.url_norm").isNotNull())
        .select(F.col("n.url_norm").alias("url_norm"),
                F.col("n.host").alias("host"),
                F.col("n.domain").alias("domain"),
                F.col("added_time"))
        .withColumn("uh48", uh48_udf("url_norm"))
    )


def stream_seed_ingest(spark: SparkSession, source_dir: str,
                       checkpoint_dir: str, out_dir: str,
                       trigger_once: bool = True):
    """readStream over a drop-directory of seed parquet files →
    normalize/hash → append to ``out_dir``.  ``trigger_once`` processes the
    backlog and stops (micro-batch = crawl round); otherwise continuous."""
    raw = (spark.readStream
           .schema("url string, added_time long")
           .parquet(source_dir))
    req = normalize_seed_stream(raw)
    writer = (req.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def reply_telemetry_stream(replies: DataFrame,
                           window: str = "20 seconds") -> DataFrame:
    """Crawlinfo: per-window fetch counts/error rates with a watermark for
    late replies — the streaming form of the 20 s crawlinfo timer."""
    return (
        replies.withColumn("ts", F.timestamp_seconds(F.col("spidered_time")))
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", window), F.col("first_ip"))
        .agg(F.count("*").alias("fetches"),
             F.sum(F.when(F.col("err_code") != 0, 1).otherwise(0))
             .alias("errors"),
             F.max("download_end_ms").alias("last_download_end_ms"))
    )
