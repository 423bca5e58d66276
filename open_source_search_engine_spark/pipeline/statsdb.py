"""Statsdb — per-second operation statistics (Statsdb.cpp:244-420
``addStat``), the reference's metrics time-series store.

Reference semantics: every operation ``(label, t1_ms, t2_ms, value)``
is spread across the one-second buckets it overlaps, each bucket
accumulating the op's contribution weighted by the fraction of the op's
duration inside that second (``fractionTime``, Statsdb.cpp:314):

- ``totalOps      += 1      * fraction``
- ``totalQuantity += value  * fraction``
- ``totalTime     += dtSecs * fraction``  — which algebraically equals
  ``overlap_ms / 1000`` per bucket, so we store exact overlap ms.

Edge rules kept: a zero-duration op gets ``t2 = t1 + 1``
(Statsdb.cpp:285), and ops lasting >= 30 s are discarded because their
buckets were already flushed (Statsdb.cpp:297-301).  The bucket key is
``(time1 = tx/1000, labelHash = hash32n(label))`` (StatKey,
Statsdb.h:196-204); we key by the label string and expose the hash32
separately (same g_hashtab family as uh48).

Spark shape — pure Catalyst, two narrow steps: ``sequence`` + explode
generates each op's <=30 bucket rows (bounded fan-out), then ONE
map-side-combined groupBy(label, second).  Arithmetic is integer-exact
(parts-per-million contributions floored per row, like the repo's other
scaled-integer scores) so the aggregate hashes identically across
engines and partitionings — the reference's float accumulation is
order-dependent and could not be value-pinned.

At 100 TB: the explode fan-out is <=30x and the aggregate output is
bounded by (labels x seconds), so the shuffle is tiny regardless of op
volume; the groupBy key is (label, second) which distributes evenly
unless one label dominates one second — exactly the hot-bucket the
reference's single RdbTree node takes too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000           # contribution scale (parts per million)
MAX_OP_SECS = 30          # Statsdb.cpp:297 — older buckets already flushed


def add_stats(ops: DataFrame, label_col: str = "label",
              t1_col: str = "t1_ms", t2_col: str = "t2_ms",
              value_col: str = "value") -> DataFrame:
    """ops(label, t1_ms, t2_ms, value:long) -> per-second stat buckets
    ``(label, t_sec, total_ops_ppm, total_quantity_ppm, total_time_ms)``.

    ``total_ops_ppm/1e6`` is the reference's m_totalOps,
    ``total_quantity_ppm/1e6`` its m_totalQuantity, and
    ``total_time_ms/1000`` its m_totalTime (seconds)."""
    t1 = F.col(t1_col).cast("long")
    t2r = F.col(t2_col).cast("long")
    t2 = F.when(t2r == t1, t1 + 1).otherwise(t2r)     # Statsdb.cpp:285
    base = (ops.select(F.col(label_col).alias("label"),
                       t1.alias("_t1"), t2.alias("_t2"),
                       F.col(value_col).cast("long").alias("_v"))
            .withColumn("_dt", F.col("_t2") - F.col("_t1"))
            .filter(F.col("_dt") < MAX_OP_SECS * 1000)   # Statsdb.cpp:297
            .filter(F.col("_dt") > 0))
    secs = F.sequence(F.floor(F.col("_t1") / 1000).cast("long"),
                      F.floor((F.col("_t2") - 1) / 1000).cast("long"))
    rows = base.select("label", "_t1", "_t2", "_dt", "_v",
                       F.explode(secs).alias("t_sec"))
    overlap = (F.least(F.col("_t2"), (F.col("t_sec") + 1) * 1000)
               - F.greatest(F.col("_t1"), F.col("t_sec") * 1000))
    # exact integer division (`div`, not floor(double/)): the numerator
    # reaches ~1e13 where double ulp exceeds the 1/dt fraction spacing,
    # so a float path could misround vs the DuckDB oracle's bigint math
    return (rows
            .withColumn("_ov", overlap)
            .withColumn("_ops_ppm",
                        F.expr(f"(_ov * {PPM}L) div _dt"))
            .withColumn("_qty_ppm",
                        F.expr(f"(_v * _ov * {PPM}L) div _dt"))
            .groupBy("label", "t_sec")
            .agg(F.sum("_ops_ppm").alias("total_ops_ppm"),
                 F.sum("_qty_ppm").alias("total_quantity_ppm"),
                 F.sum("_ov").alias("total_time_ms")))


def label_hash32(labels) -> "list[int]":
    """hash32n of each label (StatKey.m_labelHash, Statsdb.cpp:283) —
    same tabulation table as the URL hashes."""
    from ..functions.ghash import hash32_bytes
    return [int(h) for h in
            hash32_bytes([str(x).encode("utf-8") for x in labels])]


def stat_series(stats: DataFrame, label: str) -> DataFrame:
    """One label's per-second series, gap-free ordering — the
    Statsdb graph page's line source (Statsdb.cpp:makeGIF path)."""
    return (stats.filter(F.col("label") == label)
            .orderBy("t_sec"))


def crawl_stats_to_statsdb(replies: DataFrame,
                           fetch_duration_ms: int = 1000) -> DataFrame:
    """Bridge: the crawl's reply log as statsdb ops — one op per fetch
    (label = 'spider_fetch', op window = the download's
    [end - fetch_duration, end], value = 1) plus one per error reply,
    mirroring the reference's addStat calls from the spider loop.
    ``fetch_duration_ms`` is the CrawlConfig constant that produced
    download_end_ms (crawl.py _simulate_fetch)."""
    start = (F.col("download_end_ms") - F.lit(fetch_duration_ms))
    fetch = replies.select(
        F.lit("spider_fetch").alias("label"),
        start.alias("t1_ms"),
        F.col("download_end_ms").alias("t2_ms"),
        F.lit(1).alias("value"))
    errors = (replies.filter(F.col("err_code") != 0)
              .select(F.lit("spider_error").alias("label"),
                      start.alias("t1_ms"),
                      F.col("download_end_ms").alias("t2_ms"),
                      F.lit(1).alias("value")))
    return add_stats(fetch.unionByName(errors))
