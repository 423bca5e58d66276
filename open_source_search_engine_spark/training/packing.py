"""Sequence packing for LLM training — the concat-and-chunk layout
(GPT-2/3 style: tokenized documents joined by an EOS token into one
stream, cut into fixed-length context windows; Brown et al. 2020 §2.1
"documents are packed into sequences"), plus per-source stratified
packing.

Not a reference-repo operator — part of the training-data tier this
engine adds on top of the crawl (build brief).  The whole computation is
pure Catalyst:

1. each doc's token count (+1 EOS);
2. its exclusive prefix-sum offset in the stream — computed with the
   same two-pass range-sharded prefix sum as
   ``pipeline.domain_quota_sample_sharded`` so no window ever sees an
   unbounded partition;
3. the chunk ids it overlaps (``sequence`` + explode, fan-out bounded
   by ceil(doc_len / context_len) + 1) and the in-doc token span each
   chunk takes.

With ``group_col`` (e.g. ``source``) every group packs its own stream —
domain-stratified packing, fully partition-parallel.  Without it the
stream is global: the only unpartitioned window runs over the RANGE
PARTIALS table (n_doc_ranges rows — 10^4 rows for 10^10 docs at the
default range width), never over per-doc rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(docs: DataFrame, context_len: int = 2048,
                   text_col: str = "text", id_col: str = "doc_id",
                   group_col: str | None = None,
                   range_width: int = 1 << 20) -> DataFrame:
    """documents -> packed-span table
    ``(group, doc_id, n_tokens, chunk_id, tok_start, tok_end)``:
    chunk ``chunk_id`` contains tokens ``[tok_start, tok_end)`` of
    ``doc_id`` (EOS counted as the doc's final token).  Every chunk is
    exactly ``context_len`` tokens except the stream's last."""
    grp = (F.col(group_col) if group_col else F.lit("")).alias("grp")
    toks = docs.select(
        grp, F.col(id_col).alias("doc_id"),
        (F.size(F.split(F.trim(F.col(text_col)), r"\s+")) + 1)
        .cast("long").alias("n_tokens"),           # +1 = EOS separator
        (F.col(id_col) / range_width).cast("long").alias("rng"))
    # pass 1: per-(group, doc_id-range) token totals
    partials = toks.groupBy("grp", "rng").agg(
        F.sum("n_tokens").alias("rng_tokens"))
    # pass 2: running sum over the tiny partials table -> range offsets
    off_w = (Window.partitionBy("grp").orderBy("rng")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = partials.withColumn(
        "rng_offset",
        F.coalesce(F.sum("rng_tokens").over(off_w), F.lit(0)))
    # per-doc exclusive offset, windowed only within (group, range)
    in_rng = (Window.partitionBy("grp", "rng").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, -1))
    placed = (toks
              .join(offsets.select("grp", "rng", "rng_offset"),
                    ["grp", "rng"])
              .withColumn("tok_offset",
                          F.col("rng_offset")
                          + F.coalesce(F.sum("n_tokens").over(in_rng),
                                       F.lit(0))))
    # chunk ids this doc overlaps: floor(start/L) .. floor((end-1)/L)
    start = F.col("tok_offset")
    end = F.col("tok_offset") + F.col("n_tokens")
    chunks = placed.select(
        "grp", "doc_id", "n_tokens", "tok_offset",
        F.explode(F.sequence(
            F.floor(start / context_len),
            F.floor((end - 1) / context_len))).alias("chunk_id"))
    c0 = F.col("chunk_id") * context_len            # chunk's global start
    return (chunks.select(
        F.col("grp").alias("group"), "doc_id", "n_tokens", "chunk_id",
        F.greatest(c0 - F.col("tok_offset"), F.lit(0))
        .cast("long").alias("tok_start"),
        F.least(c0 + context_len - F.col("tok_offset"),
                F.col("n_tokens")).cast("long").alias("tok_end")))


def packing_stats(spans: DataFrame, context_len: int = 2048) -> DataFrame:
    """Per-group packing summary: chunks, docs, tokens, and the padding
    waste of the final partial chunk — the packing-efficiency readout."""
    per_chunk = spans.groupBy("group", "chunk_id").agg(
        F.sum(F.col("tok_end") - F.col("tok_start")).alias("fill"))
    return (per_chunk.groupBy("group").agg(
        F.count("*").alias("n_chunks"),
        F.sum("fill").alias("n_tokens"),
        (F.count("*") * context_len - F.sum("fill"))
        .alias("pad_tokens")))
