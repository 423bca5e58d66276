"""Gopher/C4-style document-shape quality filters.

The standard pre-dedup heuristics a training-data pipeline applies at
ingest (Rae et al. 2021, "Scaling Language Models" §A1.1 'Gopher rules';
Raffel et al. 2020 C4): word-count bounds, mean word length, fraction of
words containing an alphabetic character, symbol-to-word ratio, and the
repetition signal (share of tokens covered by the most frequent word
bigram).  A 100 TB corpus runs these before MinHash/SimHash dedup
because they're one scan, no shuffle except the per-doc bigram count.

Everything is pure Catalyst (split → posexplode → groupBy + one lead()
window for bigrams) and every emitted measure is a scaled integer
computed with floor division — BIGINT arithmetic hashes identically
across engines, so the DuckDB oracle can pin exact values instead of
float-rounded approximations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Gopher-rule thresholds (scaled-integer forms of the published bounds)
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN_X100 = 300     # mean word length >= 3
MAX_MEAN_WORD_LEN_X100 = 1_000   # mean word length <= 10
MIN_ALPHA_X100 = 80              # >= 80% of words contain [a-z]
MAX_SYMBOL_X1000 = 100           # <= 0.1 symbol words ('#'/ellipsis) per word
MAX_TOP_BIGRAM_X1000 = 180       # top word-bigram covers <= 18% of tokens


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc shape measures + pass/fail flags.

    Returns (doc_id, n_words, mean_word_len_x100, frac_alpha_x100,
    symbol_ratio_x1000, top_bigram_x1000, gopher_pass)."""
    toks = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+"))
        .alias("pos", "w"))
        .filter(F.col("w") != ""))
    base = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(F.length("w")).alias("sum_len"),
        F.sum(F.when(F.col("w").rlike("[a-z]"), 1).otherwise(0))
        .alias("n_alpha"),
        F.sum(F.when(F.col("w").contains("#")
                     | F.col("w").contains("...")
                     | F.col("w").contains("…"), 1).otherwise(0))
        .alias("n_sym"))
    nxt = F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos"))
    bigram_top = (toks.withColumn("w2", nxt)
                  .filter(F.col("w2").isNotNull())
                  .groupBy("doc_id", "w", "w2")
                  .agg(F.count("*").alias("c"))
                  .groupBy("doc_id")
                  .agg(F.max("c").alias("top_bigram_cnt")))
    out = (base.join(bigram_top, "doc_id", "left")
           .fillna({"top_bigram_cnt": 0})
           .select(
               "doc_id", "n_words",
               F.expr("100 * sum_len div n_words")
               .alias("mean_word_len_x100"),
               F.expr("100 * n_alpha div n_words").alias("frac_alpha_x100"),
               F.expr("1000 * n_sym div n_words")
               .alias("symbol_ratio_x1000"),
               F.expr("1000 * 2 * top_bigram_cnt div n_words")
               .alias("top_bigram_x1000")))
    return out.withColumn(
        "gopher_pass",
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mean_word_len_x100").between(MIN_MEAN_WORD_LEN_X100,
                                              MAX_MEAN_WORD_LEN_X100)
        & (F.col("frac_alpha_x100") >= MIN_ALPHA_X100)
        & (F.col("symbol_ratio_x1000") <= MAX_SYMBOL_X1000)
        & (F.col("top_bigram_x1000") <= MAX_TOP_BIGRAM_X1000))
