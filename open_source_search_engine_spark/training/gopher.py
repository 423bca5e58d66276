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

from typing import Iterator

import numpy as np
import pandas as pd
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


# ---------------------------------------------------------------------------
# Gopher repetition rules (Rae et al. 2021 Table A1): duplicate-line
# fractions and top n-gram character coverage.  Pure Catalyst — the line
# and n-gram tallies are partial-aggregatable groupBys, so at 100 TB each
# is one map-combined shuffle keyed by (doc_id, line | gram).
# ---------------------------------------------------------------------------

MAX_DUP_LINE_X1000 = 300        # <= 30% of lines are repeats of an earlier one
MAX_DUP_LINE_CHARS_X1000 = 200  # <= 20% of line characters are in repeats
MAX_TOP_NGRAM_X1000 = {2: 200, 3: 180, 4: 160}


def gopher_repetition(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-doc repetition measures as scaled integers.

    Lines are the corpus's own newlines if present, else deterministic
    10-token segments (``lines.segment_text``).  A line's duplicate
    occurrences are every occurrence after its first; the top n-gram
    measure is max(count * token-chars) over n-grams occurring >= 2
    times, relative to total token chars (DataTrove/NeMo-Curator's
    published integer form of the Gopher rule).

    Returns (doc_id, n_lines, dup_line_frac_x1000, dup_line_chars_x1000,
    top2_chars_x1000, top3_chars_x1000, top4_chars_x1000, rep_pass)."""
    from .lines import explode_lines, segment_text

    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"))
    seg = base.withColumn("text", segment_text("text"))
    per_line = (explode_lines(seg)
                .groupBy("doc_id", "line").agg(F.count("*").alias("c"))
                .withColumn("len", F.length("line")))
    line_stats = per_line.groupBy("doc_id").agg(
        F.sum("c").alias("n_lines"),
        F.sum(F.col("c") - 1).alias("n_dup_lines"),
        F.sum(F.col("c") * F.col("len")).alias("line_chars"),
        F.sum((F.col("c") - 1) * F.col("len")).alias("dup_line_chars"))

    toks = (base.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "w"))
        .filter(F.col("w") != ""))
    w = Window.partitionBy("doc_id").orderBy("pos")
    with_leads = (toks
                  .withColumn("w1", F.lead("w", 1).over(w))
                  .withColumn("w2", F.lead("w", 2).over(w))
                  .withColumn("w3", F.lead("w", 3).over(w)))
    # one exploded (n, gram) stream -> ONE tally shuffle for all three n
    grams = with_leads.select(
        "doc_id",
        F.explode(F.array(
            F.struct(F.lit(2).alias("n"),
                     F.when(F.col("w1").isNotNull(),
                            F.concat_ws(" ", "w", "w1")).alias("g")),
            F.struct(F.lit(3).alias("n"),
                     F.when(F.col("w2").isNotNull(),
                            F.concat_ws(" ", "w", "w1", "w2")).alias("g")),
            F.struct(F.lit(4).alias("n"),
                     F.when(F.col("w3").isNotNull(),
                            F.concat_ws(" ", "w", "w1", "w2", "w3")).alias("g")),
        )).alias("e")).select("doc_id", "e.n", "e.g").filter(
            F.col("g").isNotNull())
    tallies = grams.groupBy("doc_id", "n", "g").agg(F.count("*").alias("c"))
    # token chars of the gram = length minus the (n-1) separator spaces
    top = (tallies
           .withColumn("chars", F.when(
               F.col("c") >= 2,
               F.col("c") * (F.length("g") - (F.col("n") - 1)))
               .otherwise(F.lit(0)))
           .groupBy("doc_id")
           .pivot("n", [2, 3, 4]).agg(F.max("chars"))
           .select("doc_id", F.col("2").alias("top2"),
                   F.col("3").alias("top3"), F.col("4").alias("top4")))
    tok_chars = toks.groupBy("doc_id").agg(
        F.sum(F.length("w")).alias("tok_chars"))

    out = (line_stats.join(tok_chars, "doc_id", "left")
           .join(top, "doc_id", "left")
           .fillna({"top2": 0, "top3": 0, "top4": 0})
           .select(
               "doc_id", "n_lines",
               F.expr("1000 * n_dup_lines div n_lines")
               .alias("dup_line_frac_x1000"),
               F.expr("1000 * dup_line_chars div line_chars")
               .alias("dup_line_chars_x1000"),
               F.expr("1000 * top2 div tok_chars").alias("top2_chars_x1000"),
               F.expr("1000 * top3 div tok_chars").alias("top3_chars_x1000"),
               F.expr("1000 * top4 div tok_chars").alias("top4_chars_x1000")))
    return out.withColumn(
        "rep_pass",
        (F.col("dup_line_frac_x1000") <= MAX_DUP_LINE_X1000)
        & (F.col("dup_line_chars_x1000") <= MAX_DUP_LINE_CHARS_X1000)
        & (F.col("top2_chars_x1000") <= MAX_TOP_NGRAM_X1000[2])
        & (F.col("top3_chars_x1000") <= MAX_TOP_NGRAM_X1000[3])
        & (F.col("top4_chars_x1000") <= MAX_TOP_NGRAM_X1000[4]))


# ---------------------------------------------------------------------------
# Duplicate n-gram character coverage, n in 5..10 (the second half of
# Gopher Table A1).  Coverage semantics — a character counts once no
# matter how many duplicated n-grams overlap it — need positional
# marking, which SQL can't express cheaply, so this is the one kernel in
# the family that runs as a vectorized Arrow batch (mapInPandas, NumPy
# sliding windows; per-doc work is O(len * |ns|) ndarray ops, no Python
# per-token loop).  Oracle side: golden fixture.
# ---------------------------------------------------------------------------

DUP_NGRAM_NS = (5, 6, 7, 8, 9, 10)
MAX_DUP_NGRAM_X1000 = {5: 150, 6: 140, 7: 130, 8: 120, 9: 110, 10: 100}


def _coverage_fracs(text: str) -> list[int]:
    """Scaled dup-ngram char coverage for one document, all ns."""
    toks = text.lower().split()
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                       count=len(toks))
    total = int(lens.sum())
    out = []
    if total == 0:
        return [0] * len(DUP_NGRAM_NS)
    ids = pd.factorize(np.asarray(toks, dtype=object))[0].astype(np.int64)
    for n in DUP_NGRAM_NS:
        if len(ids) < n:
            out.append(0)
            continue
        wins = np.lib.stride_tricks.sliding_window_view(ids, n)
        wins = np.ascontiguousarray(wins)
        keys = wins.view([("", wins.dtype)] * n).ravel()
        _, inv, counts = np.unique(keys, return_inverse=True,
                                   return_counts=True)
        starts = np.nonzero(counts[inv] >= 2)[0]
        if len(starts) == 0:
            out.append(0)
            continue
        # mark covered token positions with a diff+cumsum sweep
        diff = np.zeros(len(ids) + 1, dtype=np.int64)
        np.add.at(diff, starts, 1)
        np.add.at(diff, starts + n, -1)
        covered = np.cumsum(diff[:-1]) > 0
        out.append(int(1000 * int(lens[covered].sum()) // total))
    return out


def dup_ngram_coverage(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-doc (doc_id, dup5_x1000..dup10_x1000, dupngram_pass)."""
    cols = [f"dup{n}_x1000" for n in DUP_NGRAM_NS]
    schema = ("doc_id long, "
              + ", ".join(f"{c} long" for c in cols)
              + ", dupngram_pass boolean")
    thresholds = [MAX_DUP_NGRAM_X1000[n] for n in DUP_NGRAM_NS]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fracs = np.array([_coverage_fracs(t) for t in pdf["t"]],
                             dtype=np.int64).reshape(len(pdf),
                                                     len(DUP_NGRAM_NS))
            out = {"doc_id": pdf["d"].to_numpy()}
            for i, c in enumerate(cols):
                out[c] = fracs[:, i]
            out["dupngram_pass"] = (fracs <= np.array(thresholds)).all(axis=1)
            yield pd.DataFrame(out)

    slim = docs.select(F.col(id_col).alias("d"), F.col(text_col).alias("t"))
    return slim.mapInPandas(_batches, schema)
