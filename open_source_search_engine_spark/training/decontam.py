"""Benchmark decontamination: flag/remove training documents that overlap
an evaluation set by word n-grams.

The standard LLM-pipeline step (GPT-3 appendix C, Gopher §A.4, The Pile):
an eval document contributes its word n-grams (n=13 in the published
pipelines; configurable here because the test corpus has ~50-word docs);
a training document is contaminated if it shares at least one n-gram with
any eval document.

Spark-first shape — everything stays JVM-side (no Python in the data
path):

  * tokenize + n-gram with ``split`` / ``transform`` / ``slice`` /
    ``array_join`` (whole-stage codegen, no UDF),
  * one ``explode`` + per-doc ``distinct`` on each side,
  * one equi-join on the gram string, counted per training doc.

Scale notes (100 TB corpus vs a bounded eval suite):

  * the eval side is tiny relative to the corpus (benchmarks are at most
    ~10^7 grams) — ``broadcast_eval=True`` ships it to every executor so
    the corpus-side scan never shuffles its exploded grams; with a huge
    eval side, leave it False and AQE plans a regular shuffle join on the
    gram key (uniformly distributed, no skew).
  * at extreme scale, join on ``xxhash64(gram)`` instead of the string to
    cut shuffle width 10-20x; a hash collision can only over-flag (drop a
    clean doc), never leak contamination, so the substitution is safe on
    the conservative side.  Kept as strings here for engine-exact oracle
    parity.

Reference anchor: this guards the *training* use of the crawl corpus; the
reference engine itself has no eval-split concept (its dedup is
Spider/titledb-level, XmlDoc.cpp) — the operator is part of the
training-data tier the build brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _doc_ngrams(docs: DataFrame, n: int, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id_col, gram) — DISTINCT word n-grams per document, lowercased,
    tokens split on non-alphanumeric runs.  Pure Catalyst."""
    ws = F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                  lambda x: x != F.lit(""))
    grams = F.when(
        F.size(ws) >= n,
        F.expr(f"transform(sequence(0, size(__ws) - {n}), "
               f"i -> array_join(slice(__ws, i + 1, {n}), ' '))")
    ).otherwise(F.array().cast("array<string>"))
    return (docs.withColumn("__ws", ws)
            .select(F.col(id_col), F.explode(grams).alias("gram"))
            .distinct())


def eval_ngram_set(eval_docs: DataFrame, n: int = 13,
                   text_col: str = "text") -> DataFrame:
    """The contamination dictionary: distinct word n-grams over the whole
    eval set (one column, ``gram``)."""
    return (_doc_ngrams(eval_docs.select(F.lit(0).alias("doc_id"),
                                         F.col(text_col)), n)
            .select("gram").distinct())


def decontaminate(train_docs: DataFrame, eval_docs: DataFrame,
                  n: int = 13, broadcast_eval: bool = True) -> DataFrame:
    """Per training document: how many of its distinct n-grams appear in
    the eval set, and the resulting contaminated flag.

    Returns (doc_id, n_shared_grams, contaminated) for EVERY training
    doc — the caller drops ``contaminated`` rows (the published pipelines
    remove the document outright) or routes them to review.
    """
    evalg = eval_ngram_set(eval_docs, n)
    if broadcast_eval:
        evalg = F.broadcast(evalg)
    hits = (_doc_ngrams(train_docs, n)
            .join(evalg, "gram")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shared_grams")))
    return (train_docs.select("doc_id")
            .join(hits, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_shared_grams", F.lit(0)).cast("long")
                .alias("n_shared_grams"),
                (F.coalesce("n_shared_grams", F.lit(0)) > 0)
                .alias("contaminated")))
