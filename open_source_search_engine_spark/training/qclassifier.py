"""Hashed bag-of-n-grams quality classifier (the fastText-style filter).

Public method: the GPT-3 / CCNet / LLaMA data-curation recipe — train a
linear classifier on hashed word n-grams to separate a high-quality
reference corpus (Wikipedia/books) from random web crawl, then keep crawl
documents the classifier scores as reference-like (Brown et al. 2020
appendix A; Touvron et al. 2023 "trained a fastText-like classifier";
Joulin et al. 2016 fastText supervised, hashing trick).  We train it as
multinomial Naive Bayes over the SAME hashed unigram+bigram buckets DSIR
uses — NB is the closed-form member of that linear family, needs exactly
one aggregation pass (no SGD epochs), and is deterministic under any
partitioning, which an iterative fastText fit is not.

Model = per-bucket quantized log-likelihood-ratio weights + a prior bias,
at most ``n_buckets`` rows (a broadcast-sized table no matter the corpus).
Score(x) = bias + sum_b count_b(x) * w_b — integer-exact (weights are
quantized to 1e-6 before the per-doc SUM, so no float reduction-order
wobble).  ``predict = score > 0`` is the MAP decision.

Train: ONE map-side-combined groupBy over (doc_id, bucket, cnt) rows.
Score: ONE broadcast join + per-doc aggregate.  Nothing collects but the
two class totals (one row).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import N_BUCKETS, _LOG_SCALE, hashed_ngram_buckets


def nb_train(docs: DataFrame, label_col: str = "label",
             n_buckets: int = N_BUCKETS) -> DataFrame:
    """Fit the NB model: (bucket, weight_q) with add-one smoothing, plus
    the prior bias stored as bucket = -1.

    ``docs``: (doc_id long, text, <label_col> boolean) — True = the
    high-quality reference class."""
    labels = docs.select("doc_id", F.col(label_col).alias("label"))
    # the per-bucket aggregate is bounded at n_buckets rows: fit the
    # model with ONE bounded collect (the BPE/IVF pattern) so the corpus
    # tokenization runs exactly once at train time
    rows = (hashed_ngram_buckets(docs, n_buckets)
            .join(labels, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.when(F.col("label"), F.col("cnt"))
                       .otherwise(F.lit(0))).alias("pos"),
                 F.sum(F.when(~F.col("label"), F.col("cnt"))
                       .otherwise(F.lit(0))).alias("neg"))
            .collect())
    pos_total = sum(r["pos"] for r in rows)
    neg_total = sum(r["neg"] for r in rows)
    doc_counts = {r["label"]: r["n"] for r in
                  labels.groupBy("label").agg(F.count("*").alias("n"))
                  .collect()}
    n_pos_docs = doc_counts.get(True, 0)
    n_neg_docs = doc_counts.get(False, 0)
    log_pz = math.log(pos_total + n_buckets)
    log_nz = math.log(neg_total + n_buckets)
    bias = math.log(n_pos_docs + 1) - math.log(n_neg_docs + 1)
    out = [(int(r["bucket"]),
            int(round((math.log(r["pos"] + 1) - log_pz
                       - math.log(r["neg"] + 1) + log_nz) * _LOG_SCALE)))
           for r in rows]
    out.append((-1, int(round(bias * _LOG_SCALE))))
    return docs.sparkSession.createDataFrame(
        out, "bucket int, weight_q long")


def nb_score(docs: DataFrame, model: DataFrame,
             n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, score_q, predict): quantized log-odds of the reference
    class per document; ``predict`` is the MAP keep decision.  The model
    is broadcast (bounded at n_buckets+1 rows); one shuffle for the
    per-doc aggregate."""
    bias = model.filter(F.col("bucket") == -1)
    weights = model.filter(F.col("bucket") >= 0)
    scored = (hashed_ngram_buckets(docs, n_buckets)
              .join(F.broadcast(weights), "bucket")
              .groupBy("doc_id")
              .agg(F.sum(F.col("cnt") * F.col("weight_q"))
                   .alias("sum_q")))
    return (docs.select("doc_id")
            .join(scored, "doc_id", "left")
            .crossJoin(F.broadcast(bias.select(
                F.col("weight_q").alias("bias_q"))))
            .select(
                "doc_id",
                (F.coalesce("sum_q", F.lit(0)) + F.col("bias_q"))
                .cast("long").alias("score_q"))
            .withColumn("predict", F.col("score_q") > 0))


def quality_classify(docs: DataFrame, label_col: str = "label",
                     n_buckets: int = N_BUCKETS) -> DataFrame:
    """Train on the labeled rows, score EVERY row (the curation shape:
    the reference/random split trains the model, the whole crawl gets a
    keep verdict)."""
    model = nb_train(docs.filter(F.col(label_col).isNotNull()),
                     label_col, n_buckets)
    return nb_score(docs, model, n_buckets)
