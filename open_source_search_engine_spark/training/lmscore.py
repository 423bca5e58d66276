"""CCNet-style n-gram language-model perplexity scoring + quality buckets.

The standard web-corpus curation step (Wenzek et al. 2020 "CCNet", reused
by LLaMA/RedPajama/FineWeb): train a small LM on a trusted reference
corpus, score every candidate document by per-token cross-entropy under
that LM, and split each language into head / middle / tail perplexity
terciles — head docs read like the reference corpus, tail docs are
gibberish/boilerplate.  CCNet uses a KenLM 5-gram; the public-knowledge
twin here is an add-one (Laplace) bigram LM, which keeps every quantity an
exact integer-arithmetic aggregate while exercising the same pipeline
shape (train on corpus A, score corpus B, bucket per language).

Spark-first shape — no Python in the data path:

  * tokenize with ``split``/``filter`` (lowercased alnum runs, the same
    Catalyst tokenizer as training.decontam),
  * LM training = two map-side-combined ``groupBy`` counts (unigram,
    bigram) over one exploded token stream,
  * scoring = per-doc distinct-bigram counts joined against the LM tables
    (broadcast when the pruned LM fits, AQE shuffle join otherwise), with
    the per-bigram log-probability materialized as an INTEGER (micro-nats,
    ``round(ln(p)·1e6)``) so the per-doc sum is an associative BIGINT
    aggregate — deterministic under any partitioning, unlike a double sum,
  * bucketing = per-language ``ntile(3)`` over the deterministic
    (cross-entropy, doc_id) order.

Scale notes (100 TB candidate corpus, bounded reference corpus):

  * the LM is trained on the *reference* corpus (CCNet: Wikipedia), which
    is orders of magnitude smaller than the candidate corpus; with
    ``min_count`` pruning the bigram table is 10^7-10^8 rows — broadcast
    range for count-packed tables, else the score join shuffles on the
    (w1, w2) key, which is uniformly hash-distributed (no skew).
  * the candidate-side explode is map-side combined to per-doc DISTINCT
    bigram counts before the join, so join width is bounded by per-doc
    vocabulary, not token count.
  * exact ``ntile`` needs a per-language sort; languages are skewed (en
    dominates), so at the 100 TB tier use ``bucket_thresholds`` /
    ``bucket_by_thresholds`` below: per-language tercile cut points from
    ``percentile_approx`` (one small aggregate, broadcast back) instead of
    a per-language global sort.

Reference anchor: the reference engine has no LM scoring — this operator
belongs to the training-data tier the build brief adds on top (like
training.decontam / training.gopher).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .decontam import TOKEN_SPLIT_RE

# scaled-integer log precision: micro-nats.  round(ln(p)*1e6) per DISTINCT
# bigram type, multiplied by the in-doc count, summed as BIGINT — exact and
# associative, so the score is partitioning-invariant.
_MICRO = 1_000_000


def _tokens(text_col: str = "text"):
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                    lambda x: x != F.lit(""))


def _doc_bigrams(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, w1, w2, cnt) — per-doc bigram type counts.  The explode is
    immediately re-aggregated (map-side combine) so downstream join width
    is per-doc *vocabulary*."""
    ws = _tokens(text_col)
    pairs = F.when(
        F.size(ws) >= 2,
        F.expr("transform(sequence(0, size(__ws) - 2), "
               "i -> struct(element_at(__ws, i + 1) AS w1, "
               "element_at(__ws, i + 2) AS w2))")
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (docs.withColumn("__ws", ws)
            .select(F.col(id_col), F.explode(pairs).alias("p"))
            .groupBy(id_col, F.col("p.w1").alias("w1"),
                     F.col("p.w2").alias("w2"))
            .agg(F.count("*").alias("cnt")))


def train_bigram_lm(ref_docs: DataFrame, text_col: str = "text",
                    min_count: int = 1
                    ) -> tuple[DataFrame, DataFrame, int]:
    """Train the reference LM: returns (unigrams(w1, c1),
    bigrams(w1, w2, c12), vocab_size).

    ``min_count`` prunes rare bigrams from the table (CCNet prunes its
    KenLM the same way); pruned bigrams score as unseen, which only
    *raises* a doc's perplexity — conservative for filtering.  The vocab
    size V (add-one denominator) is counted over unigrams BEFORE pruning
    so smoothing mass is independent of the pruning knob.
    """
    toks = (ref_docs.select(F.explode(_tokens(text_col)).alias("w1"))
            .groupBy("w1").agg(F.count("*").alias("c1")))
    bi = _doc_bigrams(ref_docs.select(F.lit(0).alias("doc_id"),
                                      F.col(text_col)), text_col)
    bi = bi.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    if min_count > 1:
        bi = bi.filter(F.col("c12") >= min_count)
    vocab_size = toks.count()
    return toks, bi, vocab_size


def lm_cross_entropy(docs: DataFrame, unigrams: DataFrame,
                     bigrams: DataFrame, vocab_size: int,
                     text_col: str = "text", id_col: str = "doc_id",
                     broadcast_lm: bool = True) -> DataFrame:
    """Per-document cross-entropy under the add-one bigram LM.

    p(w2|w1) = (c12 + 1) / (c1 + V); unseen bigram -> c12 = 0, unseen
    prefix -> c1 = 0 (uniform 1/V).  Output per doc:

      * ``n_scored``  — number of scored bigram positions (len - 1),
      * ``nll_micro`` — total negative log-likelihood in micro-nats
        (BIGINT; exact associative sum),
      * ``ce_milli``  — mean cross-entropy per position in milli-nats
        (``nll_micro DIV (n_scored * 1000)``, integer floor division).

    Docs with fewer than two tokens have n_scored = 0 and NULL ce_milli.
    """
    uni = F.broadcast(unigrams) if broadcast_lm else unigrams
    bi = F.broadcast(bigrams) if broadcast_lm else bigrams
    per_doc = _doc_bigrams(docs, text_col, id_col)
    # integer log-prob per bigram TYPE, weighted by in-doc count
    scored = (per_doc
              .join(bi, ["w1", "w2"], "left")
              .join(uni, "w1", "left")
              .withColumn(
                  "lp_micro",
                  F.round(F.log(
                      (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1.0))
                      / (F.coalesce(F.col("c1"), F.lit(0))
                         + F.lit(float(vocab_size)))) * _MICRO)
                  .cast("long"))
              .groupBy(id_col)
              .agg((-F.sum(F.col("cnt") * F.col("lp_micro")))
                   .alias("nll_micro"),
                   F.sum("cnt").alias("n_scored")))
    return (docs.select(id_col)
            .join(scored, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_scored", F.lit(0)).cast("long")
                .alias("n_scored"),
                F.coalesce("nll_micro", F.lit(0)).cast("long")
                .alias("nll_micro"),
                F.when(F.col("n_scored") > 0,
                       F.expr("nll_micro DIV (n_scored * 1000)"))
                .cast("long").alias("ce_milli")))


def ccnet_buckets(scores: DataFrame, docs: DataFrame,
                  id_col: str = "doc_id",
                  lang_col: str = "lang") -> DataFrame:
    """Per-language head/middle/tail perplexity terciles (CCNet §4.3).

    Exact ``ntile(3)`` over the deterministic (ce_milli, doc_id) order
    within each language; unscored docs (n_scored = 0) are assigned the
    'tail' bucket like CCNet's unmodelled documents.  At the 100 TB tier
    swap in ``bucket_by_thresholds`` (approx cut points, no global
    per-language sort)."""
    joined = scores.join(docs.select(id_col, lang_col), id_col)
    w = (Window.partitionBy(lang_col)
         .orderBy(F.col("ce_milli").asc_nulls_last(), F.col(id_col)))
    tile = F.when(F.col("n_scored") == 0, F.lit(3)).otherwise(F.ntile(3).over(w))
    return joined.withColumn(
        "bucket",
        F.element_at(F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                     tile))


def bucket_thresholds(scores: DataFrame, docs: DataFrame,
                      id_col: str = "doc_id", lang_col: str = "lang",
                      accuracy: int = 10000) -> DataFrame:
    """Per-language tercile cut points via ``percentile_approx`` — the
    scale path's bounded substitute for the exact per-language sort:
    (lang, p33_milli, p67_milli), one small aggregate to broadcast."""
    joined = (scores.filter(F.col("n_scored") > 0)
              .join(docs.select(id_col, lang_col), id_col))
    return (joined.groupBy(lang_col)
            .agg(F.percentile_approx("ce_milli", 1 / 3, accuracy)
                 .alias("p33_milli"),
                 F.percentile_approx("ce_milli", 2 / 3, accuracy)
                 .alias("p67_milli")))


def bucket_by_thresholds(scores: DataFrame, docs: DataFrame,
                         thresholds: DataFrame, id_col: str = "doc_id",
                         lang_col: str = "lang") -> DataFrame:
    """Assign buckets from precomputed per-language cut points — a
    broadcast join + CASE ladder, no window, no per-language sort."""
    joined = scores.join(docs.select(id_col, lang_col), id_col)
    return (joined.join(F.broadcast(thresholds), lang_col, "left")
            .withColumn(
                "bucket",
                F.when(F.col("n_scored") == 0, F.lit("tail"))
                .when(F.col("ce_milli") <= F.col("p33_milli"), "head")
                .when(F.col("ce_milli") <= F.col("p67_milli"), "middle")
                .otherwise("tail"))
            .drop("p33_milli", "p67_milli"))
