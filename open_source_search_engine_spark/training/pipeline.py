"""End-to-end training-data curation pipeline over the documents table.

The composition a 100 TB pretraining-data build actually runs, in the
order the stages are run at scale (cheapest-first so each shuffle sees
only survivors of the previous gate):

1. document-shape gates — Gopher quality + repetition + dup-ngram
   coverage (``gopher.py``), all per-doc scans, no cross-doc shuffle;
2. language gate — trigram language-ID (``textqual.py``);
3. corpus-wide line dedup (``lines.py``) — boilerplate removal; a doc
   that loses every line to earlier occurrences is dropped;
4. near-dup document dedup — MinHash → LSH → exact verify → connected
   components (``dedup.py``), run only on survivors.

Output is one row per input document with a ``keep`` flag and the FIRST
failing stage as ``reason`` (null when kept) — per-stage attrition is
what a curation run reports, and `attrition_summary` aggregates it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# stage order = evaluation priority for the reported reason
REASONS = ["gopher_shape", "gopher_repetition", "dup_ngram", "pii", "lang",
           "lm_tail", "classifier_reject", "contaminated",
           "boilerplate_only", "near_dup"]


#: every switchable curation gate, in evaluation order.  ``curate``'s
#: ``gates`` parameter selects a subset — curation recipes differ (e.g.
#: FineWeb drops the dup-ngram rule; code corpora skip language ID), so
#: the stage set is a knob, not a constant.
GATES = ("shape", "repetition", "dup_ngram", "lang", "line_dedup",
         "near_dup")


def curate(docs: DataFrame, lang_keep: tuple[str, ...] = ("en",),
           neardup_threshold: float = 0.85,
           max_pii: int | None = None,
           eval_docs: DataFrame | None = None,
           decontam_n: int = 13,
           lm_ref_docs: DataFrame | None = None,
           classifier_labels: DataFrame | None = None,
           gates: tuple[str, ...] = GATES,
           materialize: bool = True) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, keep, reason).

    Every stage is computed as its own DataFrame and joined on doc_id;
    the dedup stage (the only corpus-quadratic one) is evaluated over
    quality survivors only, exactly like a staged production run.

    Optional gates (both off by default):
    - ``max_pii``: drop documents with more than this many PII matches
      (``pii.pii_profile``; a production run redacts the survivors with
      ``pii_redact`` when it materializes text);
    - ``eval_docs``: drop documents sharing a word ``decontam_n``-gram
      with this evaluation set (``decontam.decontaminate``);
    - ``lm_ref_docs``: CCNet LM-perplexity gate (``lmscore``) — train a
      bigram LM on this trusted reference corpus, bucket docs into
      per-language perplexity terciles, and drop the 'tail' bucket
      (CCNet keeps head+middle; Wenzek 2020 §4.3).  Uses the approx-
      threshold bucketing (no per-language global sort — the 100 TB
      path);
    - ``classifier_labels``: (doc_id, label boolean) train split for the
      fastText-style quality classifier (``qclassifier``, Brown 2020
      App. A — reference vs random-crawl); docs the trained model MAP-
      rejects are dropped with reason 'classifier_reject'."""
    from .dedup import dedup_keepers
    from .gopher import dup_ngram_coverage, gopher_quality, gopher_repetition
    from .lines import line_dedup, segment_text
    from .textqual import language_id

    on = frozenset(gates)
    unknown = on - frozenset(GATES)
    if unknown:
        raise ValueError(f"unknown curation gates: {sorted(unknown)}")

    base = docs.select("doc_id", "text")
    gated = base.select("doc_id")
    if "shape" in on:
        shape = gopher_quality(base).select("doc_id", "gopher_pass")
        gated = gated.join(shape, "doc_id", "left")
    else:
        gated = gated.withColumn("gopher_pass", F.lit(True))
    if "repetition" in on:
        rep = gopher_repetition(base).select("doc_id", "rep_pass")
        gated = gated.join(rep, "doc_id", "left")
    else:
        gated = gated.withColumn("rep_pass", F.lit(True))
    if "dup_ngram" in on:
        cov = dup_ngram_coverage(base).select("doc_id", "dupngram_pass")
        gated = gated.join(cov, "doc_id", "left")
    else:
        gated = gated.withColumn("dupngram_pass", F.lit(True))
    if "lang" in on:
        lang = language_id(base).select(
            "doc_id", F.col("pred_lang").isin(*lang_keep).alias("lang_pass"))
        gated = gated.join(lang, "doc_id", "left")
    else:
        gated = gated.withColumn("lang_pass", F.lit(True))
    if "line_dedup" in on:
        seg = base.withColumn("text", segment_text("text"))
        lined = line_dedup(seg).select(
            "doc_id", (F.col("n_kept") > 0).alias("line_pass"))
        gated = gated.join(lined, "doc_id", "left")
    else:
        gated = gated.withColumn("line_pass", F.lit(True))
    if max_pii is not None:
        from .pii import pii_profile
        pii = pii_profile(base).select(
            "doc_id", (F.col("n_pii") <= max_pii).alias("pii_pass"))
        gated = gated.join(pii, "doc_id", "left")
    else:
        gated = gated.withColumn("pii_pass", F.lit(True))
    if eval_docs is not None:
        from .decontam import decontaminate
        dec = decontaminate(base, eval_docs, n=decontam_n).select(
            "doc_id", (~F.col("contaminated")).alias("decontam_pass"))
        gated = gated.join(dec, "doc_id", "left")
    else:
        gated = gated.withColumn("decontam_pass", F.lit(True))
    if lm_ref_docs is not None:
        from .lmscore import (bucket_by_thresholds, bucket_thresholds,
                              lm_cross_entropy, train_bigram_lm)
        uni, bi, v = train_bigram_lm(lm_ref_docs.select("doc_id", "text"))
        scores = lm_cross_entropy(base, uni, bi, v)
        # bucket within the language (CCNet computes terciles per
        # language): the corpus' declared lang column when present, else
        # the trigram language-ID prediction.  A predicted singleton
        # language would bucket against itself alone — the declared
        # label keeps gibberish inside its real language's terciles.
        if "lang" in docs.columns:
            lang_src = docs.select("doc_id", "lang")
        else:
            lang_src = language_id(base).select(
                "doc_id", F.col("pred_lang").alias("lang"))
        th = bucket_thresholds(scores, lang_src)
        buck = bucket_by_thresholds(scores, lang_src, th).select(
            "doc_id", (F.col("bucket") != "tail").alias("lm_pass"))
        gated = gated.join(buck, "doc_id", "left")
    else:
        gated = gated.withColumn("lm_pass", F.lit(True))
    if classifier_labels is not None:
        from .qclassifier import nb_score, nb_train
        model = nb_train(base.join(classifier_labels, "doc_id"))
        clf = nb_score(base, model).select(
            "doc_id", F.col("predict").alias("clf_pass"))
        gated = gated.join(clf, "doc_id", "left")
    else:
        gated = gated.withColumn("clf_pass", F.lit(True))
    gated = gated.fillna(False)
    quality_ok = (F.col("gopher_pass") & F.col("rep_pass")
                  & F.col("dupngram_pass") & F.col("pii_pass")
                  & F.col("lang_pass") & F.col("lm_pass")
                  & F.col("clf_pass")
                  & F.col("decontam_pass") & F.col("line_pass"))

    survivors = base.join(
        gated.filter(quality_ok).select("doc_id"), "doc_id")
    if "near_dup" in on:
        kept = dedup_keepers(survivors, threshold=neardup_threshold,
                             materialize=materialize).select(
            "doc_id", F.col("keep").alias("dedup_keep"))
    else:
        kept = survivors.select("doc_id", F.lit(True).alias("dedup_keep"))

    out = gated.join(kept, "doc_id", "left")
    reason = (F.when(~F.col("gopher_pass"), "gopher_shape")
              .when(~F.col("rep_pass"), "gopher_repetition")
              .when(~F.col("dupngram_pass"), "dup_ngram")
              .when(~F.col("pii_pass"), "pii")
              .when(~F.col("lang_pass"), "lang")
              .when(~F.col("lm_pass"), "lm_tail")
              .when(~F.col("clf_pass"), "classifier_reject")
              .when(~F.col("decontam_pass"), "contaminated")
              .when(~F.col("line_pass"), "boilerplate_only")
              .when(~F.col("dedup_keep"), "near_dup"))
    return out.select(
        "doc_id",
        F.coalesce(F.col("dedup_keep"), F.lit(False)).alias("keep"),
        reason.alias("reason"))


def attrition_summary(curated: DataFrame) -> DataFrame:
    """(stage, n_docs) — kept docs report stage='kept'."""
    return (curated
            .withColumn("stage", F.coalesce("reason", F.lit("kept")))
            .groupBy("stage").agg(F.count("*").alias("n_docs")))


def domain_quota_sample(docs: DataFrame, max_share_x1000: int = 200,
                        source_col: str = "source") -> DataFrame:
    """Cap each source's share of the corpus at max_share_x1000/1000 of
    total whitespace tokens (domain balancing a pretraining mix applies
    after quality filtering — no one crawl domain may dominate).

    Deterministic greedy keep: within each source, docs are admitted in
    doc_id order while the source's running token total stays within its
    budget.  One aggregate for the global total (broadcast back), one
    running-sum window per source.  At 100 TB the per-source running sum
    is the sequential step — shard it by doc_id ranges with per-range
    pre-aggregated offsets (two-pass prefix sum) rather than one window
    partition per mega-source; semantics identical.

    Returns (doc_id, source, n_tokens, cum_tokens, keep)."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.col(source_col).alias("source"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long")
        .alias("n_tokens"))
    total = toks.agg(F.sum("n_tokens").alias("total_tokens"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .crossJoin(F.broadcast(total))
            .withColumn(
                "keep",
                F.col("cum_tokens") * 1000
                <= F.lit(max_share_x1000) * F.col("total_tokens"))
            .select("doc_id", "source", "n_tokens", "cum_tokens", "keep"))


def domain_quota_sample_sharded(docs: DataFrame,
                                max_share_x1000: int = 200,
                                source_col: str = "source",
                                range_width: int = 1 << 20) -> DataFrame:
    """The 100 TB form of ``domain_quota_sample``: a two-pass distributed
    prefix sum instead of one running-sum window partition per source
    (which serializes a mega-source through a single task).

    Pass 1 aggregates per (source, doc_id-range) partials; pass 2 runs the
    running sum over that tiny partial table (n_sources x n_ranges rows)
    to get each range's starting offset; the per-row cumsum then windows
    only within (source, range) — bounded partitions regardless of source
    skew.  Output is IDENTICAL to the plain form (proof:
    test_sharded_quota_equals_plain)."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.col(source_col).alias("source"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long")
        .alias("n_tokens"),
        (F.col("doc_id") / range_width).cast("long").alias("rng"))
    partials = toks.groupBy("source", "rng").agg(
        F.sum("n_tokens").alias("rng_tokens"))
    off_w = (Window.partitionBy("source").orderBy("rng")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = partials.withColumn(
        "rng_offset", F.coalesce(F.sum("rng_tokens").over(off_w),
                                 F.lit(0)))
    in_rng = (Window.partitionBy("source", "rng").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    total = toks.agg(F.sum("n_tokens").alias("total_tokens"))
    # no broadcast hint: the partial table is usually tiny (AQE will
    # broadcast it) but can exceed the broadcast cap at 10^6 sources
    return (toks
            .join(offsets.select("source", "rng", "rng_offset"),
                  ["source", "rng"])
            .withColumn("cum_tokens",
                        F.col("rng_offset")
                        + F.sum("n_tokens").over(in_rng))
            .crossJoin(F.broadcast(total))
            .withColumn(
                "keep",
                F.col("cum_tokens") * 1000
                <= F.lit(max_share_x1000) * F.col("total_tokens"))
            .select("doc_id", "source", "n_tokens", "cum_tokens", "keep"))
