"""Temperature-based corpus mixing: per-source sampling rates q ∝ p^α.

The standard pretraining-mix step (Conneau & Lample 2019 §3.1 /  XLM-R,
GPT-3 §2.2's weighted sampling, mT5 §3.2): given per-source natural token
shares p_i, sample source i with probability q_i ∝ p_i^α — α < 1 flattens
the mix so mega-sources stop dominating and small high-quality sources are
upsampled.  Combined with a token budget B, source i's sampling factor is

    f_i = (B · q_i) / tokens_i

f_i < 1 downsamples (keep a deterministic f_i fraction of docs); f_i > 1
upsamples (emit ⌊f_i⌋ copies of every doc plus a deterministic
frac(f_i)-fraction extra copy) — epoch-repetition exactly as published
mixes implement it.

Spark-first / 100 TB shape:

  * per-source token totals = one map-side-combined ``groupBy`` (the
    source dimension is small: 10²-10⁶ rows);
  * the weight table is computed driver-side over that bounded aggregate
    (like the BPE/IVF bounded collects) and broadcast back as integer
    ppm rates — no floating point in the distributed path;
  * per-doc admission is a deterministic hash coin: ``xxhash64(doc_id,
    seed) % 1e6 < rate_ppm`` — reproducible under any partitioning,
    no RNG state, survives resume;
  * upsampled copies come from one bounded ``explode(sequence(...))``
    (factor capped by ``max_upsample``), so output size is plan-visible.

Reference anchor: none (the engine serves queries; corpus mixing is a
training-data-tier addition like training.lmscore / training.decontam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PPM = 1_000_000


def source_token_counts(docs: DataFrame, source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_tokens) — whitespace token totals per source."""
    return (docs.groupBy(F.col(source_col).alias("source"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
                 .cast("long").alias("n_tokens")))


def temperature_rates(counts: list, alpha: float,
                      budget_tokens: int,
                      max_upsample: int = 10) -> dict[str, int]:
    """Driver-side weight solve over the bounded per-source aggregate:
    {source: factor_ppm}.  factor_ppm/1e6 is the expected number of copies
    of each of the source's docs; capped at ``max_upsample`` (published
    mixes cap epoch repetition — e.g. GPT-3 reuses high-quality corpora
    2-3x) with the budget shortfall redistributed over uncapped sources.
    """
    tok = {r["source"]: int(r["n_tokens"]) for r in counts}
    if not tok or budget_tokens <= 0:
        return {s: 0 for s in tok}
    total = sum(tok.values())
    q = {s: (t / total) ** alpha for s, t in tok.items()}
    cap = {s: float(max_upsample) for s in tok}
    # iterative water-filling: capped sources keep their cap, the rest
    # re-normalize over the remaining budget (≤ n_sources rounds)
    fixed: dict[str, float] = {}
    while True:
        rem_budget = budget_tokens - sum(fixed.get(s, 0.0) * tok[s]
                                         for s in fixed)
        free = {s: w for s, w in q.items() if s not in fixed}
        if not free or rem_budget <= 0:
            break
        z = sum(free.values())
        over = [s for s in free
                if (rem_budget * free[s] / z) / tok[s] > cap[s]]
        if not over:
            for s in free:
                fixed[s] = (rem_budget * free[s] / z) / tok[s]
            break
        for s in over:
            fixed[s] = cap[s]
    return {s: int(round(fixed.get(s, 0.0) * _PPM)) for s in tok}


def temperature_sample(docs: DataFrame, alpha: float = 0.3,
                       budget_tokens: int | None = None,
                       max_upsample: int = 10, seed: int = 0,
                       source_col: str = "source",
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Materialize the temperature-α mix: every kept (copy of a) doc as
    (doc_id, source, copy, factor_ppm).

    ``budget_tokens`` defaults to the corpus' own token total (pure
    re-mix, no growth).  copy = 0..n-1 indexes repetitions; downsampling
    emits copy 0 for a deterministic factor_ppm-fraction of docs.
    """
    counts_df = source_token_counts(docs, source_col, text_col)
    counts = counts_df.collect()              # bounded: one row per source
    if budget_tokens is None:
        budget_tokens = sum(int(r["n_tokens"]) for r in counts)
    rates = temperature_rates(counts, alpha, budget_tokens, max_upsample)
    spark = docs.sparkSession
    rate_df = F.broadcast(spark.createDataFrame(
        [(s, f) for s, f in rates.items()], "source string, factor_ppm long"))
    coin = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_PPM))
    n_copies = F.expr(f"factor_ppm DIV {_PPM}") + \
        F.when(coin < F.pmod(F.col("factor_ppm"), F.lit(_PPM)), 1) \
         .otherwise(0)
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(source_col).alias("source"))
            .join(rate_df, "source")
            .withColumn("n_copies", n_copies)
            .filter(F.col("n_copies") > 0)
            .select("doc_id", "source",
                    F.explode(F.sequence(F.lit(0),
                                         F.col("n_copies") - 1))
                    .alias("copy"),
                    "factor_ppm"))


def mix_summary(sample: DataFrame, docs: DataFrame,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(source, natural_tokens, mixed_tokens, factor_ppm) — the audit
    table a mix run reports: how many tokens each source contributes
    before and after temperature flattening."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
        .alias("n_tokens"))
    return (sample.join(toks, "doc_id")
            .groupBy("source", "factor_ppm")
            .agg(F.count("*").alias("mixed_docs"),
                 F.sum("n_tokens").alias("mixed_tokens"))
            .join(source_token_counts(docs).select(
                "source", F.col("n_tokens").alias("natural_tokens")),
                "source"))
