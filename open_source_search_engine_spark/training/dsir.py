"""DSIR — Data Selection via Importance Resampling.

Public method: Xie, Santurkar, Ma, Liang, "Data Selection for Language
Models via Importance Resampling" (NeurIPS 2023, arXiv:2302.03169).
Given a small TARGET corpus (the distribution you want more of) inside a
large RAW pool, DSIR:

1. featurizes every document as hashed n-gram counts — unigrams + bigrams
   of whitespace words, hashed into ``n_buckets`` (the paper uses 10k);
2. fits two bag-of-words models over the buckets, p (target) and q (raw),
   with add-one smoothing;
3. scores each raw document with the log importance weight
   ``w(x) = sum_b count_b(x) * (log p_b - log q_b)``;
4. samples k documents WITHOUT replacement ~ the importance weights via
   the Gumbel top-k trick: select the k largest ``w(x) + Gumbel(0,1)``.

Spark shape (scale-first):
- tokenization + hashing is the SAME flat Arrow-buffer kernel the MinHash
  path uses (``dedup._token_hashes_batch`` — no per-token Python), one
  ``mapInPandas`` pass emitting (doc_id, bucket, cnt);
- the two models are ONE map-side-combined groupBy over those rows
  (bucket cardinality is fixed at ``n_buckets`` — the aggregate result is
  tiny no matter the corpus size) plus a two-scalar totals collect;
- log ratios are quantized to 1e-6 (int64) so the per-doc weight
  ``SUM(cnt * logratio_q)`` is integer-exact — no float reduction-order
  wobble across partitionings, which keeps the committed golden stable;
- the Gumbel key is a pure per-doc function of the tabulation hash of
  doc_id (deterministic, seedable), also quantized to int64;
- top-k selection is threshold-broadcast, not a single-partition window:
  collect the k-th (key, doc_id) boundary (bounded: one row) and flag
  every doc lexicographically above it.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ghash import hash64b_bytes
from .dedup import _SH1, _token_hashes_batch

N_BUCKETS = 4096
_LOG_SCALE = 1_000_000           # log-ratio / Gumbel quantization step

_BUCKET_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("bucket", T.IntegerType()),
    T.StructField("cnt", T.LongType()),
])


def _bucket_batch_kernel(n_buckets: int):
    b = np.uint64(n_buckets)

    def _kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            texts = batch["text"].tolist()
            th, offs = _token_hashes_batch(texts)
            n_docs = len(texts)
            lens = np.diff(offs)
            di_uni = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            uni = (th % b).astype(np.int64)
            # bigrams: adjacent token pairs that do NOT cross a doc
            # boundary — pair i is (tok i, tok i+1); it crosses iff i+1
            # is some doc's first token
            if len(th) >= 2:
                pair = (th[:-1] * _SH1 + th[1:]) % b
                valid = np.ones(len(th) - 1, dtype=bool)
                starts = offs[1:-1]
                starts = starts[(starts > 0) & (starts < len(th))]
                valid[starts - 1] = False
                bi = pair[valid].astype(np.int64)
                di_bi = di_uni[:-1][valid]
            else:
                bi = np.zeros(0, np.int64)
                di_bi = np.zeros(0, np.int64)
            all_b = np.concatenate([uni, bi])
            all_d = np.concatenate([di_uni, di_bi])
            if len(all_b) == 0:
                yield pd.DataFrame({"doc_id": [], "bucket": [], "cnt": []}
                                   ).astype({"doc_id": "int64",
                                             "bucket": "int32",
                                             "cnt": "int64"})
                continue
            comp, counts = np.unique(all_d * n_buckets + all_b,
                                     return_counts=True)
            ids = batch["doc_id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame({
                "doc_id": ids[comp // n_buckets],
                "bucket": (comp % n_buckets).astype(np.int32),
                "cnt": counts.astype(np.int64),
            })

    return _kernel


def hashed_ngram_buckets(docs: DataFrame,
                         n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, bucket, cnt): hashed unigram+bigram counts per document.
    One Arrow pass over (doc_id, text); bigrams never cross documents."""
    return docs.select("doc_id", "text").mapInPandas(
        _bucket_batch_kernel(n_buckets), schema=_BUCKET_SCHEMA)


def dsir_bucket_logratio(buckets: DataFrame, doc_flags: DataFrame,
                         n_buckets: int = N_BUCKETS) -> DataFrame:
    """(bucket, logratio_q): quantized ``log p_b - log q_b`` with add-one
    smoothing, p fit on target docs and q on the whole raw pool.

    The aggregate is bounded by ``n_buckets`` rows regardless of corpus
    size, so the model fit is ONE bounded collect (the BPE/IVF pattern):
    the log ratios are computed on the driver and handed back as a local
    broadcast-sized frame — downstream consumers never re-trigger the
    corpus tokenization that fed the aggregate."""
    flagged = buckets.join(doc_flags, "doc_id")
    rows = (flagged.groupBy("bucket")
            .agg(F.sum(F.when(F.col("is_target"), F.col("cnt"))
                       .otherwise(F.lit(0))).alias("t_cnt"),
                 F.sum("cnt").alias("r_cnt"))
            .collect())                      # bounded: <= n_buckets rows
    t_total = sum(r["t_cnt"] for r in rows)
    r_total = sum(r["r_cnt"] for r in rows)
    log_tz = math.log(t_total + n_buckets)
    log_rz = math.log(r_total + n_buckets)
    out = [(int(r["bucket"]),
            int(round((math.log(r["t_cnt"] + 1) - log_tz
                       - math.log(r["r_cnt"] + 1) + log_rz)
                      * _LOG_SCALE)))
           for r in rows]
    return buckets.sparkSession.createDataFrame(
        out, "bucket int, logratio_q long")


def _gumbel_key_q(seed: int):
    """Deterministic per-doc Gumbel(0,1) noise, quantized: uniform from
    the tabulation hash of (doc_id, seed), then -log(-log u)."""

    def _kernel(ids: pd.Series) -> pd.Series:
        h = hash64b_bytes([f"{d}\x1f{seed}".encode() for d in ids])
        u = (h.astype(np.float64) + 1.0) / (2.0 ** 64 + 2.0)
        g = -np.log(-np.log(u))
        return pd.Series(np.round(g * _LOG_SCALE).astype(np.int64))

    return F.pandas_udf(_kernel, T.LongType())


def dsir_select(docs: DataFrame, target_col: str = "is_target",
                k: int = 100, n_buckets: int = N_BUCKETS,
                seed: int = 0x05178,
                materialize: bool = True) -> DataFrame:
    """Full DSIR verdict: (doc_id, weight_q, key_q, selected).

    ``weight_q`` is the integer-quantized log importance weight,
    ``key_q = weight_q + gumbel_q`` the Gumbel-perturbed sampling key, and
    ``selected`` flags the k docs sampled without replacement ~ importance
    (the paper's Gumbel top-k).  Docs with no tokens carry weight 0.

    ``docs`` must have (doc_id long, text, <target_col> boolean).  Shuffles:
    the bucket aggregate (bounded at n_buckets rows), the ratio join
    (broadcast — n_buckets rows), the per-doc weight aggregate.  The top-k
    boundary is collected (one row) and broadcast as a literal threshold —
    no global single-partition sort.

    ``materialize=True`` (default) computes the narrow 4-column verdict
    HERE (the bucket table and the scored table are each persisted only
    until superseded, then released; the result is local-checkpointed so
    no internal cache outlives the call — release its blocks with
    ``memutil.release_local_checkpoint`` when done).  ``materialize=
    False`` keeps the plan fully lazy with nothing persisted (plan
    inspection/tests; the Arrow tokenization pass may rerun per
    action)."""
    from ..memutil import safe_unpersist

    flags = docs.select("doc_id", F.col(target_col).alias("is_target"))
    # the bucket rows feed the model fit (one action) AND the final
    # weight aggregate — persist so the Arrow tokenization pass runs once
    buckets = hashed_ngram_buckets(docs, n_buckets)
    if materialize:
        buckets = buckets.persist()
    ratios = dsir_bucket_logratio(buckets, flags, n_buckets)
    weights = (buckets.join(F.broadcast(ratios), "bucket")
               .groupBy("doc_id")
               .agg(F.sum(F.col("cnt") * F.col("logratio_q"))
                    .alias("weight_q")))
    scored = (docs.select("doc_id")
              .join(weights, "doc_id", "left")
              .withColumn("weight_q",
                          F.coalesce("weight_q", F.lit(0)).cast("long"))
              .withColumn("key_q", (F.col("weight_q")
                                    + _gumbel_key_q(seed)(F.col("doc_id"))
                                    ).cast("long")))
    if materialize:
        scored = scored.persist()           # boundary collect + final read
    boundary = (scored.orderBy(F.desc("key_q"), "doc_id")
                .limit(k).orderBy(F.asc("key_q"), F.desc("doc_id"))
                .limit(1).collect())
    # the boundary TakeOrdered materialized every partition of scored,
    # so the bucket stage it derives from can be released now
    if materialize:
        safe_unpersist(buckets)
    if not boundary:
        out = scored.withColumn("selected", F.lit(False))
    else:
        kb, db = boundary[0]["key_q"], boundary[0]["doc_id"]
        out = scored.withColumn(
            "selected",
            (F.col("key_q") > kb)
            | ((F.col("key_q") == kb) & (F.col("doc_id") <= db)))
    if materialize:
        out = out.localCheckpoint(eager=True)
        safe_unpersist(scored)
    return out
