"""SemDeDup — semantic (embedding-space) deduplication.

Public method: Abbas, Tirumala, Simig, Ganguli, Morcos, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"
(arXiv:2303.09540, 2023).  Exact near-duplicates are caught upstream by
MinHash/SimHash; SemDeDup removes *semantic* duplicates — paraphrases,
boilerplate variants, templated rewrites — that share no n-grams but sit
within a small cosine ball in embedding space:

1. k-means-cluster all embeddings (we reuse the IVF coarse quantizer:
   deterministic farthest-point centroids + nearest-centroid assignment,
   ``simsearch.ivf_centroids`` / ``ivf_assign``).  Pairwise similarity is
   only ever computed WITHIN a cluster — never across the corpus — so the
   candidate set is O(sum k_i^2) with k_i bounded by the cluster size, not
   O(n^2).  At 10^10 vectors the paper's regime applies: k grows ~ n
   (they use 50k clusters for 1e9 points) and oversized clusters are
   re-clustered recursively, so the per-group kernel stays bounded; the
   cluster id is the shuffle key, one Exchange total.
2. Within each cluster, greedily keep the examples with LOW similarity to
   the cluster centroid (the paper's best-performing keep policy): scan
   items in (centroid_sim ASC, vec_id) order and keep an item iff its
   cosine similarity to every already-kept item is <= eps.  Every dropped
   row records which keeper displaced it.

All similarities are integer-exact: vectors are L2-normalized then
quantized to 1e6 (one Arrow pass), so cos_q = qn_a . qn_b ~ cos * 1e12
is a deterministic int64 — no float reduction-order wobble between runs,
which keeps the committed golden byte-stable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .simsearch import ivf_assign, ivf_centroids

_QSCALE = 1_000_000          # unit-vector quantization step
_COS_SCALE = _QSCALE * _QSCALE   # quantized dot of two unit vectors ~ cos*1e12


_NORM_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("qnvec", T.ArrayType(T.LongType())),
    T.StructField("centroid_sim_q", T.LongType()),
])

SEMDEDUP_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("centroid_sim_q", T.LongType()),
    T.StructField("kept", T.BooleanType()),
    T.StructField("kept_by", T.LongType()),   # keeper that displaced it (kept rows: own id)
])


def _normalized_quantized(emb: DataFrame, centroids: np.ndarray,
                          assigned: DataFrame) -> DataFrame:
    """One Arrow pass: L2-normalize each vector, quantize to int64, and
    score its cosine to its own cluster centroid (the keep-order key)."""
    cnorm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def _quant(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            mat = np.stack(batch["embedding"].values).astype(np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                               1e-12)
            unit = mat / norms
            qn = np.round(unit * _QSCALE).astype(np.int64)
            buckets = batch["bucket"].to_numpy(dtype=np.int64)
            # integer-exact centroid similarity: quantize the centroid the
            # same way, dot in int64
            qc = np.round(cnorm * _QSCALE).astype(np.int64)[buckets]
            csim = (qn * qc).sum(axis=1)
            yield pd.DataFrame({
                "vec_id": batch["vec_id"].astype("int64"),
                "qnvec": list(qn),
                "centroid_sim_q": csim,
            })

    joined = emb.join(assigned, "vec_id").select(
        "vec_id", "embedding", "bucket")
    return joined.mapInPandas(_quant, schema=_NORM_SCHEMA).join(
        assigned, "vec_id")


def _greedy_kernel(eps_q: int):
    """Per-cluster greedy keeper scan (paper §3, keep-low-centroid-sim):
    items arrive as one cluster; sort by (centroid_sim_q, vec_id), Gram
    int64 matmul, then keep item i iff max cos_q(i, kept) <= eps_q."""

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["centroid_sim_q", "vec_id"],
                              kind="mergesort").reset_index(drop=True)
        qn = np.stack(pdf["qnvec"].values).astype(np.int64)
        gram = qn @ qn.T
        n = len(pdf)
        kept = np.zeros(n, dtype=bool)
        kept_by = np.empty(n, dtype=np.int64)
        kept_idx: list[int] = []
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        for i in range(n):
            if kept_idx:
                sims = gram[i, kept_idx]
                j = int(np.argmax(sims))
                if sims[j] > eps_q:
                    kept_by[i] = ids[kept_idx[j]]
                    continue
            kept[i] = True
            kept_by[i] = ids[i]
            kept_idx.append(i)
        return pd.DataFrame({
            "vec_id": ids,
            "bucket": pdf["bucket"].to_numpy(dtype=np.int64),
            "centroid_sim_q": pdf["centroid_sim_q"].to_numpy(np.int64),
            "kept": kept,
            "kept_by": kept_by,
        })

    return _scan


AVG_CLUSTER_TARGET = 512     # paper regime: k ~ n / bounded-cluster-size


def semdedup(emb: DataFrame, eps: float = 0.92,
             n_clusters: int | None = None) -> DataFrame:
    """Full SemDeDup verdict table: every vector with its cluster, its
    centroid similarity, whether it survives, and which keeper displaced
    it.  ``eps`` is the paper's similarity threshold (they sweep
    0.90-0.95 for web text).

    ``n_clusters=None`` scales k with the corpus like the paper does
    (50k clusters for 1e9 points): k = max(16, n / AVG_CLUSTER_TARGET),
    keeping the per-cluster O(k_i^2) greedy kernel bounded at any corpus
    size for one count() action.  Pass an explicit k to pin it.

    Plan: centroid train (bounded deterministic sample) → one Arrow
    assign pass → one Arrow normalize/quantize pass → ONE shuffle keyed
    on cluster id → per-cluster greedy kernel.  Nothing all-pairs."""
    if n_clusters is None:
        n_clusters = max(16, -(-emb.count() // AVG_CLUSTER_TARGET))
    cents = ivf_centroids(emb, n_clusters,
                          sample=max(512, 2 * n_clusters))
    assigned = ivf_assign(emb, cents)
    quant = _normalized_quantized(emb, cents, assigned)
    eps_q = int(round(eps * _COS_SCALE))
    return (quant.groupBy("bucket")
            .applyInPandas(_greedy_kernel(eps_q), schema=SEMDEDUP_SCHEMA))


def semdedup_keepers(emb: DataFrame, eps: float = 0.92,
                     n_clusters: int | None = None) -> DataFrame:
    """Just the surviving vec_ids (the corpus the trainer keeps)."""
    return (semdedup(emb, eps, n_clusters)
            .filter(F.col("kept")).select("vec_id"))
