"""Distributed two-level k-means — SemDeDup-scale clustering (k ~ n/512).

VERDICT r3 item 1: at the SemDeDup paper's own regime (arXiv:2303.09540 —
k grows with n, 50k clusters per 1e9 points, so k ~ 2x10^7 at 10^10
vectors) the ANN-sized ``simsearch.ivf_centroids`` path is driver-bound:
its ``limit(sample).collect()`` would pull ~4x10^7 rows (~20 GB) to the
driver, the serial farthest-point loop is ~10^15 flops, and
``ivf_assign`` would close over a ~10 GB k x d centroid matrix.  This
module replaces all three with structures whose driver/broadcast state is
bounded by sqrt(k), never k:

level 1 — COARSE (k1 ~ sqrt(k) centroids, broadcastable by construction):
  deterministic distributed Lloyd.  Seeding is farthest-point over a
  bounded fixed-order sample (k1*SEED_OVERSAMPLE rows — at k=2x10^7 that
  is ~18k rows, a few MB).  Each Lloyd iteration is ONE job: a
  ``mapInPandas`` pass assigns every row to its nearest coarse centroid
  and emits per-batch partial sums of the INTEGER-QUANTIZED vectors
  (round(x * 2^20) — int64 sums are associative/commutative, so the
  re-centered means are bit-identical under any partitioning, which keeps
  committed goldens stable), then a k1-row groupBy aggregate (map-side
  combined) is collected and re-centered on the driver.  Driver state per
  iteration: k1 rows.  Determinism caveat: the integer SUMS are exact
  under any partitioning, but each row's argmin assignment goes through
  float BLAS matmuls whose within-dot-product reduction order can vary
  with batch shape or BLAS build — a vector lying numerically ON a
  Voronoi boundary could flip cells across environments.  Goldens are
  therefore pinned per BLAS build (this sandbox), not claimed portable
  across linear-algebra libraries.

level 2 — FINE (k2_i sub-centroids per coarse cell, sum k2_i ~ k):
  per-cell local k-means trained on a BOUNDED per-cell sample
  (SUB_SAMPLE_FACTOR * k2_i rows, selected by deterministic salted
  hash-rank so a mega-cell never serializes into one sort task —
  pipeline.scale.salted_topk_per_key's two-phase shape).  The trained
  sub-centroid TABLE stays distributed; fine assignment is a cogrouped
  ``applyInPandas`` on the coarse id — each task sees one cell's rows and
  that cell's few sub-centroids, so nothing proportional to k is ever
  collected or broadcast.  Per-task memory is the cell size, dialed by
  ``coarse_k`` (cell ~ n/k1; raise k1 to shrink cells).

Global fine-bucket ids are dense blocks allocated from the k1-row count
aggregate (start_i = cumsum k2_i), so ids are deterministic and compact.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUM_QSCALE = 1 << 20       # partial-sum quantization (exact int64 sums)
SEED_OVERSAMPLE = 4         # seed-sample rows per coarse centroid
SUB_SAMPLE_FACTOR = 32      # training-sample rows per fine sub-centroid
LLOYD_ITERS = 3             # fixed iteration count (determinism > argmin)
K2_MAX = 1024               # sub-centroids per coarse cell: bounds the
                            # per-cell trainer (one task: local k-means
                            # over <= 32*1024 sample rows with a serial
                            # O(sample x k2) farthest-point seed) even
                            # when a hot cell would proportionally claim
                            # far more; the under-split cells come out
                            # oversized and semdedup's _split_oversized
                            # recursion is the layer that enforces the
                            # final cluster-size bound

ASSIGN_SIM_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("qnvec", T.ArrayType(T.LongType())),
    T.StructField("bucket", T.LongType()),
    T.StructField("centroid_sim_q", T.LongType()),
])

_PARTIAL_SCHEMA = T.StructType([
    T.StructField("bucket", T.LongType()),
    T.StructField("cnt", T.LongType()),
    T.StructField("qsum", T.ArrayType(T.LongType())),
])

_SUBCENT_SCHEMA = T.StructType([
    T.StructField("coarse", T.LongType()),
    T.StructField("sub", T.IntegerType()),
    T.StructField("centroid", T.ArrayType(T.DoubleType())),
])


def local_kmeans(mat: np.ndarray, k: int, iters: int = LLOYD_ITERS
                 ) -> np.ndarray:
    """Deterministic in-memory k-means (farthest-point seed + fixed Lloyd
    iterations, no RNG).  Callers pass a BOUNDED, deterministically
    ordered sample.  Shared by the level-2 trainer and semdedup's
    oversized-cluster splitter."""
    mat = np.asarray(mat, dtype=np.float64)
    k = min(k, len(mat))
    cents = [mat[0]]
    d2 = ((mat - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        cents.append(mat[int(np.argmax(d2))])
        d2 = np.minimum(d2, ((mat - cents[-1]) ** 2).sum(axis=1))
    c = np.stack(cents)
    for _ in range(iters):
        cn = (c ** 2).sum(axis=1)
        assign = (cn[None, :] - 2.0 * (mat @ c.T)).argmin(axis=1)
        for ci in range(len(c)):            # empty cells keep their seed
            mask = assign == ci
            if mask.any():
                c[ci] = mat[mask].mean(axis=0)
    return c


def _seed_sample(emb: DataFrame, n_rows: int) -> np.ndarray:
    """Bounded fixed-order seed sample (first n_rows by vec_id — a
    TakeOrdered, so the driver receives exactly n_rows)."""
    rows = (emb.orderBy("vec_id").limit(n_rows)
            .select("embedding").collect())
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def lloyd_fit(emb: DataFrame, k: int, iters: int = LLOYD_ITERS,
              seed_rows: int | None = None) -> np.ndarray:
    """Distributed Lloyd for a BROADCASTABLE k (the coarse level — driver
    and closure state are k x d, never n).  Deterministic: assignment is a
    pure row function of the float centroids, and re-centering sums
    integer-quantized vectors (order-independent), so the result is
    bit-identical under any partitioning or core count ON A FIXED BLAS
    build (see the module docstring's caveat: the per-row float dot
    products are not reduction-order-portable across BLAS libraries)."""
    seed_rows = seed_rows or max(64, SEED_OVERSAMPLE * k)
    c = local_kmeans(_seed_sample(emb, seed_rows), k, iters=0)
    k = len(c)

    for _ in range(iters):
        cents = c                            # rebind for closure capture

        def _partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cn = (cents ** 2).sum(axis=1)
            for batch in it:
                mat = np.stack(batch["embedding"].values).astype(np.float64)
                assign = (cn[None, :] - 2.0 * (mat @ cents.T)).argmin(axis=1)
                q = np.round(mat * _SUM_QSCALE).astype(np.int64)
                out_b, out_c, out_s = [], [], []
                for b in np.unique(assign):
                    mask = assign == b
                    out_b.append(int(b))
                    out_c.append(int(mask.sum()))
                    out_s.append(q[mask].sum(axis=0))
                yield pd.DataFrame({"bucket": out_b, "cnt": out_c,
                                    "qsum": out_s})

        d = c.shape[1]
        partials = emb.select("embedding").mapInPandas(
            _partials, schema=_PARTIAL_SCHEMA)
        agg = (partials.groupBy("bucket")
               .agg(F.sum("cnt").alias("cnt"),
                    F.array(*[F.sum(F.col("qsum")[i]).alias(f"s{i}")
                              for i in range(d)]).alias("qsum"))
               .collect())                       # k rows, map-side combined
        c = c.copy()
        for r in agg:
            c[r["bucket"]] = (np.array(r["qsum"], dtype=np.float64)
                              / r["cnt"] / _SUM_QSCALE)
    return c


def _coarse_assign(emb: DataFrame, cents: np.ndarray) -> DataFrame:
    """(vec_id, embedding, coarse) — one Arrow pass; the closure carries
    only the k1 x d coarse matrix."""
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", emb.schema["embedding"].dataType),
        T.StructField("coarse", T.LongType()),
    ])

    def _assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cn = (cents ** 2).sum(axis=1)
        for batch in it:
            mat = np.stack(batch["embedding"].values).astype(np.float64)
            assign = (cn[None, :] - 2.0 * (mat @ cents.T)).argmin(axis=1)
            yield pd.DataFrame({
                "vec_id": batch["vec_id"].astype("int64"),
                "embedding": batch["embedding"],
                "coarse": assign.astype("int64"),
            })

    return emb.select("vec_id", "embedding").mapInPandas(
        _assign, schema=schema)


def bounded_cell_sample(assigned: DataFrame, caps: dict[int, int],
                        key: str = "coarse",
                        n_salts: int = 32) -> DataFrame:
    """<= caps[key] training rows per cell, picked by deterministic
    hash-rank.  Delegates to pipeline.scale.salted_topk_per_key with a
    per-key cap column: a mega-cell never funnels through one sort task,
    and the cap is constant within the key so the salted prune is exact.
    Shared by the two-level trainer here (key='coarse') and semdedup's
    oversized-cluster splitter (key='bucket') so the salting/cap
    semantics cannot drift between the two tiers."""
    from ..pipeline.scale import salted_topk_per_key

    spark = assigned.sparkSession
    caps_df = F.broadcast(spark.createDataFrame(
        [(int(c), int(v)) for c, v in sorted(caps.items())],
        f"{key} long, _cap int"))          # k1 rows — broadcastable always
    order = [F.xxhash64("vec_id"), F.col("vec_id")]
    salt = F.pmod(F.xxhash64("vec_id", F.lit(1)), F.lit(n_salts)).cast("int")
    return (salted_topk_per_key(assigned.join(caps_df, key), key,
                                order, F.col("_cap"), salt_col=salt,
                                rank_name="_rn")
            .drop("_rn", "_cap"))


def two_level_assign(emb: DataFrame, k: int, sim_qscale: int,
                     coarse_k: int | None = None,
                     iters: int = LLOYD_ITERS,
                     materialize: bool = True,
                     n_rows: int | None = None) -> DataFrame:
    """Cluster ``emb`` (vec_id, embedding) into ~k buckets and return the
    semdedup-ready quant table (vec_id, qnvec, bucket, centroid_sim_q):

      coarse Lloyd (k1 ~ sqrt(k), distributed, deterministic)
      → coarse-assign pass
      → bounded per-cell sample → per-cell local k-means (sub-centroids
        stay a DataFrame)
      → cogrouped fine assign: each task sees one cell + its few
        sub-centroids; emits the global dense bucket id, the
        _QSCALE-quantized unit vector, and the integer cosine to the
        OWN-bucket centroid (semdedup's greedy order key).

    No collect or closure anywhere is proportional to k — the driver
    holds at most k1 = O(sqrt(k)) rows at a time.

    With ``materialize=True`` (default) the returned DataFrame is
    persisted and materialized once here so the internal
    coarse-assignment cache can be released; callers that are done with
    it release it with ``memutil.safe_unpersist``.  With
    ``materialize=False`` nothing is persisted or pre-computed beyond
    the bounded driver aggregates — the fully lazy plan comes back and
    the coarse-assign pass reruns per downstream action (plan
    inspection / test mode).

    ``n_rows``: the corpus row count, if the caller already paid for it
    (semdedup's auto-k sizing does) — skips a redundant full-corpus
    count() action here."""
    n = n_rows if n_rows is not None else emb.count()
    if coarse_k is None:
        coarse_k = max(4, int(np.ceil(np.sqrt(k))))
    coarse_k = min(coarse_k, k, max(1, n))
    cents = lloyd_fit(emb, coarse_k, iters=iters)
    assigned = _coarse_assign(emb, cents)
    if materialize:
        assigned = assigned.persist()
    try:
        counts = {r["coarse"]: r["cnt"] for r in
                  (assigned.groupBy("coarse")
                   .agg(F.count("*").alias("cnt")).collect())}  # k1 rows
        # dense global id blocks: cell i owns [start_i, start_i + k2_i)
        k2, starts, nxt = {}, {}, 0
        for c in sorted(counts):
            k2[c] = min(K2_MAX,
                        max(1, int(round(k * counts[c] / max(1, n)))))
            starts[c] = nxt
            nxt += k2[c]
        caps = {c: SUB_SAMPLE_FACTOR * k2[c] for c in k2}
        sample = bounded_cell_sample(assigned, caps)
        k2_b, starts_b = dict(k2), dict(starts)   # tiny (k1 entries)

        def _train(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("vec_id")
            c = int(pdf["coarse"].iloc[0])
            mat = np.stack(pdf["embedding"].values)
            cent = local_kmeans(mat, k2_b[c])
            return pd.DataFrame({
                "coarse": np.full(len(cent), c, dtype=np.int64),
                "sub": np.arange(len(cent), dtype=np.int32),
                "centroid": list(cent),
            })

        subcents = sample.groupBy("coarse").applyInPandas(
            _train, schema=_SUBCENT_SCHEMA)

        _EMPTY = pd.DataFrame({
            "vec_id": pd.Series(dtype="int64"),
            "qnvec": pd.Series(dtype="object"),
            "bucket": pd.Series(dtype="int64"),
            "centroid_sim_q": pd.Series(dtype="int64"),
        })

        def _fine(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if left.empty or right.empty:   # can't happen by construction
                return _EMPTY
            c = int(left["coarse"].iloc[0])
            right = right.sort_values("sub")
            cent = np.stack(right["centroid"].values).astype(np.float64)
            mat = np.stack(left["embedding"].values).astype(np.float64)
            cn = (cent ** 2).sum(axis=1)
            sub = (cn[None, :] - 2.0 * (mat @ cent.T)).argmin(axis=1)
            unit = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            qn = np.round(unit * sim_qscale).astype(np.int64)
            cu = cent / np.maximum(
                np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
            qc = np.round(cu * sim_qscale).astype(np.int64)[sub]
            return pd.DataFrame({
                "vec_id": left["vec_id"].astype("int64"),
                "qnvec": list(qn),
                "bucket": starts_b[c] + sub.astype(np.int64),
                "centroid_sim_q": (qn * qc).sum(axis=1),
            })

        out = (assigned.groupBy("coarse")
               .cogroup(subcents.groupBy("coarse"))
               .applyInPandas(_fine, schema=ASSIGN_SIM_SCHEMA))
        if materialize:
            # materialize before unpersisting the coarse assignment the
            # plan reads twice (sample/train side and fine-assign side)
            out = out.persist()
            out.count()
        return out
    finally:
        if materialize:
            assigned.unpersist()
