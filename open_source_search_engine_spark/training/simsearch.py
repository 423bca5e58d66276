"""Similarity search over an embedding column (array<float>).

- brute-force cosine/dot top-k: pure Catalyst (``zip_with`` +
  ``aggregate``), the correctness baseline (queries.py
  ``embed_topk_bruteforce`` has the cross-engine oracle)
- sign-random-projection LSH (the scale path): 16 fixed hyperplanes →
  16-bit bucket; neighbour search touches only the query's bucket (and
  optionally hamming-1 buckets).  Hyperplanes are a fixed-seed matrix
  broadcast with the task — at 10^10 vectors the bucket column is the
  partition key, so a query is one partition-pruned scan.
- IVF-style variant: k coarse centroids (deterministic subsample),
  assign-to-nearest as the bucket; same pruning structure.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DIM = 64
N_PLANES = 16
_PLANES = np.random.RandomState(0xB00C).standard_normal((DIM, N_PLANES))


def brute_force_topk(emb: DataFrame, query_vec_id: int, k: int = 20) -> DataFrame:
    """Exact top-k by quantized integer dot product (JVM-side)."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb"))
    return (
        emb.crossJoin(F.broadcast(q))
        .withColumn(
            "dot_q",
            F.aggregate(
                F.zip_with("embedding", "q_emb",
                           lambda a, b: (F.round(a * 1000).cast("long")
                                         * F.round(b * 1000).cast("long"))),
                F.lit(0).cast("long"), lambda acc, x: acc + x))
        .filter(F.col("vec_id") != query_vec_id)
        .select(F.col("vec_id").cast("long").alias("vec_id"), "dot_q")
        .orderBy(F.desc("dot_q"), "vec_id")
        .limit(k)
    )


BUCKET_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("bucket", T.LongType()),
])


def _make_bucket_batch(n_planes: int):
    def _bucket_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = _PLANES[:, :n_planes]
        for batch in it:
            mat = np.stack(batch["embedding"].values).astype(np.float64)
            signs = (mat @ planes) > 0
            buckets = (signs.astype(np.int64)
                       * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
            yield pd.DataFrame({"vec_id": batch["vec_id"].astype("int64"),
                                "bucket": buckets})
    return _bucket_batch


def lsh_buckets(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """vec_id → n_planes-bit sign-LSH bucket (NumPy matmul per Arrow batch).
    Size n_planes to the corpus: ~log2(n_vectors / desired_bucket_size)."""
    return emb.select("vec_id", "embedding").mapInPandas(
        _make_bucket_batch(n_planes), schema=BUCKET_SCHEMA)


def lsh_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
             n_planes: int = N_PLANES) -> DataFrame:
    """ANN: restrict the exact scorer to the query's LSH bucket."""
    b = lsh_buckets(emb, n_planes)
    qb = b.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("q_bucket"))
    in_bucket = (b.join(F.broadcast(qb), b["bucket"] == F.col("q_bucket"))
                 .select("vec_id"))
    cand = emb.join(in_bucket, "vec_id", "left_semi")
    return brute_force_topk(cand, query_vec_id, k)
