"""Deterministic global corpus shuffle — the last stage before training.

LLM pipelines end with a full-corpus shuffle so consecutive training
batches don't share a domain/crawl-locality bias (GPT-3 and every
open-data pipeline since; e.g. Brown et al. 2020 §2.2 mix-and-shuffle).
A seeded ``ORDER BY rand()`` is NOT reproducible across partitionings, so
we shuffle by a pure hash permutation: each doc's sort key is the
tabulation hash of (doc_id, seed) — any two runs, any cluster size, same
permutation.

``shuffle_positions`` also assigns every doc its exact 0-based position
in the shuffled stream (what a downstream sharded writer needs to cut
deterministic output files).  The global rank is computed with the same
two-pass range-sharded prefix sum as ``packing.pack_sequences``: hash
keys are uniform, so the top bits of the key ARE balanced range ids —
the only unpartitioned window runs over the n_ranges partials table
(10^4 rows for a 10^10-doc corpus at the default), never per-doc rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ghash import hash64b_bytes


def _shuffle_key_udf(seed: int):
    """Positive-int63 hash of (doc_id, seed): uint64 tabulation hash
    shifted right one bit so signed ordering equals unsigned ordering."""

    def _kernel(ids: pd.Series) -> pd.Series:
        h = hash64b_bytes([f"{d}\x1f{seed}".encode() for d in ids])
        return pd.Series((h >> np.uint64(1)).astype(np.int64))

    return F.pandas_udf(_kernel, T.LongType())


def with_shuffle_key(docs: DataFrame, seed: int = 0,
                     id_col: str = "doc_id") -> DataFrame:
    return docs.withColumn("shuffle_key",
                           _shuffle_key_udf(seed)(F.col(id_col)))


def shuffle_corpus(docs: DataFrame, seed: int = 0,
                   id_col: str = "doc_id") -> DataFrame:
    """The rows of ``docs`` in shuffled order: range-repartition by the
    hash key + sort within partitions — a total order across partition
    index with ONE shuffle and no global sort stage."""
    keyed = with_shuffle_key(docs, seed, id_col)
    return (keyed.repartitionByRange(F.col("shuffle_key"), F.col(id_col))
            .sortWithinPartitions("shuffle_key", id_col))


def shuffle_positions(docs: DataFrame, seed: int = 0,
                      id_col: str = "doc_id",
                      n_ranges: int = 1024) -> DataFrame:
    """(doc_id, shuffle_key, position): every doc's exact 0-based rank in
    the shuffled stream.  position = range offset (prefix sum over the
    bounded partials table) + in-range rank (window bounded at ~n/n_ranges
    rows by hash uniformity; scale n_ranges with the corpus)."""
    keyed = (docs.select(F.col(id_col).alias("doc_id"))
             .withColumn("shuffle_key", _shuffle_key_udf(seed)("doc_id"))
             .withColumn("rng", (F.col("shuffle_key")
                                 / int((1 << 63) / n_ranges)).cast("long")))
    partials = keyed.groupBy("rng").agg(F.count("*").alias("rng_n"))
    off_w = (Window.orderBy("rng")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = partials.withColumn(
        "rng_offset", F.coalesce(F.sum("rng_n").over(off_w), F.lit(0)))
    in_rng = Window.partitionBy("rng").orderBy("shuffle_key", "doc_id")
    return (keyed.join(F.broadcast(offsets.select("rng", "rng_offset")),
                       "rng")
            .withColumn("position",
                        (F.col("rng_offset")
                         + F.row_number().over(in_rng) - 1).cast("long"))
            .select("doc_id", "shuffle_key", "position"))
