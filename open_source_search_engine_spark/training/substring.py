"""Cross-document exact-substring deduplication (the ExactSubstr
operator of Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better"; also the RefinedWeb/Gopher pipelines' exact
span cut).  Any token span of length >= ``min_len`` that occurs more
than once in the corpus — in another document or again in the same one
— is removed from EVERY occurrence (the paper's remove-all policy).

Spark shape (suffix arrays are not a distributed-join-friendly
structure; the window-hash equivalent is):
- a duplicated span of length >= L always contains a duplicated
  L-token window, and cutting every duplicated L-window's cover equals
  cutting every maximal duplicated span >= L — so windows are the unit;
- stage 1 (mapInPandas, NumPy): tokenize each batch with the flat
  tabulation-hash kernel (training/dedup.py), then one
  sliding-window-view dot with the B^j power vector gives every
  L-window's 64-bit polynomial hash with no per-doc Python loop;
  emits (doc_id, start, h) — one row per window, the operator's known
  shuffle cost (corpus-token-count rows; bucket by h at 100 TB);
- stage 2: ``groupBy(h).count() >= 2`` finds duplicated windows; a
  left-semi join marks their occurrences (64-bit collisions are the
  usual rolling-hash tradeoff: ~n^2/2^64, negligible below ~10^8
  windows per collision; shard the hash space before that);
- stage 3 (pure Catalyst): per doc, the covered-position set is
  flatten/sequence over the marked starts; the rebuilt text keeps the
  uncovered tokens via a filter-with-index lambda.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import _token_hashes_batch

_B = np.uint64(0x100000001B3)        # FNV-ish odd multiplier (mod 2^64)

_WINDOW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("start", T.IntegerType()),
    T.StructField("h", T.LongType()),
])


def _window_hash_batches(it: Iterator[pd.DataFrame], min_len: int
                         ) -> Iterator[pd.DataFrame]:
    powers = np.empty(min_len, dtype=np.uint64)
    powers[-1] = np.uint64(1)
    with np.errstate(over="ignore"):            # uint64 wraparound is
        for j in range(min_len - 2, -1, -1):    # the hash definition
            powers[j] = powers[j + 1] * _B
    for pdf in it:
        th, offs = _token_hashes_batch(pdf["text"].tolist())
        out_doc, out_start, out_h = [], [], []
        for row, doc_id in enumerate(pdf["doc_id"].tolist()):
            t = th[offs[row]:offs[row + 1]]
            n = len(t)
            if n < min_len:
                continue
            wins = np.lib.stride_tricks.sliding_window_view(t, min_len)
            h = (wins * powers).sum(axis=1, dtype=np.uint64)
            out_doc.append(np.full(len(h), doc_id, dtype=np.int64))
            out_start.append(np.arange(len(h), dtype=np.int32))
            out_h.append(h.view(np.int64))
        if out_doc:
            yield pd.DataFrame({
                "doc_id": np.concatenate(out_doc),
                "start": np.concatenate(out_start),
                "h": np.concatenate(out_h)})


def window_hashes(docs: DataFrame, min_len: int,
                  id_col: str = "doc_id", text_col: str = "text"
                  ) -> DataFrame:
    """(doc_id, start, h): the 64-bit polynomial hash of every
    ``min_len``-token window, 0-based start."""
    src = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.col(text_col).alias("text"))
    return src.mapInPandas(
        lambda it: _window_hash_batches(it, min_len), schema=_WINDOW_SCHEMA)


def exact_substring_dedup(docs: DataFrame, min_len: int = 50,
                          id_col: str = "doc_id", text_col: str = "text"
                          ) -> DataFrame:
    """(doc_id, n_tokens, n_removed, text_dedup): every occurrence of
    every globally-duplicated ``min_len``-token window is cut."""
    wins = window_hashes(docs, min_len, id_col=id_col, text_col=text_col)
    dup_h = (wins.groupBy("h").count()
             .filter(F.col("count") >= 2).select("h"))
    marked = (wins.join(dup_h, "h", "left_semi")
              .groupBy("doc_id")
              .agg(F.sort_array(F.collect_list("start")).alias("starts")))
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.col(text_col).alias("text"))
    joined = base.join(marked, "doc_id", "left")
    toks = F.split(F.col("text"), r"\s+")
    covered = F.array_distinct(F.flatten(F.transform(
        F.coalesce(F.col("starts"), F.array().cast("array<int>")),
        lambda s: F.sequence(s, s + F.lit(min_len - 1)))))
    kept = F.filter(toks, lambda x, i: ~F.array_contains(covered, i))
    return joined.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(covered).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("text_dedup"))
