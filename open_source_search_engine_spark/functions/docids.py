"""Titledb probable-docid derivation + the Msg22 available-docid machine.

The reference assigns every indexed page a 38-bit docid whose bits 6-13
carry the domain's ``hash8`` (``Titledb.h:46-58`` ``getProbableDocId``:
``hash64b(url) & DOCID_MASK``, clear bits 6-13, OR in
``hash8(domain) << 6``), so every page of a domain lands in a titledb
group tagged with its domain hash — that grouping is what makes Msg22
point lookups and Clusterdb site clustering group-local
(``Titledb.h:103-104`` ``getDomHash8FromDocId``; PageReindex's synthetic
firstIp ``(docId>>6)&0xff`` reads the same bits).

A probable docid can collide with an already-indexed page.  The actual
docid is then resolved INSIDE the page's 64-docid block
(``getFirstProbableDocId``/``getLastProbableDocId``, ``Titledb.h:82-88``
— only the low 6 bits are free, so the domain bits never change): the
first free slot >= pd wins, else the first free slot below pd, else the
add fails (``Msg22.cpp:515-612`` — the ``ad1``/``ad2`` scan over the
block's titleRec list).

Spark shape: blocks are disjoint 64-slot key ranges, so assignment is a
cogrouped ``applyInPandas`` on ``block = docid >> 6`` — each task sees
one block's new urls + taken docids and resolves sequentially within it
(<= 64 live slots by construction).  At 10^10 URLs the blocks hash-
partition evenly (the block id is itself a hash), no skew, no driver
state.  Probable-docid derivation is pure vectorized NumPy over Arrow
buffers (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .ghash import hash64b_bytes

DOCID_MASK = (1 << 38) - 1  # Titledb.h:10
_DOM_CLEAR = 0xFFFFFFFFFFFFC03F  # clear bits 6-13 (Titledb.h:51)


def hash8_bytes(data) -> np.ndarray:
    """Vectorized ``hash8`` (hash.cpp:64-73): XOR of the LOW BYTE of
    ``g_hashtab[i][c]`` — XOR commutes with truncation, so it is exactly
    the low byte of ``hash64b``."""
    return (hash64b_bytes(data) & np.uint64(0xFF)).astype(np.uint8)


def probable_docid_arrays(urls, domains) -> np.ndarray:
    """``getProbableDocId(url)`` over a batch -> int64 array
    (Titledb.h:46-58): hash64b(url) masked to 38 bits, bits 6-13
    replaced by hash8(registrable domain)."""
    pd_ = hash64b_bytes(urls) & np.uint64(DOCID_MASK)
    pd_ &= np.uint64(_DOM_CLEAR)
    pd_ |= hash8_bytes(domains).astype(np.uint64) << np.uint64(6)
    return pd_.astype(np.int64)


def first_probable(d):
    """Block start: clear the 6 free bits (Titledb.h:82-84)."""
    return np.asarray(d, dtype=np.int64) & ~np.int64(0x3F)


def last_probable(d):
    """Block end: set the 6 free bits (Titledb.h:86-88)."""
    return np.asarray(d, dtype=np.int64) | np.int64(0x3F)


def dom_hash8_from_docid(d):
    """Bits 6-13 back out of a docid (Titledb.h:103-104)."""
    return (np.asarray(d, dtype=np.int64) >> np.int64(6)) & np.int64(0xFF)


def avail_docid(pd_: int, taken: set[int]) -> int | None:
    """One url's available docid given the block's live docids — a
    transcription of the ad1/ad2 scan (Msg22.cpp:515-612): ad2 = first
    free slot >= pd, ad1 = first free slot >= block start; ad1 only
    counts if strictly below pd, ad2 only if it stayed inside the
    block; prefer ad2, wrap to ad1, else fail (None)."""
    d1 = pd_ & ~0x3F
    d2 = pd_ | 0x3F
    ad1, ad2 = d1, pd_
    for dd in sorted(taken):
        if dd < d1 or dd > d2:
            continue
        if dd == ad1:
            ad1 += 1
        if dd == ad2:
            ad2 += 1
    if ad1 >= pd_:
        ad1 = 0
    if ad2 > d2:
        ad2 = 0
    ad = ad2 or ad1
    return ad if ad else None


def probable_docid_udf():
    """pandas_udf(url, domain) -> probable docid (LongType)."""

    @F.pandas_udf(T.LongType())
    def _pd(urls: pd.Series, domains: pd.Series) -> pd.Series:
        return pd.Series(probable_docid_arrays(urls, domains))

    return _pd


_ASSIGN_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("probable_docid", T.LongType()),
    T.StructField("assigned_docid", T.LongType()),
])


def assign_docids(new_docs: DataFrame, taken: DataFrame,
                  url_col: str = "url",
                  domain_col: str = "domain") -> DataFrame:
    """Batch docid assignment: every row of ``new_docs`` (url + its
    registrable domain) gets ``probable_docid`` and a collision-resolved
    ``assigned_docid`` (NULL when its 64-slot block is full — the
    reference's availDocId==0 failure, Msg22.cpp:610-612).

    ``taken`` carries one ``docid`` column of already-live docids (the
    titledb scan's positive keys).  New urls inside one block are
    resolved in ascending (probable_docid, url) order — the batch
    determinization of the reference's arrival order — and each
    assignment is visible to the next (a second url colliding on the
    same pd gets the following slot).
    """
    pdu = probable_docid_udf()
    new_pd = (new_docs
              .select(F.col(url_col).alias("url"),
                      F.col(domain_col).alias("domain"))
              .withColumn("probable_docid", pdu("url", "domain"))
              .withColumn("block", F.shiftright("probable_docid", 6)))
    taken_b = (taken.select(F.col("docid").cast("long").alias("docid"))
               .withColumn("block", F.shiftright("docid", 6)))

    def _resolve(new_g: pd.DataFrame, taken_g: pd.DataFrame) -> pd.DataFrame:
        if new_g.empty:
            return pd.DataFrame(columns=["url", "probable_docid",
                                         "assigned_docid"])
        live = set(int(x) for x in taken_g["docid"].to_numpy())
        new_g = new_g.sort_values(["probable_docid", "url"],
                                  kind="mergesort")
        out = []
        for url, pdv in zip(new_g["url"], new_g["probable_docid"]):
            ad = avail_docid(int(pdv), live)
            if ad is not None:
                live.add(ad)
            out.append((url, int(pdv), ad))
        return pd.DataFrame(out, columns=["url", "probable_docid",
                                          "assigned_docid"])

    return (new_pd.groupBy("block")
            .cogroup(taken_b.groupBy("block"))
            .applyInPandas(_resolve, schema=_ASSIGN_SCHEMA))
