"""Clusterdb cluster-rec keys, bit for bit (Clusterdb.h/.cpp).

The reference stores per-docid "cluster recs" — a single 96-bit key
packing everything Msg51's post-query site clustering needs, so result
filtering never touches titledb:

    n1 (u32):  upper 9 bits of the 38-bit docid      (Clusterdb.cpp:157-158)
    n0 (u64):  docid<<35 | adult<<34 | lang6<<28     (Clusterdb.cpp:160-167)
               | siteHash26<<2 | half<<1 | !del      (Clusterdb.cpp:168-176)

The "family filter bit" carries the DOC's adult flag (XmlDoc.cpp:13892
passes ``*nd->getIsAdult()``); the site hash is the HOST hash32 — "we
use the host hash for the site hash! hey, this is only 26 bits!"
(XmlDoc.cpp:13889-13895, Url.cpp getHostHash32 = hash32(host)), masked
to 26 bits on read (Clusterdb.h:81-84).  Msg51 then filters family /
language and counts visible results per siteHash26 (Msg51.cpp:500-545).

Everything here is vectorized NumPy over uint64 arrays — usable inside
Arrow-batched pandas UDFs with no per-row Python.
"""

from __future__ import annotations

import numpy as np

from .ghash import hash64b_bytes

SITE_HASH26_MASK = 0x03FFFFFF


def host_hash32(hosts) -> np.ndarray:
    """``Url::getHostHash32`` = ``hash32(host)`` — low 32 of the table
    XOR (hash.cpp:93-103) -> int64 array (non-negative)."""
    return (hash64b_bytes(hosts) & np.uint64(0xFFFFFFFF)).astype(np.int64)


def site_hash26(hosts) -> np.ndarray:
    """The 26-bit site key Msg51 clusters on (Clusterdb.h:81-84 applied
    to the host hash32 XmlDoc stores)."""
    return host_hash32(hosts) & np.int64(SITE_HASH26_MASK)


def make_cluster_rec_key(docids, adult, lang, site_hash,
                         is_del=False, is_half=False
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``makeClusterRecKey`` (Clusterdb.cpp:149-177) ->
    (n1 int64 array, n0 int64 array — the uint64 bit pattern viewed
    signed so it round-trips through Spark LongType)."""
    d = np.asarray(docids, dtype=np.uint64)
    n1 = ((d >> np.uint64(29)) & np.uint64(0x1FF)).astype(np.int64)
    n0 = d << np.uint64(35)
    n0 |= np.where(np.asarray(adult, dtype=bool),
                   np.uint64(0x0000000400000000), np.uint64(0))
    n0 |= (np.asarray(lang, dtype=np.uint64) & np.uint64(0x3F)) << np.uint64(28)
    n0 |= (np.asarray(site_hash, dtype=np.uint64)
           & np.uint64(SITE_HASH26_MASK)) << np.uint64(2)
    if np.any(is_half):
        n0 |= np.where(np.asarray(is_half, dtype=bool),
                       np.uint64(2), np.uint64(0))
    # del bit is INVERTED: positive (live) recs have bit 0 SET
    n0 |= np.where(np.asarray(is_del, dtype=bool),
                   np.uint64(0), np.uint64(1))
    return n1, n0.view(np.int64)


def cluster_docid(n1, n0) -> np.ndarray:
    """``Clusterdb::getDocId`` (Clusterdb.h:73-78)."""
    lo = np.asarray(n0, dtype=np.int64).view(np.uint64) >> np.uint64(35)
    hi = (np.asarray(n1, dtype=np.int64).astype(np.uint64)
          & np.uint64(0x1FF)) << np.uint64(29)
    return (lo | hi).astype(np.int64)


def cluster_site_hash26(n0) -> np.ndarray:
    """``getSiteHash26`` (Clusterdb.h:81-84)."""
    u = np.asarray(n0, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(2)) & np.uint64(SITE_HASH26_MASK)).astype(np.int64)


def cluster_language(n0) -> np.ndarray:
    """``getLanguage`` (Clusterdb.h:91-93)."""
    u = np.asarray(n0, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(28)) & np.uint64(0x3F)).astype(np.int64)


def cluster_has_adult(n0) -> np.ndarray:
    """``hasAdultContent`` / ``getFamilyFilter`` — the same bit 34
    (Clusterdb.h:86-99)."""
    u = np.asarray(n0, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(34)) & np.uint64(1)).astype(bool)


def cluster_is_del(n0) -> np.ndarray:
    """Del bit is inverted: bit 0 CLEAR means delete (Clusterdb.cpp:170-172)."""
    u = np.asarray(n0, dtype=np.int64).view(np.uint64)
    return (u & np.uint64(1)) == np.uint64(0)
