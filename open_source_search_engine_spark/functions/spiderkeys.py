"""Spiderdb's 128-bit record key, bit for bit (Spider.cpp:642-674).

Every spiderdb request/reply is stored under one key128 whose byte
order IS the scheduler's scan order — firstIp first, then uh48, reply
before request, then parentDocId:

    n1 (u64):  firstIp<<32 | uh48[47:16]            (Spider.cpp:649-657)
    n0 (u64):  uh48[15:0]<<48 | isRequest<<47       (Spider.cpp:658-663)
               | parentDocId<<9 | pad8<<1 | !del    (Spider.cpp:664-673)

Getters: Spider.h:437-460 (getUrlHash48 / isSpiderRequest /
getParentDocId / getFirstIp).

Why it matters here: our frontier tables sort/cluster by the COLUMNS
(first_ip, uh48, is_request, parent_docid) — `sorted_by_key_order`
below proves that column order and the reference's key order are the
same total order (the unsigned-firstIp comparison included), so a
partition pruned on first_ip + min/max stats scans exactly the byte
range Msg5's RdbMap would (SURVEY §2.2 S4).  Vectorized NumPy, usable
in Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

DOCID_MASK = (1 << 38) - 1


def make_spiderdb_key(first_ip, uh48, is_request, parent_docid,
                      is_del=False) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``Spiderdb::makeKey`` -> (n1, n0) int64 bit patterns."""
    ip = np.asarray(first_ip, dtype=np.int64).astype(np.uint32)
    uh = np.asarray(uh48, dtype=np.int64).view(np.uint64) & np.uint64(
        0xFFFFFFFFFFFF)
    n1 = (ip.astype(np.uint64) << np.uint64(32)) | (uh >> np.uint64(16))
    n0 = uh & np.uint64(0xFFFF)
    n0 <<= np.uint64(1)
    n0 |= np.asarray(is_request, dtype=bool).astype(np.uint64)
    n0 <<= np.uint64(38)
    n0 |= (np.asarray(parent_docid, dtype=np.int64).view(np.uint64)
           & np.uint64(DOCID_MASK))
    n0 <<= np.uint64(8)   # reserved padding
    n0 <<= np.uint64(1)
    n0 |= (~np.asarray(is_del, dtype=bool)).astype(np.uint64)  # live bit
    return n1.view(np.int64), n0.view(np.int64)


def key_first_ip(n1) -> np.ndarray:
    """Spider.h:458-460 (returned as the unsigned 32-bit value)."""
    u = np.asarray(n1, dtype=np.int64).view(np.uint64)
    return (u >> np.uint64(32)).astype(np.int64)


def key_uh48(n1, n0) -> np.ndarray:
    """Spider.h:437-439."""
    a = np.asarray(n1, dtype=np.int64).view(np.uint64)
    b = np.asarray(n0, dtype=np.int64).view(np.uint64)
    return (((a << np.uint64(16)) | (b >> np.uint64(48)))
            & np.uint64(0xFFFFFFFFFFFF)).astype(np.int64)


def key_is_request(n0) -> np.ndarray:
    """Spider.h:441-443."""
    u = np.asarray(n0, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(47)) & np.uint64(1)).astype(bool)


def key_parent_docid(n0) -> np.ndarray:
    """Spider.h:449-451."""
    u = np.asarray(n0, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(9)) & np.uint64(DOCID_MASK)).astype(np.int64)


def key_is_del(n0) -> np.ndarray:
    """Live bit inverted (Spider.cpp:671-673)."""
    u = np.asarray(n0, dtype=np.int64).view(np.uint64)
    return (u & np.uint64(1)) == np.uint64(0)


def sorted_by_key_order(first_ip, uh48, is_request, parent_docid
                        ) -> np.ndarray:
    """Argsort by the PACKED key (n1, n0) — the Rdb scan order.  Equal
    to lexsorting the columns (unsigned first_ip, uh48, is_request,
    parent_docid): replies sort before requests for the same url (the
    is_request bit sits above parentDocId), which is why the merge-time
    annihilation pass sees the reply first."""
    n1, n0 = make_spiderdb_key(first_ip, uh48, is_request, parent_docid)
    return np.lexsort((n0.view(np.uint64), n1.view(np.uint64)))
