"""Posdb's 144-bit posting key, bit for bit (Posdb.cpp:307-393).

Every indexed word occurrence is one 18-byte key — the entire posting
(no payload).  Layout, top to bottom of the scan order:

    n2 (u64):  termId48 << 16 | docId[37:22]         (Posdb.cpp:335-339)
    n1 (u64):  docId[21:0] << 42 | 0 << 41           (Posdb.cpp:342-345)
               | siteRank4 << 37 | langId5 << 32     (Posdb.cpp:347-351)
               | wordPos18 << 14 | hashGroup4 << 10  (Posdb.cpp:353-357)
               | wordSpam4 << 6 | diversity4 << 2    (Posdb.cpp:359-363)
               | Fbits2 (bit 0 = isSynonym)          (Posdb.cpp:365-366)
    n0 (u16):  density5 << 11 | outlink1 << 10       (Posdb.cpp:369-371)
               | 1 << 9 (b-step bit) | mult4+1 << 4  (Posdb.cpp:372-376)
               | langId bit 6 << 3 | comp2 | !del    (Posdb.cpp:378-385)

Getters: Posdb.h:257 (termId = n2>>16), :268 (siteRank = n1>>37), etc.
Masks: Posdb.h:64-71, TERMID_MASK Posdb.h:95-96.

Why it matters here: ascending key order is (termId, docId, wordPos…) —
exactly the (term)-bucketed, (term, doc_id, pos)-sorted layout
``sources/writers.py::write_postings_bucketed`` produces, so one
termlist is one contiguous byte range in both engines (the Posdb shard
layout / getTermFreq RdbMap estimate).  Vectorized NumPy throughout.
"""

from __future__ import annotations

import numpy as np

TERMID_MASK = (1 << 48) - 1   # Posdb.h:95-96
MAXSITERANK = 0x0F
MAXLANGID = 0x3F
MAXWORDPOS = 0x0003FFFF
MAXDENSITYRANK = 0x1F
MAXWORDSPAMRANK = 0x0F
MAXDIVERSITYRANK = 0x0F
MAXHASHGROUP = 0x0F
MAXMULTIPLIER = 0x0F


def make_posdb_key(term_id, doc_id, word_pos, density_rank, diversity_rank,
                   word_spam_rank, site_rank, hash_group, lang_id,
                   multiplier=0, is_synonym=False, is_del=False
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ``Posdb::makeKey`` -> (n2 int64, n1 int64, n0 int32).

    Like the reference's sanity gates (Posdb.cpp:323-330), rejects
    out-of-range field values loudly instead of silently corrupting
    neighbouring fields.
    """
    t = np.asarray(term_id, dtype=np.int64).view(np.uint64)
    d = np.asarray(doc_id, dtype=np.int64).view(np.uint64)
    pos = np.asarray(word_pos, dtype=np.uint64)
    den = np.asarray(density_rank, dtype=np.uint64)
    div = np.asarray(diversity_rank, dtype=np.uint64)
    spam = np.asarray(word_spam_rank, dtype=np.uint64)
    sr = np.asarray(site_rank, dtype=np.uint64)
    hg = np.asarray(hash_group, dtype=np.uint64)
    lang = np.asarray(lang_id, dtype=np.uint64)
    mult = np.zeros_like(pos) + np.asarray(multiplier, dtype=np.uint64)
    for name, arr, mx in (("siteRank", sr, MAXSITERANK),
                          ("wordSpamRank", spam, MAXWORDSPAMRANK),
                          ("densityRank", den, MAXDENSITYRANK),
                          ("diversityRank", div, MAXDIVERSITYRANK),
                          ("langId", lang, MAXLANGID),
                          ("hashGroup", hg, MAXHASHGROUP),
                          ("wordPos", pos, MAXWORDPOS),
                          ("multiplier", mult, MAXMULTIPLIER)):
        if np.any(arr > mx):
            raise ValueError(f"{name} exceeds its field width (> {mx})")

    n2 = (t & np.uint64(TERMID_MASK)) << np.uint64(16)
    n2 |= d >> np.uint64(22)

    n1 = d & np.uint64(0x3FFFFF)
    n1 <<= np.uint64(1)           # zero b-step alignment bit
    n1 <<= np.uint64(4)
    n1 |= sr
    n1 <<= np.uint64(5)
    n1 |= lang & np.uint64(0x1F)
    n1 <<= np.uint64(18)
    n1 |= pos
    n1 <<= np.uint64(4)
    n1 |= hg
    n1 <<= np.uint64(4)
    n1 |= spam
    n1 <<= np.uint64(4)
    n1 |= div
    n1 <<= np.uint64(2)
    n1 |= np.asarray(is_synonym, dtype=bool).astype(np.uint64)

    n0 = den
    n0 <<= np.uint64(1)           # outlink-text reserved bit
    n0 <<= np.uint64(1)
    n0 |= np.uint64(1)            # one b-step bit
    n0 <<= np.uint64(5)
    n0 |= mult
    n0 <<= np.uint64(1)
    n0 |= (lang >> np.uint64(5)) & np.uint64(1)   # maverick langid bit 6
    n0 <<= np.uint64(2)           # compression bits
    n0 <<= np.uint64(1)
    n0 |= (~np.asarray(is_del, dtype=bool)).astype(np.uint64)
    return n2.view(np.int64), n1.view(np.int64), n0.astype(np.int32)


def pkey_term_id(n2) -> np.ndarray:
    """Posdb.h:257 — termId = n2 >> 16."""
    u = np.asarray(n2, dtype=np.int64).view(np.uint64)
    return (u >> np.uint64(16)).astype(np.int64)


def pkey_doc_id(n2, n1) -> np.ndarray:
    """docId straddles the n2/n1 boundary (16 high bits / 22 low bits)."""
    hi = np.asarray(n2, dtype=np.int64).view(np.uint64) & np.uint64(0xFFFF)
    lo = (np.asarray(n1, dtype=np.int64).view(np.uint64)
          >> np.uint64(42)) & np.uint64(0x3FFFFF)
    return ((hi << np.uint64(22)) | lo).astype(np.int64)


def pkey_site_rank(n1) -> np.ndarray:
    """Posdb.h:268 — (n1 >> 37) & MAXSITERANK."""
    u = np.asarray(n1, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(37)) & np.uint64(MAXSITERANK)).astype(np.int64)


def pkey_word_pos(n1) -> np.ndarray:
    u = np.asarray(n1, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(14)) & np.uint64(MAXWORDPOS)).astype(np.int64)


def pkey_hash_group(n1) -> np.ndarray:
    u = np.asarray(n1, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(10)) & np.uint64(MAXHASHGROUP)).astype(np.int64)


def pkey_word_spam(n1) -> np.ndarray:
    u = np.asarray(n1, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(6)) & np.uint64(MAXWORDSPAMRANK)).astype(np.int64)


def pkey_diversity(n1) -> np.ndarray:
    u = np.asarray(n1, dtype=np.int64).view(np.uint64)
    return ((u >> np.uint64(2)) & np.uint64(MAXDIVERSITYRANK)).astype(np.int64)


def pkey_is_synonym(n1) -> np.ndarray:
    u = np.asarray(n1, dtype=np.int64).view(np.uint64)
    return (u & np.uint64(1)).astype(bool)


def pkey_lang_id(n1, n0) -> np.ndarray:
    """5 bits in n1 plus the maverick 6th bit in n0 (Posdb.cpp:350-351,
    378-380)."""
    lo = (np.asarray(n1, dtype=np.int64).view(np.uint64)
          >> np.uint64(32)) & np.uint64(0x1F)
    hi = (np.asarray(n0, dtype=np.int32).astype(np.uint64)
          >> np.uint64(3)) & np.uint64(1)
    return ((hi << np.uint64(5)) | lo).astype(np.int64)


def pkey_density(n0) -> np.ndarray:
    u = np.asarray(n0, dtype=np.int32).astype(np.uint64)
    return ((u >> np.uint64(11)) & np.uint64(MAXDENSITYRANK)).astype(np.int64)


def pkey_multiplier(n0) -> np.ndarray:
    u = np.asarray(n0, dtype=np.int32).astype(np.uint64)
    return ((u >> np.uint64(4)) & np.uint64(MAXMULTIPLIER)).astype(np.int64)


def pkey_is_del(n0) -> np.ndarray:
    u = np.asarray(n0, dtype=np.int32).astype(np.uint64)
    return (u & np.uint64(1)) == np.uint64(0)
