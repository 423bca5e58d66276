"""Titledb docid derivation + Msg22 availDocId machine (functions/docids.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.functions.docids import (
    DOCID_MASK, assign_docids, avail_docid, dom_hash8_from_docid,
    first_probable, hash8_bytes, last_probable, probable_docid_arrays,
    probable_docid_udf)
from open_source_search_engine_spark.functions.ghash import (
    hash64b, hash_table)


def _ref_hash8(b: bytes) -> int:
    """Literal transcription of hash.cpp:64-73."""
    t = hash_table()
    h = 0
    for i, c in enumerate(b):
        h ^= int(t[i & 0xFF, c]) & 0xFF
    return h


def _ref_probable_docid(url: bytes, dom: bytes) -> int:
    """Literal transcription of Titledb.h:46-58 getProbableDocId."""
    d = hash64b(url) & DOCID_MASK
    d &= 0xFFFFFFFFFFFFC03F
    d |= _ref_hash8(dom) << 6
    return d


def _ref_avail(pd_: int, taken_sorted: list[int]) -> int:
    """Literal transcription of the Msg22.cpp:515-612 scan loop."""
    d1 = pd_ & ~0x3F
    d2 = pd_ | 0x3F
    ad1, ad2 = d1, pd_
    for dd in taken_sorted:
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
    ad = ad2
    if ad == 0:
        ad = ad1
    return ad


URLS = [b"http://www.example.com/", b"http://example.com/a/b?x=1",
        b"http://sub.host.co.uk/path", b"http://a.de/",
        b"http://site9.example2.com/doc-9"]
DOMS = [b"example.com", b"example.com", b"host.co.uk", b"a.de",
        b"example2.com"]


class TestProbableDocid:
    def test_hash8_is_low_byte_of_hash64b(self):
        got = hash8_bytes(DOMS)
        for g, d in zip(got, DOMS):
            assert int(g) == _ref_hash8(d) == (hash64b(d) & 0xFF)

    def test_vectorized_matches_reference_transcription(self):
        got = probable_docid_arrays(URLS, DOMS)
        for g, u, d in zip(got, URLS, DOMS):
            assert int(g) == _ref_probable_docid(u, d)

    def test_domain_bits_round_trip(self):
        # getDomHash8FromDocId(getProbableDocId(u)) == hash8(domain)
        # (Titledb.h:103-104) — and PageReindex's synthetic firstIp
        # (docId>>6)&0xff reads the same bits.
        d = probable_docid_arrays(URLS, DOMS)
        assert list(dom_hash8_from_docid(d)) == [_ref_hash8(x) for x in DOMS]

    def test_docid_is_38_bits(self):
        d = probable_docid_arrays(URLS, DOMS)
        assert (d >= 0).all() and (d <= DOCID_MASK).all()

    def test_block_window(self):
        d = np.array([0x1234567FC3], dtype=np.int64)
        assert int(first_probable(d)[0]) == 0x1234567FC0
        assert int(last_probable(d)[0]) == 0x1234567FFF


class TestAvailDocid:
    def test_free_block_returns_pd(self):
        assert avail_docid(1000, set()) == 1000

    def test_pd_taken_walks_forward(self):
        assert avail_docid(1000, {1000}) == 1001
        assert avail_docid(1000, {1000, 1001, 1002}) == 1003

    def test_out_of_block_taken_ignored(self):
        pd_ = (5 << 6) | 10
        assert avail_docid(pd_, {pd_ - 11, (pd_ | 0x3F) + 1}) == pd_

    def test_ad2_exhausted_wraps_to_ad1(self):
        # pd at the block's last slot and taken: ad2 leaves the block,
        # ad1 = first free slot from the block start (strictly < pd).
        pd_ = (7 << 6) | 0x3F
        assert avail_docid(pd_, {pd_}) == 7 << 6
        # block start also taken -> next free
        assert avail_docid(pd_, {pd_, 7 << 6}) == (7 << 6) + 1

    def test_full_block_fails(self):
        pd_ = 9 << 6
        assert avail_docid(pd_, {(9 << 6) + i for i in range(64)}) is None

    @pytest.mark.parametrize("seed", range(6))
    def test_matches_reference_loop_on_random_blocks(self, seed):
        rng = np.random.default_rng(seed)
        base = int(rng.integers(0, 1 << 32)) << 6
        taken = sorted(base + int(x)
                       for x in rng.choice(64, size=int(rng.integers(0, 64)),
                                           replace=False))
        pd_ = base + int(rng.integers(0, 64))
        ref = _ref_avail(pd_, taken)
        assert avail_docid(pd_, set(taken)) == (ref if ref else None)


class TestAssignDocids(object):
    def _frame(self, spark, urls, doms):
        return spark.createDataFrame(
            pd.DataFrame({"url": [u.decode() for u in urls],
                          "domain": [d.decode() for d in doms]}))

    def test_assignment_end_to_end(self, spark):
        new = self._frame(spark, URLS, DOMS)
        pds = {u.decode(): _ref_probable_docid(u, d)
               for u, d in zip(URLS, DOMS)}
        taken_vals = [pds[URLS[0].decode()],  # collide url 0 on its own pd
                      pds[URLS[0].decode()] + 1]
        taken = spark.createDataFrame(
            pd.DataFrame({"docid": taken_vals}))
        out = {r["url"]: r for r in assign_docids(new, taken).collect()}
        u0 = URLS[0].decode()
        assert out[u0]["probable_docid"] == pds[u0]
        assert out[u0]["assigned_docid"] == pds[u0] + 2
        for u in list(pds)[1:]:
            assert out[u]["assigned_docid"] == pds[u]

    def test_two_new_urls_same_pd_serialize(self):
        # Two new urls landing on the same pd consume consecutive slots
        # in (pd, url) order — the second sees the first's pick (the
        # in-block sequential semantics assign_docids applies per group).
        taken = set()
        got = []
        for _url, pdv in sorted([("a", 4096), ("b", 4096)]):
            ad = avail_docid(pdv, taken)
            taken.add(ad)
            got.append(ad)
        assert got == [4096, 4097]

    def test_plan_has_no_row_python(self, spark):
        new = self._frame(spark, URLS, DOMS)
        taken = spark.createDataFrame(pd.DataFrame({"docid": [1]}))
        plan = assign_docids(new, taken)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "FlatMapCoGroupsInPandas" in plan

    def test_udf_matches_kernel(self, spark):
        new = (self._frame(spark, URLS, DOMS)
               .withColumn("pd", probable_docid_udf()("url", "domain")))
        got = {r["url"]: r["pd"] for r in new.collect()}
        for u, d in zip(URLS, DOMS):
            assert got[u.decode()] == _ref_probable_docid(u, d)
