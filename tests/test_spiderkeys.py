"""Spiderdb key128 pack/unpack + scan-order equivalence
(functions/spiderkeys.py)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_spark.functions.spiderkeys import (
    DOCID_MASK, key_first_ip, key_is_del, key_is_request, key_parent_docid,
    key_uh48, make_spiderdb_key, sorted_by_key_order)


def _ref_make_key(first_ip, uh48, is_request, parent_docid, is_del=False):
    """Literal transcription of Spiderdb::makeKey (Spider.cpp:642-674)."""
    n1 = (first_ip & 0xFFFFFFFF) << 32
    n1 |= (uh48 >> 16) & 0xFFFFFFFF
    n0 = uh48 & 0xFFFF
    n0 <<= 1
    if is_request:
        n0 |= 1
    n0 <<= 38
    n0 |= parent_docid & DOCID_MASK
    n0 <<= 8
    n0 <<= 1
    if not is_del:
        n0 |= 1
    return n1 & 0xFFFFFFFFFFFFFFFF, n0 & 0xFFFFFFFFFFFFFFFF


CASES = [
    (0, 0, False, 0, True),
    (0x7F000001, 0xFFFFFFFFFFFF, True, DOCID_MASK, False),
    (-1, 0x123456789ABC, True, 12345, False),          # ip with high bit
    (0x0A0B0C0D, 0x0000FFFF0000, False, 0, False),
    (167772161, 48281919994894, True, 155874833450, False),
]


class TestPackUnpack:
    def test_matches_reference_transcription(self):
        for ip, uh, req, pdoc, dele in CASES:
            n1, n0 = make_spiderdb_key([ip], [uh], [req], [pdoc],
                                       is_del=[dele])
            rn1, rn0 = _ref_make_key(ip, uh, req, pdoc, dele)
            assert int(np.asarray(n1).view(np.uint64)[0]) == rn1, (ip, uh)
            assert int(np.asarray(n0).view(np.uint64)[0]) == rn0, (ip, uh)

    def test_round_trip(self):
        ips = [c[0] for c in CASES]
        uhs = [c[1] for c in CASES]
        reqs = [c[2] for c in CASES]
        pds = [c[3] for c in CASES]
        dels = [c[4] for c in CASES]
        n1, n0 = make_spiderdb_key(ips, uhs, reqs, pds, is_del=dels)
        assert list(key_first_ip(n1)) == [ip & 0xFFFFFFFF for ip in ips]
        assert list(key_uh48(n1, n0)) == uhs
        assert list(key_is_request(n0)) == reqs
        assert list(key_parent_docid(n0)) == pds
        assert list(key_is_del(n0)) == dels

    @given(st.integers(0, 0xFFFFFFFF), st.integers(0, (1 << 48) - 1),
           st.booleans(), st.integers(0, DOCID_MASK), st.booleans())
    @settings(max_examples=200, deadline=None)
    def test_property_round_trip(self, ip, uh, req, pdoc, dele):
        n1, n0 = make_spiderdb_key([ip], [uh], [req], [pdoc], is_del=[dele])
        assert int(key_first_ip(n1)[0]) == ip
        assert int(key_uh48(n1, n0)[0]) == uh
        assert bool(key_is_request(n0)[0]) == req
        assert int(key_parent_docid(n0)[0]) == pdoc
        assert bool(key_is_del(n0)[0]) == dele


class TestScanOrder:
    @given(st.lists(st.tuples(st.integers(0, 0xFFFFFFFF),
                              st.integers(0, (1 << 48) - 1),
                              st.booleans(),
                              st.integers(0, DOCID_MASK)),
                    min_size=2, max_size=60))
    @settings(max_examples=50, deadline=None)
    def test_key_order_equals_column_lexsort(self, rows):
        """The Rdb byte order IS (unsigned first_ip, uh48, is_request,
        parent_docid) column order — so a parquet table sorted by those
        columns reproduces Msg5's scan order exactly (SURVEY §2.2 S4)."""
        ips = [r[0] for r in rows]
        uhs = [r[1] for r in rows]
        reqs = [r[2] for r in rows]
        pds = [r[3] for r in rows]
        by_key = sorted_by_key_order(ips, uhs, reqs, pds)
        by_cols = sorted(range(len(rows)),
                         key=lambda i: (ips[i], uhs[i], reqs[i], pds[i]))
        # compare the induced orders on the SORT KEYS (stable wrt ties)
        assert [(ips[i], uhs[i], reqs[i], pds[i]) for i in by_key] == \
            [(ips[i], uhs[i], reqs[i], pds[i]) for i in by_cols]

    def test_reply_sorts_before_request_same_url(self):
        ips = [5, 5]
        uhs = [99, 99]
        reqs = [True, False]  # request first in input
        pds = [0, 0]
        order = sorted_by_key_order(ips, uhs, reqs, pds)
        # the reply (is_request=False) must scan first
        assert list(order) == [1, 0]
