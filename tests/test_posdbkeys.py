"""Posdb key144 pack/unpack (functions/posdbkeys.py)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_spark.functions.posdbkeys import (
    MAXDENSITYRANK, MAXDIVERSITYRANK, MAXHASHGROUP, MAXLANGID,
    MAXMULTIPLIER, MAXSITERANK, MAXWORDPOS, MAXWORDSPAMRANK, TERMID_MASK,
    make_posdb_key, pkey_density, pkey_diversity, pkey_doc_id,
    pkey_hash_group, pkey_is_del, pkey_is_synonym, pkey_lang_id,
    pkey_multiplier, pkey_site_rank, pkey_term_id, pkey_word_pos,
    pkey_word_spam)

DOCID_MASK = (1 << 38) - 1


def _ref_make_key(termId, docId, wordPos, densityRank, diversityRank,
                  wordSpamRank, siteRank, hashGroup, langId,
                  multiplier=0, isSynonym=False, isDelKey=False):
    """Literal transcription of Posdb::makeKey (Posdb.cpp:307-393)."""
    M = 0xFFFFFFFFFFFFFFFF
    termId = termId & TERMID_MASK
    n2 = termId
    n2 <<= 16
    n2 |= docId >> 22
    n1 = docId & 0x3FFFFF
    n1 <<= 1
    n1 <<= 4
    n1 |= siteRank
    n1 <<= 5
    n1 |= langId & 0x1F
    n1 <<= 18
    n1 |= wordPos
    n1 <<= 4
    n1 |= hashGroup
    n1 <<= 4
    n1 |= wordSpamRank
    n1 <<= 4
    n1 |= diversityRank
    n1 <<= 2
    if isSynonym:
        n1 |= 0x01
    n0 = densityRank
    n0 <<= 1
    n0 <<= 1
    n0 |= 0x01
    n0 <<= 5
    n0 |= multiplier
    n0 <<= 1
    if langId & 0x20:
        n0 |= 0x01
    n0 <<= 2
    n0 <<= 1
    if not isDelKey:
        n0 |= 0x01
    return n2 & M, n1 & M, n0 & 0xFFFF


FIELDS = st.tuples(
    st.integers(0, TERMID_MASK), st.integers(0, DOCID_MASK),
    st.integers(0, MAXWORDPOS), st.integers(0, MAXDENSITYRANK),
    st.integers(0, MAXDIVERSITYRANK), st.integers(0, MAXWORDSPAMRANK),
    st.integers(0, MAXSITERANK), st.integers(0, MAXHASHGROUP),
    st.integers(0, MAXLANGID), st.integers(0, MAXMULTIPLIER),
    st.booleans(), st.booleans())


class TestPosdbKey:
    @given(FIELDS)
    @settings(max_examples=300, deadline=None)
    def test_matches_reference_and_round_trips(self, f):
        (tid, did, pos, den, div, spam, sr, hg, lang, mult, syn, dele) = f
        n2, n1, n0 = make_posdb_key([tid], [did], [pos], [den], [div],
                                    [spam], [sr], [hg], [lang],
                                    multiplier=[mult], is_synonym=[syn],
                                    is_del=[dele])
        rn2, rn1, rn0 = _ref_make_key(tid, did, pos, den, div, spam, sr,
                                      hg, lang, mult, syn, dele)
        assert int(np.asarray(n2).view(np.uint64)[0]) == rn2
        assert int(np.asarray(n1).view(np.uint64)[0]) == rn1
        assert int(np.asarray(n0).astype(np.uint64)[0]) == rn0
        # full unpack
        assert int(pkey_term_id(n2)[0]) == tid
        assert int(pkey_doc_id(n2, n1)[0]) == did
        assert int(pkey_word_pos(n1)[0]) == pos
        assert int(pkey_density(n0)[0]) == den
        assert int(pkey_diversity(n1)[0]) == div
        assert int(pkey_word_spam(n1)[0]) == spam
        assert int(pkey_site_rank(n1)[0]) == sr
        assert int(pkey_hash_group(n1)[0]) == hg
        assert int(pkey_lang_id(n1, n0)[0]) == lang
        assert int(pkey_multiplier(n0)[0]) == mult
        assert bool(pkey_is_synonym(n1)[0]) == syn
        assert bool(pkey_is_del(n0)[0]) == dele

    def test_field_width_gates(self):
        # the reference shuts down on out-of-range fields
        # (Posdb.cpp:323-330); we raise instead of corrupting neighbours
        with pytest.raises(ValueError, match="wordPos"):
            make_posdb_key([1], [1], [MAXWORDPOS + 1], [0], [0], [0],
                           [0], [0], [0])
        with pytest.raises(ValueError, match="siteRank"):
            make_posdb_key([1], [1], [0], [0], [0], [0],
                           [MAXSITERANK + 1], [0], [0])

    def test_scan_order_is_term_then_doc_then_pos(self):
        """Ascending key order == (termId, docId, wordPos) order — the
        bucketBy(term)+sortBy postings layout (sources/writers.py)."""
        rows = [(2, 5, 100), (1, 9, 0), (1, 2, 50), (1, 2, 7), (2, 1, 0)]
        tids = [r[0] for r in rows]
        dids = [r[1] for r in rows]
        poss = [r[2] for r in rows]
        z = [0] * len(rows)
        n2, n1, n0 = make_posdb_key(tids, dids, poss, z, z, z, z, z, z)
        by_key = np.lexsort((np.asarray(n0, dtype=np.int64),
                             np.asarray(n1).view(np.uint64),
                             np.asarray(n2).view(np.uint64)))
        by_cols = sorted(range(len(rows)), key=lambda i: rows[i])
        assert list(by_key) == by_cols

    def test_maverick_lang_bit(self):
        # langId 0x20+ spills its 6th bit into n0 (Posdb.cpp:378-380)
        n2, n1, n0 = make_posdb_key([1], [1], [0], [0], [0], [0], [0],
                                    [0], [0x25])
        assert int(pkey_lang_id(n1, n0)[0]) == 0x25
        assert (int(np.asarray(n0)[0]) >> 3) & 1 == 1
