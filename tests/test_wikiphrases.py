"""The encyclopedia-title phrase fixture (Wiki.cpp analogue).

Pins the committed ``fixtures/wikititles/wikititles.parquet`` (built by
``scripts/make_wikititles.py``), the ``load_wiki_titles`` loader, the
``wiki_phrase_ids`` grouping driven by the REAL fixture (not an inline
toy set), and the end-to-end ranking effect through
``parsed_rank_search(wiki_titles=...)`` — the reference's
``Wiki::getNumWordsInWikiPhrase`` (Wiki.cpp:175) feeding
``m_wikiPhraseIds`` in PosdbTable.
"""
from __future__ import annotations

import pytest

from open_source_search_engine_spark.search.posdbrank import (
    build_posdb_index, parsed_rank_search, score_doc, wiki_phrase_ids)
from open_source_search_engine_spark.search.wikiphrases import (
    WIKITITLES_PATH, load_wiki_titles)


class TestFixture:
    def test_loads_and_shape(self):
        titles = load_wiki_titles()
        # r5: a few thousand entries (programmatic template tail),
        # approaching realistic probe hit/miss behavior
        assert len(titles) >= 4000
        for t in titles:
            assert isinstance(t, tuple) and 2 <= len(t) <= 12
            for w in t:
                assert w and w == w.lower() and " " not in w
        # realistic word-length mix: 2..5-word titles all present
        lens = {len(t) for t in titles}
        assert {2, 3, 4, 5} <= lens

    def test_phrase_coverage_counts(self):
        """Pinned coverage over fixed probe queries (VERDICT r4 #8):
        how many words land inside a wiki phrase, per query."""
        titles = load_wiki_titles()
        probes = {
            # corpus title + miss word
            ("hash", "table", "scan"): 2,
            # 3-word template title ("history of france")
            ("history", "of", "france", "today"): 3,
            # suffix template ("japan national football team")
            ("japan", "national", "football", "team"): 4,
            # scientist x concept ("euler theorem")
            ("the", "euler", "theorem", "states"): 2,
            # two separate phrases in one query
            ("merge", "sort", "beats", "binary", "search"): 4,
            # all-miss query
            ("zebra", "quux", "flarp"): 0,
        }
        for words, want in probes.items():
            ids = wiki_phrase_ids(list(words), titles)
            assert sum(1 for i in ids if i > 0) == want, (words, ids)

    def test_corpus_vocabulary_titles_present(self):
        titles = load_wiki_titles()
        assert ("hash", "table") in titles
        assert ("merge", "sort") in titles
        assert ("sort", "merge", "join") in titles

    def test_parquet_matches_loader(self):
        import pyarrow.parquet as pq
        table = pq.read_table(WIKITITLES_PATH)
        assert set(table.column_names) == {"title", "n_words"}
        raw = table["title"].to_pylist()
        assert len(raw) == len(set(raw))
        assert frozenset(tuple(t.split(" ")) for t in raw) \
            == load_wiki_titles()
        for t, n in zip(raw, table["n_words"].to_pylist()):
            assert len(t.split(" ")) == n


class TestGrouping:
    def test_fixture_driven_ids(self):
        titles = load_wiki_titles()
        # 'hash table' is a title, 'scan' is not in any run
        assert wiki_phrase_ids(["hash", "table", "scan"], titles) \
            == [1, 1, 0]
        # greedy longest run: the 3-word title beats its 2-word prefix
        assert wiki_phrase_ids(["sort", "merge", "join"], titles) \
            == [1, 1, 1]
        # two separate phrases number independently
        assert wiki_phrase_ids(
            ["hash", "table", "versus", "merge", "sort"], titles) \
            == [1, 1, 0, 2, 2]

    def test_miss_is_all_zero(self):
        titles = load_wiki_titles()
        assert wiki_phrase_ids(["zebra", "quux", "flarp"], titles) \
            == [0, 0, 0]

    def test_wiki_ids_change_kernel_score(self):
        # same postings, wiki grouping on vs off -> different pair
        # scoring (the qdist retarget), kernel-level determinism
        from open_source_search_engine_spark.search.posdbrank import (
            HG_BODY, TermList)
        import numpy as np

        def tl(positions):
            n = len(positions)
            return TermList(np.array(positions, dtype=np.int64),
                            np.full(n, HG_BODY, dtype=np.int64),
                            np.full(n, 10, dtype=np.int64),
                            np.full(n, 1, dtype=np.int64),
                            np.zeros(n, dtype=np.int64))

        lists = [tl([10]), tl([14])]
        plain = score_doc(lists, [1.0, 1.0], qpos=[0, 2])
        wiki = score_doc(lists, [1.0, 1.0], qpos=[0, 2],
                         wiki_ids=[1, 1])
        assert plain > 0 and wiki > 0 and plain != wiki


@pytest.mark.usefixtures("spark")
class TestEndToEnd:
    DOCS = [
        # doc 1: 'hash table' adjacent (query spacing) + 'scan'
        (1, "<html><title>intro</title><body><p>the hash table scan "
            "works well here.</p></body></html>", "en", 0),
        # doc 2: 'hash' and 'table' far apart + 'scan'
        (2, "<html><title>intro</title><body><p>hash the rows into a "
            "wide sorted list and scan the table.</p></body></html>",
         "en", 0),
    ]

    def _index(self, spark):
        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, content string, lang string, "
                       "site_rank int")
        return docs, build_posdb_index(docs)

    def test_fixture_routed_rank(self, spark):
        docs, idx = self._index(spark)
        with_wiki = {r["doc_id"]: r["score"] for r in parsed_rank_search(
            idx, docs, "hash table scan", num_docs=2,
            wiki_titles=load_wiki_titles()).collect()}
        without = {r["doc_id"]: r["score"] for r in parsed_rank_search(
            idx, docs, "hash table scan", num_docs=2).collect()}
        # both docs still AND-match either way
        assert set(with_wiki) == set(without) == {1, 2}
        # the wiki grouping changes the scoring of the phrase-bearing doc
        assert with_wiki[1] != without[1]

    def test_no_fixture_title_no_effect(self, spark):
        docs, idx = self._index(spark)
        # query words form no fixture title -> identical scores
        a = {r["doc_id"]: r["score"] for r in parsed_rank_search(
            idx, docs, "table scan", num_docs=2,
            wiki_titles=load_wiki_titles()).collect()}
        b = {r["doc_id"]: r["score"] for r in parsed_rank_search(
            idx, docs, "table scan", num_docs=2).collect()}
        assert a == b
