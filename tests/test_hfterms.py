"""High-frequency term shortcuts (HighFrequencyTermShortcuts.cpp)."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.search.hfterms import (
    apply_shortcuts,
    hf_term_shortcuts,
    search_with_shortcuts,
)
from open_source_search_engine_spark.search.postings import (
    build_postings,
    search,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # "the" in every doc (hf), "zebra" in two (rare); doc 0 has the
    # highest tf for "the"
    rows = [(i, ("the " * (10 - i if i < 9 else 1))
             + ("zebra stripes " if i in (3, 7) else "")
             + f"filler{i} word{i} here{i}") for i in range(12)]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def postings(corpus):
    return build_postings(corpus).cache()


class TestHfTermShortcuts:
    def test_only_hf_terms_kept(self, postings):
        sc = hf_term_shortcuts(postings, min_df=10, top_n=4)
        assert set(r.term for r in sc.select("term").distinct()
                   .collect()) == {"the"}

    def test_top_n_by_tf_then_docid(self, postings):
        sc = hf_term_shortcuts(postings, min_df=10, top_n=3).collect()
        assert len(sc) == 3
        # doc 0 has tf 10, doc 1 tf 9, doc 2 tf 8
        assert sorted(r.doc_id for r in sc) == [0, 1, 2]

    def test_low_df_untouched(self, postings):
        sc = hf_term_shortcuts(postings, min_df=10, top_n=3)
        out = apply_shortcuts(postings, sc, ["zebra"])
        full = postings.filter(F.col("term") == "zebra")
        assert sorted(r.doc_id for r in out.collect()) == \
            sorted(r.doc_id for r in full.collect())

    def test_substitution_truncates_hf(self, postings):
        sc = hf_term_shortcuts(postings, min_df=10, top_n=3)
        out = apply_shortcuts(postings, sc, ["the"])
        assert out.count() == 3

    def test_search_with_shortcuts_restricts_candidates(self, postings):
        sc = hf_term_shortcuts(postings, min_df=10, top_n=3)
        hits = search_with_shortcuts(postings, sc, ["the"], k=20).collect()
        assert sorted(r.doc_id for r in hits) == [0, 1, 2]
        # and exact-search equality for non-hf queries
        a = search_with_shortcuts(postings, sc, ["zebra", "stripes"],
                                  k=5).collect()
        b = search(postings, ["zebra", "stripes"], k=5).collect()
        assert [(r.doc_id, r.score) for r in a] == \
            [(r.doc_id, r.score) for r in b]

    def test_shortcut_join_is_broadcast(self, postings):
        sc = hf_term_shortcuts(postings, min_df=10, top_n=3)
        plan = apply_shortcuts(postings, sc, ["the", "zebra"])._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
