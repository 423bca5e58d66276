"""Synonyms (Synonyms.cpp), facets/gbfieldmatch (Query.cpp:1760-1825),
and Speller (Speller.cpp) — behavior vectors from the reference plus
Spark-path checks."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.search.facets import (
    facet_counts, facet_int_ranges, search_with_facets)
from open_source_search_engine_spark.search.queryparse import (
    FieldMatch, QueryParseError, parse_query, search_query)
from open_source_search_engine_spark.search.speller import (
    build_unified_dict, can_split_words, did_you_mean, phrase_popularity,
    split_compounds)
from open_source_search_engine_spark.search.synonyms import (
    expand_term, generated_forms, strip_accents, strip_apostrophe_s,
    synonym_term_docs)


# ------------------------------------------------------------- synonyms

class TestSynonymForms:
    def test_accent_strip_requires_non_ascii(self):
        # addStripped's hadUtf8 gate (Synonyms.cpp:509-517)
        assert strip_accents("plain") is None
        assert strip_accents("café") == "cafe"
        assert strip_accents("naïve") == "naive"

    def test_apostrophe_s(self):
        # Synonyms.cpp:398-403 (wlen >= 3)
        assert strip_apostrophe_s("bob's") == "bob"
        assert strip_apostrophe_s("'s") is None
        assert strip_apostrophe_s("cats") is None

    def test_expand_weights(self):
        # base 10, synonyms 9 (Conf::m_synonymWeight 0.9,
        # Parms.cpp:4369-4374)
        forms = expand_term("grey", {"grey": ("gray",)})
        assert forms == [("grey", 10), ("gray", 9)]

    def test_synset_retry_without_apostrophe_s(self):
        # Synonyms.cpp:187-194: 's-stripped synset lookup fallback
        forms = expand_term("bob's", {"bob": ("robert",)})
        assert ("robert", 9) in forms and ("bob", 9) in forms

    def test_generated_only(self):
        assert generated_forms("café") == ["cafe"]
        assert generated_forms("word") == []


class TestSynsetFixture:
    """The dictionary fixture (Wiktionary.cpp analogue):
    fixtures/synsets/synsets.parquet built by scripts/make_synsets.py."""

    def test_loads_and_has_real_size(self):
        from open_source_search_engine_spark.search.synsets import (
            SYNSETS_PATH, load_synsets)
        import os
        assert os.path.exists(SYNSETS_PATH)
        syn = load_synsets()
        # r4 grows the fixture with the wordform closure (VERDICT r3 #7):
        # a few-thousand-entry table, the Wiktionary-blob size pattern
        assert len(syn) >= 900
        assert sum(len(v) for v in syn.values()) >= 8000
        assert all(isinstance(v, tuple) and v for v in syn.values())

    def test_rank_order_preserved(self):
        # hand-authored alts keep the authored emit order (rank col) as
        # the synset PREFIX; morphology wordforms follow after
        from open_source_search_engine_spark.search.synsets import (
            load_synsets)
        syn = load_synsets()
        assert syn["merge"][0] == "join"
        assert syn["fast"][:4] == ("quick", "rapid", "swift", "speedy")

    def test_wordform_closure(self):
        # the Wiktionary pattern: inflected forms ride the lemma's synset
        # and each wordform is a reverse headword back to the lemma
        from open_source_search_engine_spark.search.synsets import (
            load_synsets)
        syn = load_synsets()
        assert {"merges", "merged", "merging"} <= set(syn["merge"])
        assert syn["merging"][0] == "merge"
        assert "join" in syn["merging"]
        # irregulars come from the override table, not coined regulars
        assert "ran" in syn["run"] and "runned" not in syn["run"]
        assert "children" in syn["child"] and "childs" not in syn["child"]
        # expansion coverage through expand_term (the query-side path):
        # an inflected query form reaches the lemma's dictionary synset
        forms = dict(expand_term("merging", syn))
        assert forms.get("merge") == 9 and forms.get("join") == 9
        # pinned expansion width for the q2_posdb_synonym_rank query term
        assert len(expand_term("merge", syn)) == 24

    def test_feeds_expand_term(self):
        # getSynSet per query word (Synonyms.cpp:186) through the fixture
        from open_source_search_engine_spark.search.synsets import (
            load_synsets)
        forms = expand_term("merge", load_synsets())
        assert forms[0] == ("merge", 10)
        assert ("join", 9) in forms

    def test_apostrophe_retry_through_fixture(self):
        # Synonyms.cpp:187-194 's-strip retry hits the fixture headword
        from open_source_search_engine_spark.search.synsets import (
            load_synsets)
        forms = expand_term("merge's", load_synsets())
        assert ("join", 9) in forms


def test_synonym_term_docs_scores_best_form(spark):
    # doc 1 has the base term twice (tf2*10=20) and the synonym thrice
    # (tf3*9=27): the doc scores max(20, 27)=27, never the sum
    postings = spark.createDataFrame(
        [("grey", 1, 2), ("gray", 1, 3), ("gray", 2, 1), ("grey", 3, 1)],
        "term string, doc_id long, tf long")
    got = {r["doc_id"]: r["score_part"]
           for r in synonym_term_docs(
               postings, "grey", {"grey": ("gray",)}).collect()}
    assert got == {1: 27, 2: 9, 3: 10}


def test_search_query_with_synonyms(spark):
    docs = spark.createDataFrame(
        [(1, "fast sort sort"), (2, "fast order order order"),
         (3, "fast scan")],
        "doc_id long, text string")
    from open_source_search_engine_spark.search.postings import (
        build_postings)
    p = build_postings(docs)
    got = {r["doc_id"]: r["score"]
           for r in search_query(p, "fast sort", k=10,
                                 synonyms={"sort": ("order",)}).collect()}
    # doc1: fast 10 + sort 2*10; doc2: fast 10 + order 3*9=27
    assert got == {1: 30, 2: 37}


# -------------------------------------------------------- gbfieldmatch

class TestFieldMatch:
    def test_parse(self):
        ast = parse_query("gbfieldmatch:source:Src1")
        assert ast == FieldMatch("source", "Src1")

    def test_parse_quoted_value(self):
        # Query.cpp:1797-1813 inQuotes scan
        ast = parse_query('gbfieldmatch:tag.uri:"http://xyz.com/poo"')
        assert ast == FieldMatch("tag.uri", "http://xyz.com/poo")

    def test_parse_errors(self):
        with pytest.raises(QueryParseError):
            parse_query("gbfieldmatch:novalue")

    def test_case_sensitive_match(self, spark):
        # "CASE SENSITIVE!!!!" (Query.cpp:1785)
        docs = spark.createDataFrame(
            [(1, "x", "Src1"), (2, "x", "src1")],
            "doc_id long, text string, source string")
        from open_source_search_engine_spark.search.postings import (
            build_postings)
        p = build_postings(docs.select("doc_id", "text"))
        got = [r["doc_id"] for r in
               search_query(p, "gbfieldmatch:source:Src1", k=10,
                            doc_meta=docs.select("doc_id", "source")
                            ).collect()]
        assert got == [1]


# --------------------------------------------------------------- facets

def test_facet_counts(spark):
    docs = spark.createDataFrame(
        [(1,), (2,), (3,)], "doc_id long")
    meta = spark.createDataFrame(
        [(1, "en", "a"), (2, "en", "b"), (3, "de", "a"), (4, "fr", "c")],
        "doc_id long, lang string, source string")
    got = [(r["field"], r["value"], r["count"])
           for r in facet_counts(docs, meta, ["lang", "source"]).collect()]
    assert got == [("lang", "en", 2), ("lang", "de", 1),
                   ("source", "a", 2), ("source", "b", 1)]


def test_facet_int_ranges(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)],
                                 "doc_id long")
    meta = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 15), (4, 25), (5, 99), (6, 150)],
        "doc_id long, n long")
    got = [(r["range_lo"], r["range_hi"], r["count"]) for r in
           facet_int_ranges(docs, meta, "n", [0, 10, 20, 100]).collect()]
    # 150 falls outside every bucket; empty buckets omitted
    assert got == [(0, 10, 1), (10, 20, 2), (20, 100, 2)]


def test_search_with_facets(spark):
    docs = spark.createDataFrame(
        [(1, "data join", "en"), (2, "data scan", "en"),
         (3, "data join join", "de"), (4, "other", "fr")],
        "doc_id long, text string, lang string")
    from open_source_search_engine_spark.search.postings import (
        build_postings)
    p = build_postings(docs.select("doc_id", "text"))
    page, facets = search_with_facets(
        p, "data", docs.select("doc_id", "lang"), ["lang"], k=2)
    assert [r["doc_id"] for r in page.collect()] == [1, 2]
    got = [(r["value"], r["count"]) for r in facets.collect()]
    # facets tally the FULL match set (3 docs), not just the k=2 page
    assert got == [("en", 2), ("de", 1)]


# -------------------------------------------------------------- speller

WORDS = frozenset({"home", "depot", "book", "books", "free", "data",
                   "base", "air", "ports", "adult", "adults", "swim",
                   "a", "i", "law", "firm"})


class TestCanSplitWords:
    def test_simple_split(self):
        assert can_split_words("homedepot", WORDS) == (
            True, False, "home depot")

    def test_porn_short_circuit(self):
        # 'sex' needle at a segment start -> isPorn (Speller.cpp:602-611)
        ok, porn, split = can_split_words("freesex", WORDS)
        assert (ok, porn, split) == (True, True, "free sex")

    def test_blocked_fragment(self):
        # 'wim' is in the exception table ("adultswim = adults wim",
        # Speller.cpp:691-693): the split backtracks to adult+swim
        assert can_split_words("adultswim", WORDS) == (
            True, False, "adult swim")

    def test_last_word_length_gate(self):
        # end word can't be <=2 chars ("freesex ... 'frees ex'",
        # Speller.cpp:619-621): lawfirma can't end in 'a'
        ok, _, _ = can_split_words("lawfirma", WORDS)
        assert not ok

    def test_one_letter_words(self):
        # only 'a' and 'i' can stand alone (Speller.cpp:614-616)
        assert can_split_words("alaw", WORDS) == (True, False, "a law")

    def test_no_split(self):
        assert can_split_words("xyzzy", WORDS) == (False, False, "")


def test_unified_dict_and_popularity(spark):
    docs = spark.createDataFrame(
        [(1, "data base data"), (2, "home depot")],
        "doc_id long, text string")
    d = build_unified_dict(docs)
    pops = {r["word"]: r["pop"] for r in d.collect()}
    assert pops == {"data": 2, "base": 1, "home": 1, "depot": 1}
    terms = spark.createDataFrame([("data",), ("missing",)],
                                  "word string")
    got = {r["word"]: r["pop"]
           for r in phrase_popularity(terms, d).collect()}
    assert got == {"data": 2, "missing": 0}   # absent -> 0 popularity


def test_split_compounds_batch(spark):
    df = spark.createDataFrame(
        [("homedepot",), ("freesex",), ("xyzzy",)], "domain string")
    got = {r["domain"]: (r["can_split"], r["is_porn"], r["split_words"])
           for r in split_compounds(df, "domain", WORDS).collect()}
    assert got["homedepot"] == (True, False, "home depot")
    assert got["freesex"] == (True, True, "free sex")
    assert got["xyzzy"] == (False, False, "")


def test_did_you_mean():
    assert did_you_mean("homedepot data", WORDS) == "home depot data"
    assert did_you_mean("data base", WORDS) is None   # nothing to fix


# ------------------------------------------------- termfreq weighting

def test_term_freq_weights_scale_linear(spark):
    # getTermFreqWeight (PosdbTable.cpp:613-628): df-ratio [0, 0.5] ->
    # weight [0.5, 1.0], clamped; integer-exact x1000
    from open_source_search_engine_spark.search.postings import (
        term_freq_weights)
    p = spark.createDataFrame(
        # rare: 1/10 docs -> 500+100; half: 5/10 -> 1000 (at the knee);
        # ubiquitous: 10/10 -> clamped 1000
        [("rare", 1, 1)] +
        [("half", d, 1) for d in range(5)] +
        [("ubiq", d, 1) for d in range(10)],
        "term string, doc_id long, tf long")
    got = {r["term"]: r["w1000"]
           for r in term_freq_weights(p, 10).collect()}
    assert got == {"rare": 600, "half": 1000, "ubiq": 1000}


def test_search_tfw_damps_rare_term(spark):
    from open_source_search_engine_spark.search.postings import (
        build_postings, search_tfw)
    docs = spark.createDataFrame(
        [(d, "common filler") for d in range(8)] +
        [(8, "common rare"), (9, "common rare rare")],
        "doc_id long, text string")
    p = build_postings(docs)
    got = {r["doc_id"]: r["score"]
           for r in search_tfw(p, ["common", "rare"], 10, k=10).collect()}
    # common: df 10/10 -> w 1000; rare: df 2/10 -> w 700
    assert got == {8: 10 * 1000 + 10 * 700, 9: 10 * 1000 + 20 * 700}


# ------------------------------------------------------ bigram postings

def test_bigram_postings_adjacency(spark):
    from open_source_search_engine_spark.search.postings import (
        build_bigram_postings)
    docs = spark.createDataFrame(
        [(1, "hash join hash join join"), (2, "hash  join"),
         (3, "a a a")],
        "doc_id long, text string")
    p = build_bigram_postings(docs)
    got = {(r["term"], r["doc_id"]): (r["tf"], r["positions"])
           for r in p.collect()}
    assert got[("hash_join", 1)] == (2, [0, 2])
    assert got[("join_join", 1)] == (1, [3])
    # \s+ split collapses runs, so a double space is still adjacent —
    # exactly like the position chain (both see pos 0 and 1)
    assert got[("hash_join", 2)] == (1, [0])
    assert got[("a_a", 3)] == (2, [0, 1])   # overlapping pairs both count


def test_phrase_via_bigrams_equals_position_chain(spark):
    import random
    from open_source_search_engine_spark.search.postings import (
        build_bigram_postings, build_postings)
    rng = random.Random(7)
    vocab = ["hash", "join", "scan", "sort", "data"]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab) for _ in range(30)))
         for i in range(40)],
        "doc_id long, text string")
    p = build_postings(docs)
    bg = build_bigram_postings(docs)
    for q in ['"hash join"', '"data scan" sort', '"join join"']:
        plain = sorted((r["doc_id"], r["score"])
                       for r in search_query(p, q, k=50).collect())
        fast = sorted((r["doc_id"], r["score"])
                      for r in search_query(p, q, k=50,
                                            bigrams=bg).collect())
        assert plain == fast, q
