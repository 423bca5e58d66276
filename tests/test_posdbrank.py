"""Pin the full Posdb ranking pipeline: index-time rank vectors
(wordpos / density / diversity / wordspam) and the min-term-pair
sliding-window scorer (PosdbTable.cpp).

Expected values are hand-computed from the reference formulas inline —
NOT by calling module helpers — so a formula regression can't hide.
"""

import math

import numpy as np
import pytest

from open_source_search_engine_spark.search.posdbrank import (
    DENSITY_W, FIXED_DISTANCE, HG_BODY, HG_HEADING, HG_INLINKTEXT,
    HG_TITLE, MAXDENSITYRANK, SAME_LANG_WEIGHT, TermList,
    _pair_nonbody_max, _single_term_score, build_posdb_index,
    density_ranks, diversity_ranks, lex_html, parse_doc_postings,
    posdb_rank_search, score_doc, term_freq_weight, word_spam_ranks,
)

HTML = ("<html><head><title>alpha beta</title></head>"
        "<body><p>gamma delta epsilon. zeta eta theta iota kappa.</p>"
        "</body></html>")


class TestLexer:
    def test_regions(self):
        words = lex_html(HTML)
        by_term = {w.term: w for w in words}
        assert by_term["alpha"].hg == HG_TITLE
        assert by_term["gamma"].hg == HG_BODY

    def test_adjacent_words_two_apart(self):
        # word=1 unit + space=1 unit (getWordPosVec, XmlDoc.cpp:21133)
        words = lex_html(HTML)
        pos = {w.term: w.pos for w in words}
        assert pos["delta"] - pos["gamma"] == 2
        assert pos["beta"] - pos["alpha"] == 2

    def test_sentence_gap_at_least_sent_units(self):
        words = lex_html(HTML)
        pos = {w.term: w.pos for w in words}
        sent = {w.term: w.sent for w in words}
        assert sent["zeta"] == sent["epsilon"] + 1
        assert pos["zeta"] - pos["epsilon"] >= 30

    def test_first_word_carries_leading_tag_distance(self):
        # lastsx starts NULL: the first sentence also gets the +30
        # (XmlDoc.cpp:21201)
        words = lex_html("<p>one two</p>")
        assert words[0].pos >= 30

    def test_script_and_style_skipped(self):
        words = lex_html("<p>keep</p><script>var skipme = 1;</script>")
        terms = [w.term for w in words]
        assert "keep" in terms and "skipme" not in terms and "var" not in terms

    def test_heading_region(self):
        words = lex_html("<h1>headline</h1><p>body text</p>")
        by_term = {w.term: w for w in words}
        assert by_term["headline"].hg == HG_HEADING
        assert by_term["body"].hg == HG_BODY


class TestDensity:
    def test_body_sentence_density(self):
        # 5-word sentence: dr = 31 - (5-1) = 27 (getDensityRanks)
        words = lex_html(HTML)
        dens = density_ranks(words)
        d = {w.term: dens[i] for i, w in enumerate(words)}
        assert d["zeta"] == MAXDENSITYRANK - 4 == 27
        assert d["gamma"] == MAXDENSITYRANK - 2 == 29
        # 2-word title: 31 - 1 = 30
        assert d["alpha"] == 30


class TestDiversity:
    def test_unique_word_gets_max_rank(self):
        # count 1 -> s_wtab=1.0, phrcountMax<=6 -> mod .5, slide 90%:
        # .9*.5+.1 = .55 -> rank = int(.55*15/.55) = 14 (the truncation
        # is in the reference too: (char)((ww*15)/.55), XmlDoc.cpp:21365)
        words = lex_html("<p>one two three</p>")
        divr = diversity_ranks(words)
        assert list(divr) == [14, 14, 14]

    def test_repeated_phrase_word_demoted(self):
        # "new" occurs 3x always starting phrase ("new","mexico") (x3);
        # phrase ending at later "new"s is ("mexico","new") (x2).
        # wrdcount=3, phrcountMax=3 -> s_wtab[3][3]: ratio 1 -> capped
        # .60 (i<=4) -> ww=.4; mod .5 (phrcountMax<=6) -> .2; slide:
        # .9*.2+.1=.28 -> rank=int(.28*15/.55)=7
        words = lex_html("<p>new mexico new mexico new mexico</p>")
        divr = diversity_ranks(words)
        d = [divr[i] for i, w in enumerate(words) if w.term == "new"]
        assert d == [7, 7, 7]


class TestWordSpam:
    def test_natural_text_unspammed(self):
        words = lex_html(HTML)
        spam = word_spam_ranks(words)
        assert (spam == 15).all()

    def test_heavy_repeat_spammed(self):
        # "buy" is 8 of 16 words = 50% >= 20% threshold (setSpam quick
        # path, XmlDoc.cpp:21070): every occurrence spammed except
        # profile[0] (the LAST in doc order — profiles are reverse).
        body = " ".join("buy w%d" % i for i in range(8))
        words = lex_html("<p>%s</p>" % body)
        spam = word_spam_ranks(words)
        ranks = [spam[i] for i, w in enumerate(words) if w.term == "buy"]
        assert ranks[:-1] == [0] * 7      # 15*(100-100)/100
        assert ranks[-1] == 15            # survivor
        filler = [spam[i] for i, w in enumerate(words) if w.term != "buy"]
        assert filler == [15] * 8


def _mk(pos, hg=None, dens=None, spam=None, syn=None):
    n = len(pos)
    return TermList(pos,
                    hg if hg is not None else [HG_BODY] * n,
                    dens if dens is not None else [MAXDENSITYRANK] * n,
                    [15] * n,
                    spam if spam is not None else [15] * n,
                    syn)


class TestSingleTermScore:
    def test_body_occurrence_exact(self):
        # 100 * div_w^2(1.0) * hg_w^2(1.0) * dens_w^2(1.0) * spam_w^2(1.0)
        L = _mk([100])
        s, bp = _single_term_score(L, 0.5)
        assert s == pytest.approx(100.0 * 0.25)
        assert bp is None   # body occurrence is not a sub-out candidate

    def test_title_occurrence_exact(self):
        L = _mk([10], hg=[HG_TITLE])
        s, bp = _single_term_score(L, 1.0)
        assert s == pytest.approx(100.0 * 64.0)
        assert bp == 0

    def test_one_score_per_mapped_hashgroup(self):
        # two body occurrences: only the best counts (dup mapped-group
        # rule, PosdbTable.cpp:936-949); a title occurrence adds
        L = _mk([10, 12, 50], hg=[HG_BODY, HG_BODY, HG_TITLE],
                dens=[31, 20, 31])
        s, _ = _single_term_score(L, 1.0)
        expected = 100.0 + 100.0 * 64.0      # best body + title
        assert s == pytest.approx(expected)

    def test_inlinktext_repeats_allowed(self):
        # linker weight sqrt(1+siterank), inlink text exempt from the
        # dup rule: two links both count
        L = _mk([10, 500], hg=[HG_INLINKTEXT] * 2, spam=[3, 8])
        s, _ = _single_term_score(L, 1.0)
        w16 = 16.0 * 16.0
        expected = 100.0 * w16 * 4.0 + 100.0 * w16 * 9.0
        assert s == pytest.approx(expected)


class TestPairScoring:
    def test_adjacent_pair_full_score(self):
        # two terms 2 apart in body: dist 2-qdist(2)=0 -> /(0+1) -> 100
        # each single: 100; minScore=100; siterank 0; lang match x20
        lists = [_mk([100]), _mk([102])]
        s = score_doc(lists, [1.0, 1.0], qlang="en", doc_lang="en")
        assert s == pytest.approx(100.0 * SAME_LANG_WEIGHT)

    def test_distance_decay(self):
        # 12 units apart: dist 12-2=10 -> 100/11
        lists = [_mk([100]), _mk([112])]
        s = score_doc(lists, [1.0, 1.0])
        assert s == pytest.approx(100.0 / 11.0 * SAME_LANG_WEIGHT)

    def test_out_of_order_penalty(self):
        # reversed order, 12 apart: dist = 12-1 = 11 -> 100/12
        lists = [_mk([112]), _mk([100])]
        s = score_doc(lists, [1.0, 1.0])
        assert s == pytest.approx(100.0 / 12.0 * SAME_LANG_WEIGHT)

    def test_min_pair_decides(self):
        # terms a,b adjacent; c far away (1000 units): min pair is
        # (a,c)/(b,c) with dist 898 -> tiny; the worst pair is the score
        lists = [_mk([100]), _mk([102]), _mk([1000])]
        s = score_doc(lists, [1.0] * 3)
        worst = 100.0 / (1000 - 100 - 2 + 1)
        assert s == pytest.approx(worst * SAME_LANG_WEIGHT)

    def test_title_subout_fixed_distance(self):
        # term A only in title (pos 5), term B in body (pos 500):
        # window pair = sub-out at FIXED_DISTANCE: hg 8x * 100 / 401
        # Zak pair: mhg differ & dist>=50 -> FIXED(400): -qdist -> 398
        # -> 8*100/399; singles: A=6400, B=100 -> minSingle=100
        lists = [_mk([5], hg=[HG_TITLE]), _mk([500])]
        s = score_doc(lists, [1.0, 1.0])
        zak = 100.0 * 8.0 / 399.0
        assert s == pytest.approx(zak * SAME_LANG_WEIGHT)

    def test_sliding_window_picks_best_cluster(self):
        # term A at 100 and 1000; term B at 996. Window algo should
        # score A@1000 with B@996 (out of order, dist 4-1=3 -> 100/4)
        # NOT A@100 (dist 894)
        lists = [_mk([100, 1000]), _mk([996])]
        s = score_doc(lists, [1.0, 1.0])
        assert s == pytest.approx(100.0 / 4.0 * SAME_LANG_WEIGHT)

    def test_site_rank_multiplier(self):
        lists = [_mk([100]), _mk([102])]
        s0 = score_doc(lists, [1.0, 1.0], site_rank=0)
        s9 = score_doc(lists, [1.0, 1.0], site_rank=9)
        assert s9 / s0 == pytest.approx(9 * 0.33333333 + 1.0)

    def test_lang_mismatch_no_boost(self):
        lists = [_mk([100]), _mk([102])]
        s = score_doc(lists, [1.0, 1.0], qlang="en", doc_lang="de")
        assert s == pytest.approx(100.0)

    def test_freq_weights_square_on_singles(self):
        lists = [_mk([100])]
        s_half = score_doc(lists, [0.5])
        s_full = score_doc(lists, [1.0])
        assert s_full / s_half == pytest.approx(4.0)

    def test_quoted_phrase_gate(self):
        # quoted: positions must reflect query spacing (qdist=2)
        ok = [_mk([100]), _mk([102])]
        bad = [_mk([100]), _mk([130])]
        assert score_doc(ok, [1.0, 1.0], quoted=True) > 0.0
        assert score_doc(bad, [1.0, 1.0], quoted=True) == 0.0

    def test_nonbody_pair_zipper(self):
        # both in title 2 apart: dist 2-2=0 -> 64*100
        a = _mk([10], hg=[HG_TITLE])
        b = _mk([12], hg=[HG_TITLE])
        assert _pair_nonbody_max(a, b, 2) == pytest.approx(6400.0)
        # body occurrences are not compatible here
        assert _pair_nonbody_max(_mk([10]), _mk([12]), 2) == -1.0


class TestTermFreqWeight:
    def test_scale(self):
        assert term_freq_weight(0, 100) == pytest.approx(0.5)
        assert term_freq_weight(50, 100) == pytest.approx(1.0)
        assert term_freq_weight(25, 100) == pytest.approx(0.75)


@pytest.mark.usefixtures("spark")
class TestSparkPlumbing:
    DOCS = [
        # doc 1: terms adjacent in body AND in title -> best
        (1, "<html><title>spark query</title><body><p>the spark query "
            "engine runs fast.</p></body></html>", "en", 3),
        # doc 2: terms far apart
        (2, "<html><title>other page</title><body><p>spark is here. "
            "%s and the query comes late.</p></body></html>"
            % " ".join("w%d" % i for i in range(40)), "en", 0),
        # doc 3: only one term
        (3, "<html><title>no match</title><body><p>spark alone "
            "here.</p></body></html>", "en", 0),
    ]

    def _index(self, spark):
        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, content string, lang string, "
                       "site_rank int")
        return docs, build_posdb_index(docs)

    def test_index_schema_and_ranks(self, spark):
        _, idx = self._index(spark)
        rows = idx.filter("term = 'spark'").collect()
        assert {r["doc_id"] for r in rows} == {1, 2, 3}
        for r in rows:
            assert 1 <= r["density"] <= 31
            assert 0 <= r["wordspam"] <= 15

    def test_search_matches_kernel(self, spark):
        docs, idx = self._index(spark)
        out = posdb_rank_search(idx, docs, ["spark", "query"],
                                num_docs=3, k=10, qlang="en").collect()
        assert [r["doc_id"] for r in out] == [1, 2]
        assert out[0]["score"] > out[1]["score"]
        # cross-check the Spark result against a direct kernel call
        pdf = (idx.filter("doc_id = 1 and term in ('spark','query')")
               .toPandas())
        lists = []
        for t in ("spark", "query"):
            g = pdf[pdf["term"] == t]
            lists.append(TermList(g["pos"].values, g["hashgroup"].values,
                                  g["density"].values,
                                  g["diversity"].values,
                                  g["wordspam"].values))
        fw = [term_freq_weight(3, 3), term_freq_weight(2, 3)]
        expect = score_doc(lists, fw, site_rank=3, doc_lang="en",
                           qlang="en")
        assert out[0]["score"] == pytest.approx(expect)

    def test_and_semantics(self, spark):
        docs, idx = self._index(spark)
        out = posdb_rank_search(idx, docs, ["spark", "query", "engine"],
                                num_docs=3, k=10).collect()
        assert [r["doc_id"] for r in out] == [1]


@pytest.mark.usefixtures("spark")
class TestParsedRank:
    DOCS = [
        # doc 1: exact phrase "fast spark" plus "query"
        (1, "<html><title>intro</title><body><p>the fast spark query "
            "engine.</p></body></html>", "en", 0),
        # doc 2: words present but phrase broken
        (2, "<html><title>intro</title><body><p>spark is fast and the "
            "query works.</p></body></html>", "en", 0),
    ]

    def _index(self, spark):
        from open_source_search_engine_spark.search.posdbrank import (
            build_posdb_index)
        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, content string, lang string, "
                       "site_rank int")
        return docs, build_posdb_index(docs)

    def test_phrase_query_gates(self, spark):
        from open_source_search_engine_spark.search.posdbrank import (
            parsed_rank_search)
        docs, idx = self._index(spark)
        out = parsed_rank_search(idx, docs, '"fast spark" query',
                                 num_docs=2).collect()
        # doc 2 has 'fast' and 'spark' out of phrase order -> filtered
        assert [r["doc_id"] for r in out] == [1]

    def test_plain_and_query(self, spark):
        from open_source_search_engine_spark.search.posdbrank import (
            parsed_rank_search)
        docs, idx = self._index(spark)
        out = parsed_rank_search(idx, docs, "spark query",
                                 num_docs=2).collect()
        assert {r["doc_id"] for r in out} == {1, 2}

    def test_boolean_rejected(self, spark):
        from open_source_search_engine_spark.search.posdbrank import (
            parsed_rank_search)
        docs, idx = self._index(spark)
        with pytest.raises(ValueError):
            parsed_rank_search(idx, docs, "spark OR flink", num_docs=2)


@pytest.mark.usefixtures("spark")
class TestInlinkText:
    def test_anchor_postings_and_linker_weight(self, spark):
        from open_source_search_engine_spark.search.posdbrank import (
            HG_INLINKTEXT, build_posdb_index, posdb_rank_search)
        docs = spark.createDataFrame(
            [(1, "<html><body><p>page about nothing.</p></body></html>",
              "en", 0),
             (2, "<html><body><p>another page entirely here.</p></body>"
                 "</html>", "en", 0)],
            "doc_id long, content string, lang string, site_rank int")
        links = spark.createDataFrame(
            [(1, "best spark engine", 8),
             (1, "spark engine docs", 3)],
            "dst_doc_id long, anchor_text string, src_site_rank int")
        idx = build_posdb_index(docs, links=links)
        rows = idx.filter("hashgroup = %d" % HG_INLINKTEXT).collect()
        assert {r["term"] for r in rows} >= {"best", "spark", "engine"}
        # linker site rank stored in the spam bits (Posdb.h:37-38)
        assert {r["wordspam"] for r in rows} == {8, 3}
        # the two link texts occupy disjoint position spaces >50 apart
        spark_pos = sorted(r["pos"] for r in rows if r["term"] == "spark")
        assert spark_pos[1] - spark_pos[0] > 50
        # anchor-only terms are searchable and rank doc 1
        out = posdb_rank_search(idx, docs, ["spark", "engine"],
                                num_docs=2).collect()
        assert [r["doc_id"] for r in out] == [1]
        assert out[0]["score"] > 0


class TestWikiPhrases:
    def test_id_assignment_greedy_longest(self):
        from open_source_search_engine_spark.search.posdbrank import (
            wiki_phrase_ids)
        titles = {("new", "york"), ("new", "york", "city"),
                  ("lock", "pick")}
        ids = wiki_phrase_ids(["new", "york", "city", "hall"], titles)
        assert ids == [1, 1, 1, 0]       # longest match wins
        ids = wiki_phrase_ids(["a", "lock", "pick", "set"], titles)
        assert ids == [0, 1, 1, 0]
        ids = wiki_phrase_ids(["new", "york", "lock", "pick"], titles)
        assert ids == [1, 1, 2, 2]       # two distinct groups

    def test_wiki_pair_targets_query_spacing(self):
        # in a wiki phrase the pair aims for qdist = qpos diff and the
        # score takes the 0.10 WIKI_WEIGHT haircut
        # (PosdbTable.cpp:699-712)
        lists = [_mk([100]), _mk([102])]
        plain = score_doc(lists, [1.0, 1.0])
        wiki = score_doc(lists, [1.0, 1.0], wiki_ids=[1, 1])
        # same positions, qdist 2 either way: wiki = plain * 0.10
        assert wiki == pytest.approx(plain * 0.10)
        # wiki qdist targets query spacing: terms 4 apart in query,
        # 4 apart in body -> dist 0 (perfect), vs plain qdist 2 -> 2
        lists2 = [_mk([100]), _mk([104])]
        wiki2 = score_doc(lists2, [1.0, 1.0], qpos=[0, 4],
                          wiki_ids=[1, 1])
        plain2 = score_doc(lists2, [1.0, 1.0], qpos=[0, 4])
        assert wiki2 == pytest.approx(100.0 * 0.10 * SAME_LANG_WEIGHT)
        assert plain2 == pytest.approx(100.0 / 3.0 * SAME_LANG_WEIGHT)


@pytest.mark.usefixtures("spark")
class TestSynonymMerge:
    def test_syn_sublist_merge(self, spark):
        from open_source_search_engine_spark.search.posdbrank import (
            build_posdb_index, posdb_rank_search)
        docs = spark.createDataFrame(
            [(1, "<html><body><p>the automobile engine runs.</p></body>"
                 "</html>", "en", 0),
             (2, "<html><body><p>the car engine runs.</p></body></html>",
              "en", 0)],
            "doc_id long, content string, lang string, site_rank int")
        idx = build_posdb_index(docs)
        # without synonyms only doc 2 matches "car engine"
        base = posdb_rank_search(idx, docs, ["car", "engine"],
                                 num_docs=2).collect()
        assert [r["doc_id"] for r in base] == [2]
        # with automobile as a synonym of car, doc 1 matches through
        # the merged sublist and scores LOWER (0.9 syn weight twice:
        # occurrence score and pair side)
        out = posdb_rank_search(
            idx, docs, ["car", "engine"], num_docs=2,
            synonyms={"car": ["automobile"]}).collect()
        assert [r["doc_id"] for r in out] == [2, 1]
        assert out[0]["score"] > out[1]["score"]


@pytest.mark.usefixtures("spark")
class TestCappedSearch:
    def test_capped_equals_full(self, spark):
        from open_source_search_engine_spark.search.posdbrank import (
            build_posdb_index, posdb_rank_search,
            posdb_rank_search_capped)
        rows = []
        words = ["spark", "query", "engine", "fast", "slow", "data",
                 "table", "row"]
        for d in range(40):
            body = " ".join(words[(d + i) % len(words)]
                            for i in range(30))
            rows.append((d, "<html><title>%s</title><body><p>%s.</p>"
                            "</body></html>"
                         % (words[d % len(words)], body), "en", d % 10))
        docs = spark.createDataFrame(
            rows, "doc_id long, content string, lang string, "
                  "site_rank int")
        idx = build_posdb_index(docs).cache()
        full = posdb_rank_search(idx, docs, ["spark", "query"],
                                 num_docs=40, k=10,
                                 qlang="en").collect()
        for cap in (3, 10, 100):
            capped = posdb_rank_search_capped(
                idx, docs, ["spark", "query"], num_docs=40, k=10,
                candidate_cap=cap, qlang="en").collect()
            assert ([(r["doc_id"], round(r["score"], 9))
                     for r in capped]
                    == [(r["doc_id"], round(r["score"], 9))
                        for r in full]), f"cap={cap}"

    def test_capped_equals_full_feature_surface(self, spark):
        """r5: the catalog serve keys route through the capped plan, so
        equality must hold for every feature configuration they use —
        synonym sublists (group-keyed bound), quoted phrases (gates only
        reduce), and wiki-phrase ids (bound inflated by the max pair
        boost)."""
        from open_source_search_engine_spark.search.posdbrank import (
            build_posdb_index, posdb_rank_search, posdb_rank_search_capped)
        rows = []
        words = ["spark", "query", "engine", "fast", "data",
                 "table", "scan", "hash", "automobile", "car"]
        for d in range(40):
            body = " ".join(words[(d + i) % len(words)]
                            for i in range(30))
            rows.append((d, "<html><title>%s</title><body><p>%s.</p>"
                            "</body></html>"
                         % (words[d % len(words)], body), "en", d % 10))
        docs = spark.createDataFrame(
            rows, "doc_id long, content string, lang string, "
                  "site_rank int")
        idx = build_posdb_index(docs).cache()

        def eq(kwargs, label):
            full = posdb_rank_search(
                idx, docs, kwargs.pop("_terms"), num_docs=40, k=10,
                qlang="en", **kwargs).collect()
            for cap in (3, 10, 100):
                capped = posdb_rank_search_capped(
                    idx, docs, label[1], num_docs=40, k=10,
                    candidate_cap=cap, qlang="en", **kwargs).collect()
                assert ([(r["doc_id"], round(r["score"], 9))
                         for r in capped]
                        == [(r["doc_id"], round(r["score"], 9))
                            for r in full]), f"{label[0]} cap={cap}"

        # synonym sublist: car ~ automobile
        eq({"_terms": ["car", "engine"],
            "synonyms": {"car": ["automobile"]}},
           ("synonyms", ["car", "engine"]))
        # quoted phrase at query spacing
        eq({"_terms": ["data", "table"],
            "quoted_ids": [0, 0], "qpos": [0, 2]},
           ("quoted", ["data", "table"]))
        # wiki phrase: 'hash table' as one unit, 'scan' independent
        eq({"_terms": ["hash", "table", "scan"],
            "qpos": [0, 2, 4], "wiki_ids": [0, 0, -1]},
           ("wiki", ["hash", "table", "scan"]))
