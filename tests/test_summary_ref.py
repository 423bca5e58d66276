"""Reference-faithful summary engine (Summary.cpp) — kernel + Spark tests.

Pins the search/summary_ref.py port of the reference's summary ladder:
setSummaryFromTags (Summary.cpp:84-141) > setSummary greedy best-window
loop (:142-595, getBestWindow :596-1013) > getDefaultSummary
(:1015-1119), with Bits::setForSummary word bits (Bits.cpp:196-393).
"""

import pytest

from open_source_search_engine_spark.search.summary_ref import (
    D_IN_BOLDORITALICS,
    D_IN_LIST,
    D_IN_PARENS,
    D_IN_QUOTES,
    D_IN_TITLE,
    D_IS_STRONG_CONNECTOR,
    D_STARTS_FRAG,
    D_STARTS_SENTENCE,
    default_summary,
    filter_window,
    make_summary,
    summary_from_tags,
    summarize_ref,
    tokenize,
)


# --------------------------------------------------------------- tokenize
class TestTokenize:
    def test_tags_words_punct_split(self):
        w = tokenize("<p>Hello, world</p>")
        assert w.toks == ["<p>", "Hello", ", ", "world", "</p>"]
        assert w.tags == ["p", None, None, None, "p"]
        assert w.backs == [False, False, False, False, True]
        assert w.wids == [False, True, False, True, False]

    def test_offsets_are_raw_char_positions(self):
        s = "ab <b>cd</b>"
        w = tokenize(s)
        for t, st in zip(w.toks, w.starts):
            assert s[st:st + len(t)] == t

    def test_bad_sections_marked(self):
        w = tokenize("x <script>var a=1;</script> y")
        i = w.toks.index("var")
        j = w.toks.index("y")
        assert w.bad[i] and not w.bad[j]

    def test_sentence_and_frag_starts(self):
        # Bits.cpp: ". " ends a sentence; breaking tags restart one.
        w = tokenize("One two. Three<br>Four")
        bits = {w.toks[i]: w.bits[i] for i in range(len(w.toks))}
        assert bits["One"] & D_STARTS_SENTENCE
        assert not (bits["two"] & D_STARTS_SENTENCE)
        assert bits["Three"] & D_STARTS_SENTENCE
        assert bits["Four"] & D_STARTS_SENTENCE   # <br> is breaking

    def test_single_char_initial_does_not_end_sentence(self):
        # "J. Smith" — the period after a 1-char word is an initial.
        w = tokenize("By J. Smith works")
        i = w.toks.index("Smith")
        assert not (w.bits[i] & D_STARTS_SENTENCE)

    def test_accumulation_flags(self):
        w = tokenize("<b>bold</b> plain (par) <li>item</li>")
        get = lambda t: w.bits[w.toks.index(t)]
        assert get("bold") & D_IN_BOLDORITALICS
        assert not (get("plain") & D_IN_BOLDORITALICS)
        assert get("par") & D_IN_PARENS
        assert get("item") & D_IN_LIST

    def test_strong_connectors(self):
        w = tokenize("mother-in-law")
        dash = [i for i, t in enumerate(w.toks) if t == "-"]
        assert dash and all(w.bits[i] & D_IS_STRONG_CONNECTOR for i in dash)

    def test_title_flag(self):
        w = tokenize("<title>My Page</title> body")
        assert w.bits[w.toks.index("My")] & D_IN_TITLE
        assert not (w.bits[w.toks.index("body")] & D_IN_TITLE)


# ----------------------------------------------------------- filter_window
class TestFilterWindow:
    def test_strips_tags_decodes_entities_collapses_ws(self):
        w = tokenize("a  <b>&amp;</b>   b")
        assert filter_window(w, 0, len(w.toks)) == "a & b"

    def test_drops_bad_sections(self):
        w = tokenize("x <script>junk</script> y")
        assert filter_window(w, 0, len(w.toks)) == "x y"


# ------------------------------------------------------- summary_from_tags
class TestSummaryFromTags:
    DESC = ("A moderately long meta description that easily clears the "
            "one-third minimum length gate of the reference engine.")

    def test_meta_description_used(self):
        html = f'<meta name="description" content="{self.DESC}"><p>body</p>'
        assert summary_from_tags(html, "") == self.DESC

    def test_priority_itemprop_beats_og_beats_meta(self):
        a = "Itemprop description text long enough to pass the length gate."
        b = "OG description text that is long enough to pass the gate too."
        html = (f'<meta property="og:description" content="{b}">'
                f'<div itemprop="description" content="{a}"></div>')
        assert summary_from_tags(html, "") == a

    def test_length_gate_rejects_short(self):
        html = '<meta name="description" content="too short">'
        assert summary_from_tags(html, "") is None

    def test_title_substring_rejected(self):
        # verifySummary (Summary.cpp:54-77): summary inside title → reject
        html = f'<meta name="description" content="{self.DESC}">'
        assert summary_from_tags(html, "PREFIX " + self.DESC) is None

    def test_entities_decoded(self):
        d = ("Fish &amp; chips are a dish that is long enough for the "
             "length gate to accept without question here.")
        html = f'<meta name="description" content="{d}">'
        out = summary_from_tags(html, "")
        assert out is not None and "&amp;" not in out and "&" in out


# --------------------------------------------------------- default summary
class TestDefaultSummary:
    def test_longest_alnum_run_wins(self):
        # <div> breaks runs; <p> is explicitly ignored (Summary.cpp:1069)
        w = tokenize("<div>short run</div><div>this one is the longest "
                     "run of words here</div><div>mid size run</div>")
        out = default_summary(w)
        assert out.startswith("this one is the longest")

    def test_p_tags_do_not_break_runs(self):
        w = tokenize("<p>one two</p><p>three four</p>")
        assert default_summary(w) == "one two three four"

    def test_links_do_not_count(self):
        w = tokenize('<div>plain words beat anchors</div>'
                     '<div><a href="x">one two three four five six</a>'
                     '</div>')
        assert default_summary(w).startswith("plain words beat")

    def test_no_words(self):
        assert default_summary(tokenize("<p></p>")) == ""


# ------------------------------------------------------------ make_summary
HTML_DOC = """
<html><head><title>Spark guide</title></head><body>
<p>Intro paragraph with filler words about nothing in particular at all.</p>
<p>Apache Spark executes distributed queries with a cost based optimizer
and adaptive execution so large joins stay fast and well balanced.</p>
<p>Unrelated trailing paragraph speaking about gardens and weather.</p>
</body></html>
"""


class TestMakeSummary:
    def test_best_window_contains_terms(self):
        out = make_summary(HTML_DOC, ["spark", "optimizer"])
        assert "Spark" in out and "optimizer" in out
        assert "gardens" not in out

    def test_tags_summary_preferred(self):
        d = ("Curated description of this page, comfortably long enough "
             "to pass the one-third length gate of the engine.")
        html = f'<meta name="description" content="{d}">' + HTML_DOC
        assert make_summary(html, ["spark"]) == d
        # and the greedy path when disabled
        out = make_summary(html, ["spark"], from_tags_first=False)
        assert "Spark" in out

    def test_no_matches_falls_back_to_default(self):
        out = make_summary(HTML_DOC, ["zzznotthere"])
        assert out != "" and "Spark" in out or "paragraph" in out

    def test_stopword_terms_score_zero(self):
        # A stopword-only query can't raise a window above 0 query score;
        # summary still returns SOMETHING (default or low window).
        out = make_summary(HTML_DOC, ["the"])
        assert isinstance(out, str)

    def test_query_repeat_derating(self):
        # Two windows: one with the term twice, one with two distinct
        # terms.  got_it derates the repeat (/15) so the distinct-term
        # window wins (100k + 100k > 100k + 100k/15).
        html = ("<p>alpha filler filler filler alpha filler filler words "
                "more words here to cross seven</p>"
                "<p>alpha words join beta filler filler words more words "
                "here to cross seven easily</p>")
        out = make_summary(html, ["alpha", "beta"], from_tags_first=False)
        assert "beta" in out

    def test_dead_zone_not_reused(self):
        # With 2 lines the second excerpt must come from OUTSIDE the
        # first window (D_USED).
        html = ("<p>token alpha one two three four five six seven eight"
                "</p><p>other alpha nine ten eleven twelve thirteen "
                "fourteen fifteen</p>")
        out = make_summary(html, ["alpha"], max_num_lines=2,
                           from_tags_first=False, max_summary_len=400)
        assert out.count("alpha") >= 2

    def test_length_budget_respected(self):
        out = make_summary(HTML_DOC, ["spark"], max_summary_len=180)
        assert len(out) <= 180 + 2   # trailing " …" slack

    def test_deterministic(self):
        a = make_summary(HTML_DOC, ["spark", "optimizer"])
        b = make_summary(HTML_DOC, ["spark", "optimizer"])
        assert a == b


# ---------------------------------------------------------------- Spark op
@pytest.mark.usefixtures("spark")
class TestSummarizeRefSpark:
    def test_matches_local_kernel(self, spark):
        rows = [
            (1, HTML_DOC, "Spark guide"),
            (2, "<p>Nothing relevant here at all, just filler text that "
                "keeps going for a while longer.</p>", ""),
            (3, '<meta name="description" content="A description long '
                'enough to pass the minimum length gate of the engine.">'
                "<p>body</p>", ""),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string, "
                                   "title string")
        got = {r.doc_id: r.summary
               for r in summarize_ref(df, "text", "title",
                                      ["spark", "optimizer"]).collect()}
        for doc_id, text, title in rows:
            assert got[doc_id] == make_summary(
                text, ["spark", "optimizer"], title=title)

    def test_no_shuffle_plan(self, spark):
        df = spark.createDataFrame([(1, "x", "t")],
                                   "doc_id int, text string, title string")
        plan = summarize_ref(df, "text", "title", ["x"])._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
