"""Reference-faithful title engine (Title.cpp) — kernel + Spark tests."""

import pytest

from open_source_search_engine_spark.search.title_ref import (
    Inlink,
    copy_title,
    get_similarity,
    make_title,
    title_from_tags,
    title_ref,
    _tok_plain,
)


# --------------------------------------------------------- title_from_tags
class TestTitleFromTags:
    def test_title_tag(self):
        assert title_from_tags("<title>My Great Page</title>") == \
            "My Great Page"

    def test_og_title_beats_title_tag(self):
        html = ('<meta property="og:title" content="OG Title Here">'
                "<title>Tag Title</title>")
        assert title_from_tags(html) == "OG Title Here"

    def test_meta_name_title_beats_title_tag(self):
        html = ('<meta name="title" content="Meta Name Title">'
                "<title>Tag Title</title>")
        assert title_from_tags(html) == "Meta Name Title"

    def test_length_gate(self):
        # min 3 chars (Title.cpp:67), max maxTitleLen
        assert title_from_tags("<title>ab</title>") is None
        assert title_from_tags(f"<title>{'x' * 100}</title>") is None

    def test_entities_and_whitespace(self):
        assert title_from_tags("<title>  Fish &amp;\n Chips </title>") == \
            "Fish & Chips"

    def test_non_html_pdf_only(self):
        assert title_from_tags("<title>Some Title</title>",
                               content_type="text") is None


# ---------------------------------------------------------- get_similarity
class TestGetSimilarity:
    def test_identical_is_one(self):
        w = _tok_plain("alpha beta gamma")
        assert get_similarity(w, 0, w.n, w, 0, w.n) == pytest.approx(1.0)

    def test_disjoint_is_zero(self):
        w1 = _tok_plain("alpha beta")
        w2 = _tok_plain("gamma delta")
        assert get_similarity(w1, 0, w1.n, w2, 0, w2.n) == 0.0

    def test_partial_overlap_between(self):
        w1 = _tok_plain("alpha beta")
        w2 = _tok_plain("alpha gamma")
        fp = get_similarity(w1, 0, w1.n, w2, 0, w2.n)
        assert 0.0 < fp < 1.0

    def test_phrases_count_half(self):
        # same words, different order: word hits yes, phrase hits no
        w1 = _tok_plain("alpha beta")
        w2 = _tok_plain("beta alpha")
        fp_same = get_similarity(w1, 0, w1.n, w1, 0, w1.n)
        fp_perm = get_similarity(w1, 0, w1.n, w2, 0, w2.n)
        assert fp_perm < fp_same

    def test_popularity_downweights_common_words(self):
        pop = {"the": 0x7FFF}        # maximally popular -> score 0
        w1 = _tok_plain("the zebra")
        w2 = _tok_plain("the yak")
        fp_with = get_similarity(w1, 0, w1.n, w2, 0, w2.n, pop)
        fp_without = get_similarity(w1, 0, w1.n, w2, 0, w2.n)
        assert fp_with < fp_without

    def test_empty_ranges(self):
        w = _tok_plain("a b")
        assert get_similarity(w, 0, 0, w, 0, w.n) == 0.0


# --------------------------------------------------------------- copyTitle
class TestCopyTitle:
    def test_plain_span(self):
        w = _tok_plain("Hello Brave World")
        assert copy_title(w, 0, w.n) == "Hello Brave World"

    def test_strips_trailing_separators(self):
        w = _tok_plain("Good Title - ")
        assert copy_title(w, 0, w.n) == "Good Title"

    def test_includes_leading_quote(self):
        s = '"Quoted Title'
        w = _tok_plain(s)
        # span starting at the word after the quote pulls the quote in
        out = copy_title(w, 1, w.n, src_text=s)
        assert out.startswith('"')

    def test_escapes_angle_brackets(self):
        w = _tok_plain("a < b")
        assert "&lt;" in copy_title(w, 0, w.n)

    def test_truncates_at_last_punct_with_ellipsis(self):
        s = "word " * 40
        w = _tok_plain(s)
        out = copy_title(w, 0, w.n, max_title_len=20)
        assert out.endswith("...")
        assert len(out) <= 24

    def test_drops_unwanted_symbols(self):
        s = "Nice ■ Title"
        w = _tok_plain(s)
        assert "■" not in copy_title(w, 0, w.n, src_text=s)


# -------------------------------------------------------------- make_title
SELF = "http://example.com/page.html"

BODY = (f'<html><body><a href="{SELF}">The Canonical Page Name</a>'
        '<p>some body text</p>'
        '<a href="http://other.com/x">Other Site Link</a>'
        "</body></html>")


class TestMakeTitle:
    def test_tag_title_wins_first(self):
        html = "<title>Tag Title Here</title>" + BODY
        assert make_title(html, SELF) == "Tag Title Here"

    def test_self_link_anchor_text(self):
        # no <title>: the self-link anchor text is a 1.5 candidate
        assert make_title(BODY, SELF) == "The Canonical Page Name"

    def test_non_self_links_excluded(self):
        html = ('<a href="http://other.com/y">Do Not Pick Me Ever</a>'
                "<p>words</p>")
        assert make_title(html, SELF) == ""

    def test_title_attribute_gold(self):
        html = (f'<a href="{SELF}" title="Title Attribute Wins">'
                "anchor words</a>")
        assert make_title(html, SELF) == "Title Attribute Wins"

    def test_title_attribute_permalink_skipped(self):
        html = (f'<a href="{SELF}" title="Permalink to this">'
                "Anchor Text Name</a>")
        # permalink title attr skipped; anchor text also not viable
        # (selfLink stays True since attr was skipped) -> anchor text
        out = make_title(html, SELF)
        assert out != "Permalink to this"

    def test_onclick_disqualifies_self_link(self):
        html = (f'<a href="{SELF}" onclick="go()">Mixx Style Link</a>')
        assert make_title(html, SELF) == ""

    def test_inlink_text_candidate(self):
        inl = [Inlink("Inlink Anchor Title", same_host=True)]
        assert make_title("<p>no links</p>", SELF, inlinks=inl) == \
            "Inlink Anchor Title"

    def test_rss_title_outscores_link_text(self):
        inl = [Inlink("Link Text Name", same_host=True),
               Inlink(rss_title="RSS Item Title Long", same_host=True)]
        assert make_title("<p>x</p>", SELF, inlinks=inl) == \
            "RSS Item Title Long"

    def test_same_host_linktext_beats_remote(self):
        inl = [Inlink("Remote Name", same_host=False),
               Inlink("Local Name", same_host=True)]
        assert make_title("<p>x</p>", SELF, inlinks=inl) == "Local Name"

    def test_inlink_cap_first_19(self):
        # Title.cpp:226 ++kcount>=20 admits only the first 19 texts
        inl = [Inlink(f"Name Number {i}", same_host=True)
               for i in range(30)]
        out = make_title("<p>x</p>", SELF, inlinks=inl)
        assert out == "Name Number 0"   # all same score: first wins

    def test_first_line_for_text_docs(self):
        txt = "Plain Text Document Heading\nbody line two\nmore text\n"
        assert make_title(txt, SELF, content_type="text") == \
            "Plain Text Document Heading"
        # html content type: no first-line candidate
        assert make_title(txt, SELF, content_type="html") == ""

    def test_url_path_never_wins_alone(self):
        assert make_title("<p>x</p>",
                          "http://e.com/some-hyphen-path/") == ""

    def test_url_path_boosts_similar_candidate(self):
        # two inlinks with equal base score; the one matching the URL
        # path gets the similarity cross-boost
        url = "http://e.com/big-cat-page/"
        inl = [Inlink("Dog House", same_host=False),
               Inlink("Big Cat Page", same_host=False)]
        assert make_title("<p>x</p>", url, inlinks=inl) == "Big Cat Page"

    def test_similarity_cross_boost_majority(self):
        # three agreeing remote link texts beat one local link text
        inl = [Inlink("Popular Agreed Name", same_host=False),
               Inlink("Popular Agreed Name", same_host=False),
               Inlink("Popular Agreed Name", same_host=False),
               Inlink("Lonely Local Name", same_host=True)]
        assert make_title("<p>x</p>", SELF, inlinks=inl) == \
            "Popular Agreed Name"

    def test_query_term_boost(self):
        inl = [Inlink("About Zebras Today", same_host=True),
               Inlink("About Horses Today", same_host=True)]
        out = make_title("<p>x</p>", SELF, inlinks=inl,
                         query_terms=["horses"])
        assert out == "About Horses Today"

    def test_root_title_split(self):
        # "Page Name | Site Name" with root title "Site Name":
        # the subtitle child "Page Name" should win
        inl = [Inlink("Best Page Name | Example Site", same_host=True)]
        out = make_title("<p>x</p>", "http://example.com/sub/page",
                         inlinks=inl, root_titles=["Example Site"])
        assert out == "Best Page Name"

    def test_root_url_no_split(self):
        # root URLs never split (oldn = -2, Title.cpp:836-839)
        inl = [Inlink("Best Page Name | Example Site", same_host=True)]
        out = make_title("<p>x</p>", "http://example.com/",
                         inlinks=inl, root_titles=["Example Site"])
        assert out == "Best Page Name | Example Site"

    def test_http_prefix_penalty(self):
        inl = [Inlink("http://example.com/x", same_host=True),
               Inlink("Decent Readable Name", same_host=False)]
        assert make_title("<p>x</p>", SELF, inlinks=inl) == \
            "Decent Readable Name"

    def test_empty_doc(self):
        assert make_title("", "") == ""

    def test_deterministic(self):
        inl = [Inlink("A Name", same_host=True),
               Inlink("B Name", same_host=False)]
        a = make_title(BODY, SELF, inlinks=inl, query_terms=["name"])
        b = make_title(BODY, SELF, inlinks=inl, query_terms=["name"])
        assert a == b


# ---------------------------------------------------------------- Spark op
@pytest.mark.usefixtures("spark")
class TestTitleRefSpark:
    def test_matches_local_kernel(self, spark):
        rows = [
            (1, "<title>Doc One Title</title><p>b</p>", SELF,
             [("Anchor One", "", True)]),
            (2, BODY, SELF, []),
            (3, "<p>plain</p>", "", [("Inlink Name Two", "", False)]),
        ]
        df = spark.createDataFrame(
            rows, "doc_id int, text string, url string, anchors "
            "array<struct<link_text:string,rss_title:string,"
            "same_host:boolean>>")
        got = {r.doc_id: r.title
               for r in title_ref(df, "text", "url", "anchors",
                                  ["doc"]).collect()}
        for doc_id, text, url, anchors in rows:
            inl = [Inlink(a, b, c) for a, b, c in anchors]
            assert got[doc_id] == make_title(text, url, ["doc"], inl)

    def test_no_shuffle_plan(self, spark):
        df = spark.createDataFrame([(1, "x", "u")],
                                   "doc_id int, text string, url string")
        plan = title_ref(df, "text", "url")._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
