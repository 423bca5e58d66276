"""Link-spam detection (linkspam.cpp isLinkSpam) — kernel + Spark op.

Each test family pins one rung of the reference ladder with a hand-built
page; the Spark test asserts the mapInPandas operator equals the pure
kernel row for row.
"""

import pytest

from open_source_search_engine_spark.functions.linkspam import (
    LINK_CHAIN_SNI_MAX, MAX_DOC_LEN, host_is_porn, link_spam_votes,
    scan_nodes, url_spam_note, url_spam_note_col,
)
from open_source_search_engine_spark.functions.urlnorm import normalize_url


def _spans(*texts):
    return [{"kind": "text", "text": t, "media_ref": None, "offset": i}
            for i, t in enumerate(texts)]


def _votes(page_url, html, **kw):
    return link_spam_votes(page_url, _spans(html), **kw)


def _one(page_url, html, **kw):
    v = _votes(page_url, html, **kw)
    assert len(v) == 1, v
    return v[0]


LINK = '<a href="http://other.example/page.html">other</a>'
# plain text on both sides so the link-chain rung stays quiet
CLEAN = f"<p>alpha text before {LINK} alpha text after</p>"


# ------------------------------------------------------------ URL ladder
class TestUrlLadder:
    def test_info_biz_tld(self):
        assert url_spam_note(normalize_url("http://x.info/a")) == ".info tld"
        assert url_spam_note(normalize_url("http://x.biz/a")) == ".biz tld"

    def test_doc_too_big(self):
        p = normalize_url("http://x.example/a")
        assert url_spam_note(p, MAX_DOC_LEN + 1) == "doc too big"
        assert url_spam_note(p, MAX_DOC_LEN) is None

    def test_guestbook_hostname(self):
        p = normalize_url("http://guestbook.x.example/a")
        assert url_spam_note(p) == "guestbook in hostname"
        # >=30-char subdomain prefix is exempt (linkspam.cpp:672)
        long = "guestbook" + "a" * 25
        p2 = normalize_url(f"http://{long}.x.example/a")
        assert url_spam_note(p2) is None

    def test_cgi(self):
        p = normalize_url("http://x.example/a?b=1")
        assert url_spam_note(p) == "path is cgi"

    def test_path_ladder_order(self):
        # "guest" outranks "board" (first match in table order wins)
        p = normalize_url("http://x.example/guest/board/")
        assert url_spam_note(p) == "path has guest"
        p2 = normalize_url("http://x.example/messageboard/")
        assert url_spam_note(p2) == "path has messag"
        p2b = normalize_url("http://x.example/msgboard/")
        assert url_spam_note(p2b) == "path has msg"
        p3 = normalize_url("http://x.example/ok/page.html")
        assert url_spam_note(p3) is None

    def test_whole_page_vote_suppressed(self):
        row = _one("http://x.info/a.html", CLEAN)
        assert row["is_spam"] and row["note"] == ".info tld"


# --------------------------------------------------------- content rungs
class TestContentRungs:
    def test_stats_title(self):
        html = f"<title>Web Statistics for x.example</title>{CLEAN}"
        row = _one("http://x.example/a.html", html)
        assert row["is_spam"] and row["note"] == "stats page"

    def test_needle_plain(self):
        html = f"{CLEAN}<p>please add your url here</p>"
        row = _one("http://x.example/a.html", html)
        assert row["is_spam"] and row["note"] == "add your url"

    def test_section_needle_before_link_counts(self):
        html = f'<div class="comment">text</div>{CLEAN}'
        row = _one("http://x.example/a.html", html)
        assert row["is_spam"] and row["note"] == 'class="comment'

    def test_section_needle_after_link_exempts(self):
        # link ABOVE the comment section may vote (matches2.cpp:330-340)
        html = f'{CLEAN}<div class="comment">text</div>'
        row = _one("http://x.example/a.html", html)
        assert not row["is_spam"]

    def test_thumbshots_needs_five(self):
        four = "open.thumbshots.org " * 4
        html = f"{CLEAN}<p>{four}</p>"
        assert not _one("http://x.example/a.html", html)["is_spam"]
        five = "open.thumbshots.org " * 5
        row = _one("http://x.example/a.html", f"{CLEAN}<p>{five}</p>")
        assert row["is_spam"] and row["note"] == "open.thumbshots.org"

    def test_needles2_linkbuf(self):
        html = (f"{CLEAN} more alpha text "
                '<a href="http://linksmanager.example/x.html">lm</a> tail')
        rows = _votes("http://x.example/a.html", html)
        assert all(r["is_spam"] and r["note"] == "linksmanager"
                   for r in rows)

    def test_form_post_page(self):
        html = (f"{CLEAN}<form method=post "
                'action="http://x.example/cgi-bin/mt-comments.cgi">')
        row = _one("http://x.example/a.html", html)
        assert row["is_spam"] and row["note"] == "post page"

    def test_form_mt_search_exempt(self):
        html = (f"{CLEAN}<form method=post "
                'action="http://x.example/mt/mt-search.cgi">')
        assert not _one("http://x.example/a.html", html)["is_spam"]

    def test_textarea_submit(self):
        html = (f"{CLEAN}<textarea name=c></textarea>"
                '<input type="submit" value="Post">')
        row = _one("http://x.example/a.html", html)
        assert row["is_spam"] and row["note"] == "textarea tag"

    def test_textarea_without_submit_ok(self):
        html = f"{CLEAN}<textarea name=c></textarea>"
        assert not _one("http://x.example/a.html", html)["is_spam"]

    def test_had_pre_match_gates_textarea(self):
        # a section needle AFTER the link flags hadPreMatch → the
        # textarea+submit rung is skipped (linkspam.cpp:873-886)
        html = (f"{CLEAN}<div class=\"comment\">c</div>"
                "<textarea name=c></textarea>"
                '<input type="submit" value="Post">')
        assert not _one("http://x.example/a.html", html)["is_spam"]


# ------------------------------------------------------------ exemptions
class TestExemptions:
    def test_same_host_never_spam(self):
        html = ('<a href="http://x.info/other.html">self</a> '
                "alpha before and after")
        rows = _votes("http://x.info/a.html", html)
        assert rows[0]["linkee_host"] == "x.info"
        assert not rows[0]["is_spam"]

    def test_edu_exempt_from_chain_but_not_needles(self):
        # needle rungs still fire for .edu (the exemption sits below
        # them in the ladder, linkspam.cpp:918-919)
        html = f"{CLEAN}<p>add your url</p>"
        row = _one("http://dept.someu.edu/a.html", html)
        assert row["is_spam"] and row["note"] == "add your url"
        # ...but a bare link chain does not
        chain = f"<div>{LINK}</div>"
        assert not _one("http://dept.someu.edu/a.html", chain)["is_spam"]

    def test_sni_gate_disables_chain(self):
        chain = f"<div>{LINK}</div>"
        assert _one("http://x.example/a.html", chain)["is_spam"]
        row = _one("http://x.example/a.html", chain,
                   site_num_inlinks=LINK_CHAIN_SNI_MAX)
        assert not row["is_spam"]


# ------------------------------------------------------------- porn host
class TestPornHost:
    def test_adult_host_flagged(self):
        p = normalize_url("http://bdsmlinks.example/a")
        assert host_is_porn(p)
        row = _one("http://bdsmlinks.example/a.html", CLEAN)
        assert row["is_spam"] and row["note"] == "linker is porn"

    def test_clean_split_saves_host(self):
        # "montanalinux" contains 'anal' but splits into clean dict words
        # (Url.cpp:1517-1522 fixup)
        p = normalize_url("http://montanalinux.example/a")
        words = frozenset({"montana", "linux"})
        assert not host_is_porn(p, words)
        assert host_is_porn(p, frozenset())   # no dict → can't prove clean

    def test_clean_host_not_flagged(self):
        assert not host_is_porn(normalize_url("http://example.example/"))


# ------------------------------------------------------------ link chain
class TestLinkChain:
    def test_text_both_sides_ok(self):
        assert not _one("http://x.example/a.html", CLEAN)["is_spam"]

    def test_chain_middle(self):
        row = _one("http://x.example/a.html", f"<div>{LINK}</div>")
        assert row["is_spam"] and row["note"] == "link chain middle"

    def test_chain_left_right(self):
        left = f"<div>{LINK} alpha tail text</div>"
        row = _one("http://x.example/a.html", left)
        assert row["is_spam"] and row["note"] == "link chain left"
        right = f"<div>alpha head text {LINK}</div>"
        row = _one("http://x.example/a.html", right)
        assert row["is_spam"] and row["note"] == "link chain right"

    def test_blogroll_of_links_is_chain(self):
        links = "".join(
            f'<a href="http://other{i}.example/">o{i}</a>' for i in range(4))
        rows = _votes("http://x.example/a.html", f"<div>{links}</div>")
        assert all(r["is_spam"] and r["note"].startswith("link chain")
                   for r in rows)

    def test_ad_table(self):
        html = (f'<table><td>{LINK} trailing alpha words</td></table>')
        row = _one("http://x.example/a.html", html)
        assert row["is_spam"] and row["note"] == "ad table"

    def test_serp_ellipsis(self):
        html = f"<div>snippet text ... more {LINK} tail alpha</div>"
        row = _one("http://x.example/a.html", html)
        assert row["is_spam"] and row["note"] == "search result right"

    def test_anchor_text_is_not_plain_text(self):
        # words INSIDE neighboring anchors don't count as left/right text
        html = ('<a href="http://other.example/one.html">wordy anchor'
                f"</a>{LINK}")
        rows = _votes("http://x.example/a.html", html)
        assert rows[1]["is_spam"]

    def test_root_reoccurrence_condemns(self):
        # our link has text around it, but the linkee's bare root URL
        # appears again later in a chain → outer loop re-checks (:995-1080)
        html = (f"{CLEAN} filler alpha <div>"
                '<a href="http://other.example/">root</a></div>')
        rows = _votes("http://x.example/a.html", html)
        assert rows[0]["is_spam"]
        assert rows[0]["note"].startswith("link chain")


# --------------------------------------------------------------- parsing
class TestNodeScan:
    def test_offsets_and_backtags(self):
        nodes = scan_nodes('ab<a href="x">t</a>cd')
        names = [(n.name, n.is_back, n.offset) for n in nodes]
        assert names == [("#text", False, 0), ("a", False, 2),
                         ("#text", False, 14), ("a", True, 15),
                         ("#text", False, 19)]
        assert nodes[1].attr("href") == "x"


# ------------------------------------------------------------- Spark ops
class TestSparkOps:
    def test_votes_df_matches_kernel(self, spark):
        pages = [
            ("http://x.info/a.html", CLEAN),
            ("http://x.example/a.html", f"<div>{LINK}</div>"),
            ("http://x.example/b.html", CLEAN),
            ("http://x.example/c.html", f"{CLEAN}<p>add your url</p>"),
        ]
        rows = [(i, u, [{"kind": "text", "text": t, "media_ref": None,
                         "offset": 0}]) for i, (u, t) in enumerate(pages)]
        docs = spark.createDataFrame(
            rows, "doc_id long, url string, "
                  "spans array<struct<kind:string,text:string,"
                  "media_ref:string,offset:int>>")
        from open_source_search_engine_spark.graph.spamvotes import (
            good_inlink_counts, link_spam_votes_df)
        got = sorted(link_spam_votes_df(docs).collect(),
                     key=lambda r: (r.doc_id, r.url_norm))
        want = []
        for i, (u, t) in enumerate(pages):
            for v in link_spam_votes(u, _spans(t)):
                want.append((i, u, v["url_norm"], v["linkee_host"],
                             v["is_spam"], v["note"]))
        assert [tuple(r) for r in got] == sorted(want)
        counts = {r.linkee_host: (r.n_good_inlinks, r.n_spam_inlinks)
                  for r in good_inlink_counts(
                      link_spam_votes_df(docs)).collect()}
        # other.example: good votes from x.example/b + /c?  b is clean,
        # c hits 'add your url'; a(x.info) spam; chain page spam —
        # 3 distinct spam linker hosts collapse to 2 (x.info, x.example)
        assert counts["other.example"][0] == 1   # x.example (page b)
        assert counts["other.example"][1] == 2   # x.info + x.example

    def test_url_note_col_matches_kernel(self, spark):
        urls = ["http://x.info/a", "http://x.biz/a",
                "http://guestbook.x.example/a", "http://x.example/a?b=1",
                "http://x.example/guest/x", "http://x.example/ok.html",
                "http://x.example/trade-links/x"]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {r.url: r.note for r in df.select(
            "url", url_spam_note_col("url").alias("note")).collect()}
        for u in urls:
            assert got[u] == url_spam_note(normalize_url(u)), u
