"""Outlink harvesting semantics vs the reference (F22-F24):
tag set, nofollow, self-link, media-extension exclusion, relative
resolution, per-page first-wins dedup, span-order preservation."""

from __future__ import annotations

from open_source_search_engine_spark.functions.outlinks import (
    extract_outlinks)


def _spans(*texts):
    return [{"kind": "text", "text": t, "media_ref": None, "offset": i}
            for i, t in enumerate(texts)]


BASE = "http://www.example.com/dir/page.html"


def test_tag_set_a_link_area():
    spans = _spans(
        '<a href="http://a.example.com/x">a</a>'
        '<link href="http://b.example.com/y">'
        '<area href="http://c.example.com/z">'
        '<script src="http://d.example.com/no"></script>')
    urls = [o["url_norm"] for o in extract_outlinks(BASE, spans)]
    assert urls == ["http://a.example.com/x", "http://b.example.com/y",
                    "http://c.example.com/z"]


def test_nofollow_skipped():
    spans = _spans('<a href="http://a.example.com/x" rel="nofollow">a</a>'
                   '<a href="http://b.example.com/y" rel="me nofollow">b</a>'
                   '<a href="http://c.example.com/z" rel="author">c</a>')
    urls = [o["url_norm"] for o in extract_outlinks(BASE, spans)]
    assert urls == ["http://c.example.com/z"]


def test_self_link_and_fragment_skipped():
    spans = _spans(f'<a href="{BASE}">self</a>'
                   '<a href="#section">frag</a>'
                   f'<a href="{BASE}#top">self-frag</a>')
    assert extract_outlinks(BASE, spans) == []


def test_media_extensions_flagged(subtests=None):
    spans = _spans('<a href="http://a.example.com/pic.jpg">i</a>'
                   '<a href="http://a.example.com/page.html">p</a>'
                   '<a href="http://a.example.com/sitemap.xml">s</a>'
                   '<a href="http://a.example.com/app.js">j</a>')
    out = extract_outlinks(BASE, spans)
    flags = {o["url_norm"]: o["is_media"] for o in out}
    assert flags["http://a.example.com/pic.jpg"] is True
    assert flags["http://a.example.com/page.html"] is False
    # .xml IS spiderable — the reference comments out hasXmlExtension()
    # (XmlDoc.cpp:15297) precisely so sitemaps/feeds can be crawled
    assert flags["http://a.example.com/sitemap.xml"] is False
    assert flags["http://a.example.com/app.js"] is True   # script ext


class TestFeedAndSitemapForms:
    """The rss/sitemap/xml link forms of Linkdb.cpp:3651-3721."""

    def test_sitemap_loc_text_content(self):
        spans = _spans('<loc>http://a.example.com/page1.html</loc>'
                       '<loc>http://a.example.com/page2.html</loc>')
        urls = [o["url_norm"] for o in extract_outlinks(BASE, spans)]
        assert urls == ["http://a.example.com/page1.html",
                        "http://a.example.com/page2.html"]

    def test_rss_link_text_content_and_cdata(self):
        spans = _spans(
            '<link>http://a.example.com/entry1</link>'
            '<link><![CDATA[http://a.example.com/entry2]]></link>')
        urls = [o["url_norm"] for o in extract_outlinks(BASE, spans)]
        assert urls == ["http://a.example.com/entry1",
                        "http://a.example.com/entry2"]

    def test_self_closing_and_malformed_skipped(self):
        # <loc/> self-closing (Linkdb.cpp:3710 node[len-2]=='/') and a
        # <loc> whose next node is a tag, not text, both yield nothing
        spans = _spans('<loc/>',
                       '<loc><em>http://a.example.com/x</em></loc>')
        assert extract_outlinks(BASE, spans) == []

    def test_link_href_attr_still_wins(self):
        # when <link href=...> carries the attr, the text form is unused
        spans = _spans(
            '<link href="http://a.example.com/from-attr">ignored</link>')
        urls = [o["url_norm"] for o in extract_outlinks(BASE, spans)]
        assert urls == ["http://a.example.com/from-attr"]

    def test_weblog_url_attr_and_enclosure_href(self):
        spans = _spans(
            '<weblog url="http://a.example.com/blog1">'
            '<enclosure href="http://a.example.com/ep.html">')
        urls = [o["url_norm"] for o in extract_outlinks(BASE, spans)]
        assert urls == ["http://a.example.com/blog1",
                        "http://a.example.com/ep.html"]

    def test_urlfrom_and_feedburner_origlink(self):
        spans = _spans(
            '<urlfrom>http://a.example.com/cited</urlfrom>'
            '<feedburner:origlink>http://a.example.com/orig'
            '</feedburner:origlink>')
        urls = [o["url_norm"] for o in extract_outlinks(BASE, spans)]
        assert urls == ["http://a.example.com/cited",
                        "http://a.example.com/orig"]

    def test_harvested_sitemap_urls_enter_frontier(self):
        # end-to-end point of the loc form: a sitemap.xml's <loc> URLs
        # are NOT media-flagged — they become spiderable requests
        spans = _spans('<loc>http://a.example.com/deep/page.html</loc>')
        out = extract_outlinks("http://a.example.com/sitemap.xml", spans)
        assert out and out[0]["is_media"] is False


def test_javascript_onclick_recovery():
    """Linkdb.cpp:3740-3769: javascript: hrefs recover the popup url from
    the onclick attribute's first '/-quoted token."""
    spans = _spans(
        '<a href="javascript:pop()" '
        'onclick="window.open(\'/real/page.html\',\'w\')">x</a>'
        '<a href="javascript:void(0)">no-onclick</a>'
        '<a href="javascript:go()" onclick="doit(this)">no-url</a>')
    urls = [o["url_norm"] for o in extract_outlinks(BASE, spans)]
    assert urls == ["http://www.example.com/real/page.html"]


def test_relative_resolution():
    spans = _spans('<a href="sub/x.html">rel</a>'
                   '<a href="/root.html">abs-path</a>'
                   '<a href="//other.example.com/p">scheme-rel</a>')
    urls = [o["url_norm"] for o in extract_outlinks(BASE, spans)]
    assert urls == ["http://www.example.com/dir/sub/x.html",
                    "http://www.example.com/root.html",
                    "http://other.example.com/p"]


def test_first_wins_dedup_across_spans():
    spans = _spans('<a href="http://a.example.com/x">first</a>',
                   '<a href="http://a.example.com/x">second</a>'
                   '<a href="http://b.example.com/y">other</a>')
    out = extract_outlinks(BASE, spans)
    assert [o["url_norm"] for o in out] == [
        "http://a.example.com/x", "http://b.example.com/y"]


def test_span_order_preserved_and_media_ref_spans():
    spans = [
        {"kind": "text", "offset": 0, "media_ref": None,
         "text": '<a href="http://z.example.com/1">z</a>'},
        {"kind": "media_ref", "offset": 1,
         "media_ref": "http://img.example.com/a.png", "text": None},
        {"kind": "text", "offset": 2, "media_ref": None,
         "text": '<a href="http://a.example.com/2">a</a>'},
    ]
    out = extract_outlinks(BASE, spans)
    assert [o["url_norm"] for o in out] == [
        "http://z.example.com/1", "http://img.example.com/a.png",
        "http://a.example.com/2"]
    assert out[1]["is_media"] is True
    # shuffled span input must yield the same (offset-ordered) result
    out2 = extract_outlinks(BASE, list(reversed(spans)))
    assert [o["url_norm"] for o in out2] == [o["url_norm"] for o in out]


def test_short_host_and_bad_scheme_skipped():
    spans = _spans('<a href="http://ab/x">short</a>'
                   '<a href="ftp://ftp.example.com/f">ftp</a>'
                   '<a href="javascript:void(0)">js</a>'
                   '<a href="mailto:x@example.com">mail</a>')
    assert extract_outlinks(BASE, spans) == []


def test_entity_decoded_hrefs():
    """HTML entities in href values must decode before URL resolution
    (Entities.cpp/entities.json; Xml.cpp parse path): href="a?x=1&amp;y=2"
    must yield ...?x=1&y=2, incl. numeric and named forms."""
    from open_source_search_engine_spark.functions.outlinks import (
        extract_outlinks)
    spans = [{"kind": "text", "offset": 0, "media_ref": None, "text":
              '<a href="http://www.x7.example/p?x=1&amp;y=2">a</a> '
              '<a href="http://www.x7.example/q&#47;deep.html">b</a> '
              '<a href="http://www.x7.example/r?a=&quot;v&quot;">c</a>'}]
    links = extract_outlinks("http://www.host0.example/page.html", spans)
    urls = [l["url_norm"] for l in links]
    assert "http://www.x7.example/p?x=1&y=2" in urls
    assert "http://www.x7.example/q/deep.html" in urls
    assert any('r?a=%22v%22' in u or 'r?a="v"' in u for u in urls), urls


class TestBaseHref:
    """<base href> handling (XmlDoc::getBaseUrl, XmlDoc.cpp:16137-16165)."""

    def _links(self, spans, page="http://www.site.example/dir/page.html"):
        from open_source_search_engine_spark.functions.outlinks import (
            extract_outlinks)
        return [o["url_norm"] for o in extract_outlinks(page, spans)
                if not o["is_media"]]

    def test_valid_base_redirects_relative_links(self):
        spans = [{"kind": "text", "offset": 0, "media_ref": None,
                  "text": '<base href="http://cdn.other.example/b/">'
                          '<a href="x.html">x</a>'
                          '<a href="/root.html">r</a>'}]
        # relative resolves into the base DIR, root-relative onto the
        # base HOST (both against the base, not the page)
        assert self._links(spans) == [
            "http://cdn.other.example/b/x.html",
            "http://cdn.other.example/root.html"]

    def test_invalid_base_falls_back_to_page(self):
        spans = [{"kind": "text", "offset": 0, "media_ref": None,
                  "text": '<base href="/"><a href="x.html">x</a>'}]
        assert self._links(spans) == ["http://www.site.example/dir/x.html"]

    def test_first_base_wins(self):
        spans = [
            {"kind": "text", "offset": 0, "media_ref": None,
             "text": '<base href="http://one.example/a/">'},
            {"kind": "text", "offset": 1, "media_ref": None,
             "text": '<base href="http://two.example/b/">'
                     '<a href="x.html">x</a>'},
        ]
        assert self._links(spans) == ["http://one.example/a/x.html"]

    def test_base_applies_to_links_before_it(self):
        # the reference resolves ALL links against the doc base, even
        # ones that appear before the <base> tag in the byte stream
        spans = [
            {"kind": "text", "offset": 0, "media_ref": None,
             "text": '<a href="x.html">x</a>'},
            {"kind": "text", "offset": 1, "media_ref": None,
             "text": '<base href="http://late.example/b/">'},
        ]
        assert self._links(spans) == ["http://late.example/b/x.html"]

    def test_absolute_links_ignore_base(self):
        spans = [{"kind": "text", "offset": 0, "media_ref": None,
                  "text": '<base href="http://cdn.other.example/b/">'
                          '<a href="http://abs.example/p.html">a</a>'}]
        assert self._links(spans) == ["http://abs.example/p.html"]
