"""Frontier URL gates + permalink-format vectors.

Pins functions/urlgates.py against Url.cpp:1570-2115 and
functions/permalink.py against the URL-only ::isPermalink
(Linkdb.cpp:4734-5159, the XmlDoc.cpp:15394 call shape).
"""

from open_source_search_engine_spark.functions.permalink import (
    is_permalink_format, is_rss_ext)
from open_source_search_engine_spark.functions.urlgates import (
    has_json_extension, has_non_indexable_extension, has_script_extension,
    is_domain_unwanted, is_path_unwanted, is_tld_privacore_blacklisted,
    is_url_unwanted, url_extension)
from open_source_search_engine_spark.functions.urlnorm import normalize_url


def _u(raw):
    p = normalize_url(raw, strip_params=True, strip_common_file=True)
    assert p is not None
    return p


class TestExtension:
    def test_basic(self):
        assert url_extension("/a/b.html") == "html"
        assert url_extension("/a/b.tar.gz") == "gz"
        assert url_extension("/a/b") == ""
        assert url_extension("/a/b.") == ""
        assert url_extension("/") == ""

    def test_bad_extensions(self):
        assert has_non_indexable_extension("/x.gif")
        assert has_non_indexable_extension("/x.GIF")      # hash64Lower
        assert has_non_indexable_extension("/x.mp3")
        assert has_non_indexable_extension("/x.css")
        assert not has_non_indexable_extension("/x.html")
        assert not has_non_indexable_extension("/x.php")

    def test_zip_quirk(self):
        # Url.cpp:1752-1762 do/while stops BEFORE inserting "zip"
        assert not has_non_indexable_extension("/download.zip")
        assert has_non_indexable_extension("/download.zipx")  # v122 entry

    def test_versioning(self):
        # wmv/wma/ogg entered at titlerec version 73 (Url.cpp:1766)
        assert not has_non_indexable_extension("/x.wmv", version=72)
        assert has_non_indexable_extension("/x.wmv", version=73)
        # the BR-20160125 batch at version 122
        assert not has_non_indexable_extension("/x.7z", version=121)
        assert has_non_indexable_extension("/x.7z", version=122)
        assert has_non_indexable_extension("/x.torrent")
        # xls/pptx/xlsx commented out in the reference
        assert not has_non_indexable_extension("/x.xls")
        assert not has_non_indexable_extension("/x.pptx")

    def test_script_json_xml(self):
        assert has_script_extension("/app.js")
        assert not has_script_extension("/app.mjs")
        # hasJsonExtension's elen>=4 guard precedes its case-4 arm —
        # dead code, json passes (Url.cpp:2146-2171)
        assert not has_json_extension("/api.json")
        assert not is_url_unwanted("h.com", "h.com", "/feed.xml")
        assert not is_url_unwanted("h.com", "h.com", "/feed.rss")
        assert not is_url_unwanted("h.com", "h.com", "/api.json")


class TestDomainUnwanted:
    def test_shorteners_and_cdns(self):
        assert is_domain_unwanted("t.co", "t.co", "/abc")
        assert is_domain_unwanted("bit.ly", "bit.ly", "/x")
        assert is_domain_unwanted("fonts.googleapis.com", "googleapis.com",
                                  "/css")
        assert is_domain_unwanted("x.cloudfront.net", "cloudfront.net", "/")
        assert is_domain_unwanted("farm1.staticflickr.com",
                                  "staticflickr.com", "/1/2.jpg")

    def test_conditional_rules(self):
        assert is_domain_unwanted("www.tumblr.com", "tumblr.com", "/share")
        assert not is_domain_unwanted("x.tumblr.com", "tumblr.com", "/post/1")
        assert is_domain_unwanted("accounts.google.com", "google.com", "/")
        assert not is_domain_unwanted("www.google.com", "google.com",
                                      "/search")
        assert is_domain_unwanted("web.archive.org", "archive.org",
                                  "/web/2020/x")
        assert not is_domain_unwanted("blog.archive.org", "archive.org",
                                      "/post")
        assert is_domain_unwanted("twitter.com", "twitter.com", "/intent/tweet")
        assert is_domain_unwanted("search.twitter.com", "twitter.com", "/")
        assert not is_domain_unwanted("twitter.com", "twitter.com", "/jack")
        assert is_domain_unwanted("www.facebook.com", "facebook.com",
                                  "/sharer/sharer.php")
        assert not is_domain_unwanted("www.facebook.com", "facebook.com",
                                      "/profile")

    def test_doubleclick_www_exception(self):
        assert not is_domain_unwanted("doubleclick.net", "doubleclick.net",
                                      "/")
        assert not is_domain_unwanted("www.doubleclick.net",
                                      "doubleclick.net", "/")
        assert is_domain_unwanted("ad.doubleclick.net", "doubleclick.net",
                                  "/")
        assert is_domain_unwanted("pubads.g.doubleclick.net",
                                  "doubleclick.net", "/")

    def test_empty_domain(self):
        assert is_domain_unwanted("localhost", "", "/")


class TestPathUnwanted:
    def test_wordpress_infra(self):
        assert is_path_unwanted("/wp-admin/edit.php")
        assert is_path_unwanted("/wp-content/uploads/x.pdf")
        assert is_path_unwanted("/wp-includes/js/y")
        assert is_path_unwanted("/wp-login.php?redirect")  # plen via path only
        assert is_path_unwanted("/xmlrpc.php0")
        assert is_path_unwanted("/wp-json/v2/posts")
        assert not is_path_unwanted("/wp-admin")      # needs the slash + len
        assert not is_path_unwanted("/blog/wp-admin/")  # anchored at start

    def test_length_guards(self):
        # the reference guards plen > N strictly; a path whose length
        # equals the guard fails it even when the bytes would match
        assert not is_path_unwanted("/wp-json")        # plen 8, needs > 8
        assert is_path_unwanted("/wp-json2")
        assert is_path_unwanted("/xmlrpc.php")         # plen 11 > 10
        assert is_path_unwanted("/wp-login.php")       # plen 13 > 12
        assert is_path_unwanted("/wp-admin/")          # plen 10 > 9


class TestPrivacoreTlds:
    def test_two_char_only(self):
        assert is_tld_privacore_blacklisted("cn")
        assert is_tld_privacore_blacklisted("ru")
        assert not is_tld_privacore_blacklisted("com")
        assert not is_tld_privacore_blacklisted("co.uk")
        assert not is_tld_privacore_blacklisted("")

    def test_gated_behind_flag(self):
        assert not is_url_unwanted("a.cn", "a.cn", "/x", tld="cn")
        assert is_url_unwanted("a.cn", "a.cn", "/x", tld="cn",
                               is_privacore=True)


class TestRssExt:
    def test_xmldoc_15341(self):
        assert is_rss_ext("/feed.rss")
        assert is_rss_ext("/feed.xml")
        assert is_rss_ext("/feed.atom")
        assert is_rss_ext("/FEED.XML")
        assert not is_rss_ext("/feed.html")
        assert not is_rss_ext("/rss")          # no extension


class TestPermalinkFormat:
    def test_never_for_rss_or_root(self):
        assert not is_permalink_format(_u("http://example.com/"), True)
        assert not is_permalink_format(_u("http://example.com/"), False)
        assert not is_permalink_format(
            _u("http://example.com/2008/05/post-one-two.html"), True)

    def test_feed_hosts_always(self):
        assert is_permalink_format(
            _u("http://feedproxy.google.com/~r/Techcrunch/~3/pMaRh78u1W8/"),
            False)
        assert is_permalink_format(
            _u("http://feeds.feedburner.com/~ff/blog/post"), False)
        assert not is_permalink_format(
            _u("http://feeds.feedburner.com/blogname"), False)

    def test_dated_post(self):
        assert is_permalink_format(
            _u("http://blog.example.com/2008/05/my-post.html"), False)

    def test_hyphenated_slug(self):
        assert is_permalink_format(
            _u("http://example.com/wordless-wednesday-angel/"), False)
        # one hyphen only -> not qualified (Linkdb.cpp:4882 dcount/hcount)
        assert not is_permalink_format(
            _u("http://example.com/space-channel.htm"), False)

    def test_digits_qualify(self):
        assert is_permalink_format(_u("http://example.com/a123456"), False)
        # digits count in the cgi too (Linkdb.cpp:4830 scans to uend)
        assert is_permalink_format(
            _u("http://www.freemarketnews.com/WorldNews.asp?nid=57373"),
            False)

    def test_p_equals_cgi(self):
        assert is_permalink_format(_u("http://example.com/?p=249453"), False)

    def test_m_equals_archive_cgi(self):
        assert not is_permalink_format(
            _u("http://proglobalbusiness.org/?m=200806&p=1"), False)

    def test_needle_ladder(self):
        assert not is_permalink_format(
            _u("http://example.com/tag/one-two-three"), False)
        assert not is_permalink_format(
            _u("http://example.com/category/one-two-three"), False)
        assert not is_permalink_format(
            _u("http://forum.example.com/one-two-three"), False)  # 'forum'
        assert not is_permalink_format(
            _u("http://example.com/thread-123456.html"), False)
        assert not is_permalink_format(
            _u("http://example.com/one-two-three?cat=55"), False)
        assert not is_permalink_format(
            _u("http://example.com/search/one-two-three"), False)
        # 'scat=' has an alpha before 'cat=' -> not the needle
        assert is_permalink_format(
            _u("http://example.com/one-two-three?scat=55"), False)
        # '/topics/' is explicitly allowed while 'topic' is not
        assert not is_permalink_format(
            _u("http://example.com/topic-one-two"), False)
        assert is_permalink_format(
            _u("http://example.com/topics/one-two-three"), False)

    def test_trailing_forms(self):
        assert not is_permalink_format(
            _u("http://example.com/my-post-here/trackback"), False)
        assert not is_permalink_format(
            _u("http://example.com/some-blog-archive/2008/05/"), False)
        # year past 2015 escapes the dddd/dd archive rule but the
        # trailing /20xx rule (atoi<50) still rejects bare years
        assert not is_permalink_format(
            _u("http://example.com/one-two-x/2049"), False)
        assert not is_permalink_format(
            _u("http://example.com/essays-one-two/20th"), False)  # atoi("th")=0
        assert not is_permalink_format(
            _u("http://example.com/one-two/1999"), False)
        # index.html is stripped before the trailing checks
        assert not is_permalink_format(
            _u("http://example.com/a-b-archive/2008/05/index.html"), False)

    def test_strong_permalink_survives(self):
        assert is_permalink_format(
            _u("http://www.5minutesformom.com/5225/wordless-wednesday-angel/"),
            False)
