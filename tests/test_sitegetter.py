"""Site definition (SiteGetter.cpp): recognized user-area prefixes,
popular homesteads, hostname fallback, www. insertion — and the
Catalyst form's equality with the Python form."""

import pytest

from open_source_search_engine_spark.functions.sitegetter import (
    get_site, get_site_batch, site_expr)

VECTORS = [
    # (url, domain, expected site) — semantics from SiteGetter.cpp
    ("http://www.xyz.com/a/b.html", "xyz.com", "www.xyz.com"),
    # bare registered domain gets www. (setSite + m_hasSubdomain)
    ("http://xyz.com/a/b.html", "xyz.com", "www.xyz.com"),
    # /~user (SiteGetter.cpp:482)
    ("http://xyz.com/~bob/page.html", "xyz.com", "www.xyz.com/~bob/"),
    # numeric usernames allowed (stackoverflow comment, :503)
    ("http://stackoverflow.com/users/271376/sigterm", "stackoverflow.com",
     "www.stackoverflow.com/users/271376/"),
    # trailing slash preserved, not doubled
    ("http://a.example.com/users/fred/", "example.com",
     "a.example.com/users/fred/"),
    # dots allowed in usernames (rus-obr comment, :498)
    ("http://a.b.example.com/users/x.y/z", "example.com",
     "a.b.example.com/users/x.y/"),
    # /member.php?u= (SiteGetter.cpp:489); '=' ending gets no extra /
    ("http://forum.example.com/member.php?u=123", "example.com",
     "forum.example.com/member.php?u=123/"),
    # empty username: not a user area -> hostname
    ("http://example.com/users//x", "example.com", "www.example.com"),
    # /members/ vs /member/
    ("http://x.example.com/members/ann/pics", "example.com",
     "x.example.com/members/ann/"),
    ("http://x.example.com/member/ann", "example.com",
     "x.example.com/member/ann/"),
    # homesteads: first path component (SiteGetter.cpp:552-560)
    ("http://twitter.com/jack/status/123", "twitter.com",
     "www.twitter.com/jack/"),
    ("http://vimeo.com/somefilm", "vimeo.com", "www.vimeo.com/somefilm/"),
    # homestead root path: hostname only
    ("http://twitter.com/", "twitter.com", "www.twitter.com"),
    # subdomain host stays as-is
    ("http://h0.example/p/1.html", "h0.example", "www.h0.example"),
]


class TestGetSite:
    @pytest.mark.parametrize("url,domain,want", VECTORS)
    def test_vectors(self, url, domain, want):
        assert get_site(url, domain) == want

    def test_batch(self):
        urls = [v[0] for v in VECTORS]
        doms = [v[1] for v in VECTORS]
        assert list(get_site_batch(urls, doms)) == [v[2] for v in VECTORS]


def test_site_expr_equals_python(spark):
    from pyspark.sql import functions as F
    rows = [(u, u.split("/")[2], d) for u, d, _ in VECTORS]
    df = spark.createDataFrame(rows, "url string, host string, "
                                     "domain string")
    got = (df.withColumn("site", site_expr(F.col("url"), F.col("host"),
                                           F.col("domain")))
           .select("url", "site").collect())
    want = {u: s for u, _, s in VECTORS}
    for r in got:
        assert r["site"] == want[r["url"]], r["url"]
