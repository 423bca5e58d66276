"""URL normalization parity vectors, derived from the reference behavior
(`Url.cpp:794-1380`) and its unit suite (`test/unit/UrlTest.cpp`).
Vectors marked v122 replay `TEST(UrlTest, StripParamsV122)` rows."""

import pytest

from open_source_search_engine_spark.functions.urlnorm import (
    normalize_url,
    normalize_batch,
    _strip_params_v122,
)


def norm(u, **kw):
    p = normalize_url(u, **kw)
    assert p is not None
    return p.url


class TestBasics:
    def test_adds_scheme_and_root_slash(self):
        assert norm("www.example.com") == "http://www.example.com/"

    def test_lowercases_scheme_and_host_not_path(self):
        assert norm("HTTP://WWW.Example.COM/PaTh") == "http://www.example.com/PaTh"

    def test_scheme_relative(self):
        # Url.cpp:1157-1159: '//host' treated as missing-scheme slashdot form
        assert norm("//example.com/x") == "http://example.com/x"

    def test_single_slash_scheme_fixed(self):
        # Url.cpp:1141-1151: 'http:/x' one-slash mistake
        assert norm("http:/example.com/x") == "http://example.com/x"

    def test_default_port_dropped(self):
        assert norm("http://example.com:80/x") == "http://example.com/x"
        assert norm("https://example.com:443/x") == "https://example.com/x"

    def test_nondefault_port_kept(self):
        assert norm("http://example.com:8080/x") == "http://example.com:8080/x"

    def test_https_port_80_kept(self):
        assert norm("https://example.com:80/") == "https://example.com:80/"

    def test_leading_junk_stripped(self):
        # Url.cpp:813-818: leading non-alnum (except - /) skipped; trailing
        # '>' is legal path content and survives, as in the reference
        assert norm("  \t<http://example.com/>") == "http://example.com/>"

    def test_stops_at_whitespace(self):
        assert norm("http://example.com/a b") == "http://example.com/a"

    def test_double_scheme_collapsed(self):
        assert norm("http://http://example.com/") == "http://example.com/"

    def test_trailing_host_dot_dropped(self):
        assert norm("http://example.com./x") == "http://example.com/x"

    def test_backslash_to_slash(self):
        assert norm("http://example.com\\a\\b") == "http://example.com/a/b"

    def test_long_url_truncated(self):
        u = "http://example.com/" + "a" * 2000
        assert len(norm(u)) <= 1014

    def test_empty_and_junk_only(self):
        assert normalize_url("") is None
        assert normalize_url("   <> ") is None


class TestFragment:
    def test_fragment_dropped(self):
        assert norm("http://example.com/page.html#anchor") == "http://example.com/page.html"

    def test_hashbang_kept(self):
        # Url.cpp:1026-1030: google #! urls keep the fragment in the path
        assert norm("http://example.com/page#!state=1") == "http://example.com/page#!state=1"


class TestPath:
    def test_double_slash_deduped(self):
        assert norm("http://example.com//a///b") == "http://example.com/a/b"

    def test_dot_segment_removed(self):
        assert norm("http://example.com/a/./b") == "http://example.com/a/b"

    def test_dotdot_resolved(self):
        assert norm("http://example.com/a/b/../c") == "http://example.com/a/c"

    def test_dotdot_at_root_safe(self):
        assert norm("http://example.com/../x") == "http://example.com/x"

    def test_query_kept_with_ampersand_dedup(self):
        # Url.cpp:1329-1337
        assert norm("http://example.com/x?a=1&&b=2&&&c=3") == "http://example.com/x?a=1&b=2&c=3"

    def test_semicolon_question_merged(self):
        # Url.cpp:1313-1316: ';?' -> '?'
        assert norm("http://example.com/x;?a=1") == "http://example.com/x?a=1"


class TestWWW:
    def test_add_www_on_bare_domain(self):
        assert norm("http://example.com/", add_www=True) == "http://www.example.com/"

    def test_no_add_www_on_subdomain(self):
        assert norm("http://sub.example.com/", add_www=True) == "http://sub.example.com/"

    def test_no_add_www_on_ip(self):
        assert norm("http://10.5.44.77/", add_www=True) == "http://10.5.44.77/"


class TestIDN:
    def test_punycode_host(self):
        # UrlTest.cpp:9 - topbeskæring.dk
        assert (
            norm("http://topbeskæring.dk/velkommen")
            == "http://xn--topbeskring-g9a.dk/velkommen"
        )

    def test_punycode_with_www(self):
        # UrlTest.cpp:10
        assert (
            norm("www.Alliancefrançaise.nu")
            == "http://www.xn--alliancefranaise-npb.nu/"
        )

    def test_punycode_middle_label(self):
        # UrlTest.cpp:12
        assert (
            norm("française.Alliance.nu/asdf")
            == "http://xn--franaise-v0a.alliance.nu/asdf"
        )


class TestCommonFileStrip:
    def test_index_html(self):
        assert (
            norm("http://example.com/a/index.html", strip_common_file=True)
            == "http://example.com/a/"
        )

    def test_default_aspx(self):
        assert (
            norm("http://example.com/default.aspx", strip_common_file=True)
            == "http://example.com/"
        )

    def test_not_a_suffix(self):
        assert (
            norm("http://example.com/myindex.html", strip_common_file=True)
            == "http://example.com/myindex.html"
        )


V122_VECTORS = [
    # (input, expected) — from TEST(UrlTest, StripParamsV122)
    ("http://retailer.esignserver2.com/holzboden-direkt/gallery.do;jsessionid=D6C14EE54E6AF0B89885D129D817A505",
     "http://retailer.esignserver2.com/holzboden-direkt/gallery.do"),
    ("https://scholarships.wisc.edu/Scholarships/recipientDetails;jsessionid=D2DCE4F10608F15CA177E29EB2AB162F?recipId=850",
     "https://scholarships.wisc.edu/Scholarships/recipientDetails?recipId=850"),
    ("http://staging.ilo.org/gimi/gess/ShowProject.do;jsessionid=759cb78d694bd5a5dd5551c6eb36a1fb66b98f4e786d5ae3c73cee161067be75.e3aTbhuLbNmSe34MchaRahaRaNb0?id=1625",
     "http://staging.ilo.org/gimi/gess/ShowProject.do?id=1625"),
    ("http://ualberta.intelliresponse.com/index.jsp?requestType=NormalRequest&source=3&id=474&sessionId=f5b80817-fa7e-11e5-9343-5f3e78a954d2&question=How+many+students+are+enrolled",
     "http://ualberta.intelliresponse.com/index.jsp?requestType=NormalRequest&source=3&id=474&question=How+many+students+are+enrolled"),
    ("http://www.eyecinema.ie/cinemas/film_info_detail.asp?SessionID=78C5F9DFF1B9441EB5ED527AB61BAB5B&cn=1&ci=2&ln=1&fi=7675",
     "http://www.eyecinema.ie/cinemas/film_info_detail.asp?cn=1&ci=2&ln=1&fi=7675"),
    ("https://jobs.bathspa.ac.uk/wrl/pages/vacancy.jsf;jsessionid=C4882E8D70D04244661C8A8E811D3290?latest=01001967",
     "https://jobs.bathspa.ac.uk/wrl/pages/vacancy.jsf?latest=01001967"),
    ("https://sa.www4.irs.gov/wmar/start.do;jsessionid=DQnV2P-nFQir0foo7ThxBejZ",
     "https://sa.www4.irs.gov/wmar/start.do"),
    ("http://www.vineyard2door.com/web/clubs_browse.cfm?CFID=3843950&CFTOKEN=cfd5b9e083fb3e24-03C2F487-DAB8-1365-521658E43AB8A0DC&jsessionid=22D5211D9EB291522DE9A4258ECB94D2.cfusion",
     "http://www.vineyard2door.com/web/clubs_browse.cfm?CFID=3843950&CFTOKEN=cfd5b9e083fb3e24-03C2F487-DAB8-1365-521658E43AB8A0DC"),
    ("http://tbinternet.ohchr.org/_layouts/treatybodyexternal/SessionDetails1.aspx?SessionID=1016&Lang=en",
     "http://tbinternet.ohchr.org/_layouts/treatybodyexternal/SessionDetails1.aspx?SessionID=1016&Lang=en"),
    ("https://collab365.conferencehosts.com/SitePages/sessionDetails.aspx?sessionid=C365117",
     "https://collab365.conferencehosts.com/SitePages/sessionDetails.aspx"),
    ("http://www.urchin.com/download.html?utm_source=newsletter4&utm_medium=email&utm_term=urchin&utm_content=easter&utm_campaign=product",
     "http://www.urchin.com/download.html?utm_source=newsletter4&utm_medium=email&utm_content=easter&utm_campaign=product"),
    ("http://www.mihomes.com/Find-Your-New-Home/Virginia-Homes?utm_source=NewHomesDirectory.com&utm_campaign=referral-division&utm_medium=feed&utm_content=&utm_term=consumer&cookiecheck=true",
     "http://www.mihomes.com/Find-Your-New-Home/Virginia-Homes?utm_source=NewHomesDirectory.com&utm_campaign=referral-division&utm_medium=feed&utm_content=&cookiecheck=true"),
    ("http://www.huffingtonpost.com.au/entry/tiny-moments-happiness_us_56ec1a35e4b084c672200a36?section=australia&utm_hp_ref=healthy-living&utm_hp_ref=au-life&adsSiteOverride=au",
     "http://www.huffingtonpost.com.au/entry/tiny-moments-happiness_us_56ec1a35e4b084c672200a36?section=australia&utm_hp_ref=au-life&adsSiteOverride=au"),
    ("http://maersklinereefer.com/about/merry-christmas/?elqTrackId=786C9D2AE676DEC435B578D75CB0B4FD&elqaid=2666&elqat=2",
     "http://maersklinereefer.com/about/merry-christmas/?elqTrackId=786C9D2AE676DEC435B578D75CB0B4FD&elqaid=2666&elqat=2"),
    ("http://app.reg.techweb.com/e/er?s=2150&lid=25554&elq=00000000000000000000000000000000&elqaid=2294&elqat=2&elqTrackId=3de2badc5d7c4a748bc30253468225fd",
     "http://app.reg.techweb.com/e/er?s=2150&lid=25554&elqaid=2294&elqat=2&elqTrackId=3de2badc5d7c4a748bc30253468225fd"),
    ("http://www.biography.com/people/louis-armstrong-9188912?elq=7fd0dd577ebf4eafa1e73431feee849f&elqCampaignId=2887",
     "http://www.biography.com/people/louis-armstrong-9188912?elqCampaignId=2887"),
    ("https://astro-report.com/lp2.html?pk_campaign=1%20Natal%20Chart%20-%20RDMs&pk_kwd=astrological%20chart%20free&gclid=CPfkwKfP2LgCFcJc3godgSMAHA",
     "https://astro-report.com/lp2.html?pk_campaign=1%20Natal%20Chart%20-%20RDMs&gclid=CPfkwKfP2LgCFcJc3godgSMAHA"),
    ("http://lapprussia.lappgroup.com/kontakty.html?pk_campaign=yadirect-crossselling&pk_kwd=olflex&pk_source=yadirect&pk_medium=cpc&pk_content=olflex&rel=bytib",
     "http://lapprussia.lappgroup.com/kontakty.html?pk_campaign=yadirect-crossselling&pk_source=yadirect&pk_medium=cpc&pk_content=olflex&rel=bytib"),
    ("http://scriptfest.com/session/million-dollar-screenwriting/",
     "http://scriptfest.com/session/million-dollar-screenwriting/"),
    ("http://www.toz-penkala.hr/proizvodi-skolski-pribor?phpsessid=v5bhoda67mhutnqv382q86l4l4",
     "http://www.toz-penkala.hr/proizvodi-skolski-pribor"),
]


@pytest.mark.parametrize("raw,expected", V122_VECTORS)
def test_strip_params_v122_vectors(raw, expected):
    assert norm(raw, strip_params=True) == expected


def test_strip_params_only_removes_one_per_call():
    # reference removes only the first match per set() call
    s = "http://x.com/a?utm_term=query1&utm_source=s12345"
    assert _strip_params_v122(s) == "http://x.com/a?utm_source=s12345"


def test_strip_params_short_value_aborts_whole_strip():
    # Url.cpp:326-328: <5 char value -> early return, nothing stripped
    s = "http://x.com/a?utm_term=q&utm_source=s12345"
    assert _strip_params_v122(s) == s


def test_batch_matches_scalar():
    urls = [v[0] for v in V122_VECTORS] + [None, "", "http://example.com/#frag"]
    out = normalize_batch(urls, add_www=False, strip_params=True, strip_common_file=False)
    for i, u in enumerate(urls):
        if not u:
            assert out["url_norm"][i] is None
            continue
        p = normalize_url(u, strip_params=True)
        assert out["url_norm"][i] == p.url
        assert out["host"][i] == p.host


def test_components():
    p = normalize_url("HTTPS://Sub.Example.CO.UK:8443/a/b.HTML?x=1&y=2")
    assert p.scheme == "https"
    assert p.host == "sub.example.co.uk"
    assert p.port == 8443
    assert p.domain == "example.co.uk"
    assert p.tld == "co.uk"
    assert p.path == "/a/b.HTML"
    assert p.query == "x=1&y=2"
    assert p.path_with_cgi == "/a/b.HTML?x=1&y=2"


# --- v123 path-family session stripping (Url.cpp:330-407, vectors from
# UrlTest.cpp StripParamsOsCommerce / StripParamsXTCommerce) ---------------

V123_VECTORS = [
    # osCAdminID query, repeated occurrences all removed
    ("http://www.nailcosmetics.pl/?osCAdminID=70b4c843a51204ec897136bc04282462"
     "&osCAdminID=70b4c843a51204ec897136bc04282462"
     "&osCAdminID=70b4c843a51204ec897136bc04282462"
     "&osCAdminID=70b4c843a51204ec897136bc04282462",
     "http://www.nailcosmetics.pl/"),
    ("http://ezofit.sk/obchod/admin/categories.php?cPath=205&action=new_product"
     "&osCAdminID=dogjdaa5ogukr5vdtnld0o80r4",
     "http://ezofit.sk/obchod/admin/categories.php?cPath=205&action=new_product"),
    ("http://calisonusa.com/specials.html?osCAdminID=a401c1738f8e361728c7f61e9dd23a31",
     "http://calisonusa.com/specials.html"),
    # osCAdminID path pair (hex32) removed
    ("https://springbankcheese.ca/catalog/advanced_search_result.php/"
     "search_in_description/1/keywords/chardonnay/"
     "osCAdminID/45de8edd68f8bc05e9fde0d2c528a619/sort/3d/page/2",
     "https://springbankcheese.ca/catalog/advanced_search_result.php/"
     "search_in_description/1/keywords/chardonnay/sort/3d/page/2"),
    # no strip: following segment fails the validators
    ("https://springbankcheese.ca/catalog/advanced_search_result.php/"
     "search_in_description/1/keywords/chardonnay/osCAdminID/sort/3d/page/2",
     "https://springbankcheese.ca/catalog/advanced_search_result.php/"
     "search_in_description/1/keywords/chardonnay/osCAdminID/sort/3d/page/2"),
    # osCsid query + path forms
    ("http://www.silversites.net/sweetheart-tree.php?osCsid=4c7154c9159ec1aadfc788a3525e61dd",
     "http://www.silversites.net/sweetheart-tree.php"),
    ("https://www.decent-cigar.com/collectibles.php/osCsid/847ve0olpeu5bs5ujkt9ulrgn0",
     "https://www.decent-cigar.com/collectibles.php"),
    ("http://www.plat.co.jp/shop/catalog/default/language/en/cPath/22/"
     "osCsid/79bdb5fa7557ca04fb46ef1bd706139f/river-lake-fishing-freshwater/",
     "http://www.plat.co.jp/shop/catalog/default/language/en/cPath/22/"
     "river-lake-fishing-freshwater/"),
    # trailing /osCsid/ with empty value
    ("https://www.12stepcds.com/catalog/product_info/products_id/577/osCsid/",
     "https://www.12stepcds.com/catalog/product_info/products_id/577/"),
    # earlier bare osCsid kept (value 'language' invalid), later pair removed
    ("http://www.steviaforyou.com/information.php/info_id/33/stevia-producten/"
     "osCsid/language/nl/osCsid/546bb2d065677b8e53747e81309b2660",
     "http://www.steviaforyou.com/information.php/info_id/33/stevia-producten/"
     "osCsid/language/nl"),
]


@pytest.mark.parametrize("raw,expected", V123_VECTORS)
def test_strip_v123_path_family(raw, expected):
    got = normalize_url(raw, strip_params=True)
    want = normalize_url(expected)
    assert got is not None and want is not None
    assert got.url == want.url
