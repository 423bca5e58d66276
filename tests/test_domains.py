"""Domain/TLD split vectors — the exact Domains.cpp ladder.

Pins functions/domains.py against the reference semantics:
getTLD (Domains.cpp:53-97), getDomain (Domains.cpp:24-51),
getDomainOfIp (Domains.cpp:9-22), isTLD (Domains.cpp:105-120 + the
s_tlds table).  Vector expectations hand-traced from the C walk.
"""

from open_source_search_engine_spark.functions.domains import (
    DOTTED_TLDS, get_domain, get_domain_of_ip, get_tld, is_tld)
from open_source_search_engine_spark.functions.urlnorm import domain_of_host


class TestIsTLD:
    def test_single_label_always_tld(self):
        # Domains.cpp:115 — zero periods -> any alnum/hyphen label passes
        assert is_tld("com")
        assert is_tld("xyz")
        assert is_tld("madeupnonsense")
        assert is_tld("x--y9")

    def test_invalid_chars_rejected(self):
        assert not is_tld("co_m")
        assert not is_tld("co m")
        assert not is_tld("")

    def test_dotted_needs_table(self):
        assert is_tld("co.uk")
        assert is_tld("CO.UK")          # table lookup is case-folded
        assert is_tld("com.au")
        assert not is_tld("me.uk")      # NOT in s_tlds
        assert not is_tld("ne.jp")      # NOT in s_tlds
        assert not is_tld("random.xyz")

    def test_two_periods_never(self):
        # Domains.cpp:116 — even lkd.co.im (listed!) is dead code
        assert not is_tld("lkd.co.im")
        assert not is_tld("a.b.c")

    def test_table_shape(self):
        # every table entry has exactly one period and is lowercase
        for t in DOTTED_TLDS:
            assert t.count(".") == 1 and t == t.lower()


class TestGetTLD:
    def test_plain(self):
        assert get_tld("www.example.com") == "com"

    def test_two_label_wins(self):
        assert get_tld("shop.example.co.uk") == "co.uk"
        assert get_tld("example.com.au") == "com.au"

    def test_unlisted_two_label_falls_back(self):
        assert get_tld("example.me.uk") == "uk"
        assert get_tld("foo.ne.jp") == "jp"

    def test_host_is_tld(self):
        # getTLD returns the whole host; getDomain then yields None
        assert get_tld("com") == "com"
        assert get_tld("co.uk") == "co.uk"

    def test_invalid_last_label_still_tries_two(self):
        # one-label check fails (underscore) but the walk continues
        assert get_tld("x.co_m") is None
        assert get_tld("localhost") == "localhost"


class TestGetDomain:
    def test_strips_subdomains(self):
        assert get_domain("a.b.example.com", "com") == "example.com"
        assert get_domain("deep.shop.x.co.uk", "co.uk") == "x.co.uk"

    def test_host_equals_domain(self):
        assert get_domain("example.com", "com") == "example.com"

    def test_host_is_tld_none(self):
        assert get_domain("com", "com") is None
        assert get_domain("co.uk", "co.uk") is None


class TestGetDomainOfIp:
    def test_cblock(self):
        # Domains.cpp:9-22 — everything before the last period
        assert get_domain_of_ip("1.2.3.4") == "1.2.3"

    def test_no_period(self):
        assert get_domain_of_ip("1234") is None


class TestDomainOfHost:
    def test_regular(self):
        assert domain_of_host("www.example.com") == "example.com"
        assert domain_of_host("a.b.site.org.uk") == "site.org.uk"

    def test_ip_cblock(self):
        assert domain_of_host("10.20.30.40") == "10.20.30"

    def test_tld_only(self):
        assert domain_of_host("com") == ""
        assert domain_of_host("co.uk") == ""

    def test_empty(self):
        assert domain_of_host("") == ""
