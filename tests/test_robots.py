"""robots.txt grammar tests mirroring the reference suite's coverage
(`test/unit/RobotsTest.cpp`, `RobotRuleTest.cpp`, `Robots.cpp`,
`RobotRule.cpp`)."""

import os

import pytest

from open_source_search_engine_spark.functions.robots import (
    CompiledRobots,
    parse_robots,
    percent_normalize,
    robots_allowed_batch,
    crawl_delay_batch,
)

UA = "GigablastOpenSource"


def compiled(txt: str, ua: str = UA) -> CompiledRobots:
    return parse_robots(txt, ua)


class TestGroups:
    def test_empty_allows_everything(self):
        r = compiled("")
        assert r.is_allowed("/anything")
        assert r.crawl_delay_ms() == -1

    def test_default_group(self):
        r = compiled("User-agent: *\nDisallow: /private")
        assert not r.is_allowed("/private/x")
        assert r.is_allowed("/public")

    def test_specific_ua_overrides_default(self):
        # Robots.cpp:343-353: specific group replaces the default entirely
        txt = (
            "User-agent: *\nDisallow: /\n\n"
            f"User-agent: {UA}\nDisallow: /only-this\n"
        )
        r = compiled(txt)
        assert r.is_allowed("/anything")
        assert not r.is_allowed("/only-this/x")

    def test_ua_prefix_match(self):
        # Robots.cpp:158: value must start with our UA
        r = compiled(f"User-agent: {UA}Bot/1.0\nDisallow: /x")
        assert r.ua_found
        assert not r.is_allowed("/x")

    def test_ua_case_insensitive(self):
        r = compiled(f"USER-AGENT: {UA.upper()}\nDISALLOW: /x")
        assert not r.is_allowed("/x")

    def test_consecutive_ua_lines_share_group(self):
        # Robots.cpp:289-297: multiple UA lines before records -> one group
        txt = f"User-agent: otherbot\nUser-agent: {UA}\nDisallow: /x\n"
        r = compiled(txt)
        assert not r.is_allowed("/x")

    def test_ua_line_after_records_closes_group(self):
        txt = (
            f"User-agent: {UA}\nDisallow: /x\n"
            "User-agent: otherbot\nDisallow: /y\n"
        )
        r = compiled(txt)
        assert not r.is_allowed("/x")
        assert r.is_allowed("/y")

    def test_rules_outside_any_group_ignored(self):
        r = compiled("Disallow: /x\nUser-agent: *\nDisallow: /y")
        assert r.is_allowed("/x")
        assert not r.is_allowed("/y")


class TestPrecedence:
    def test_longest_path_wins(self):
        # Robots.cpp:306-311 sort by length desc
        txt = "User-agent: *\nDisallow: /folder\nAllow: /folder/page.html"
        r = compiled(txt)
        assert r.is_allowed("/folder/page.html")
        assert not r.is_allowed("/folder/other")

    def test_longest_wins_regardless_of_order(self):
        txt = "User-agent: *\nAllow: /folder/page.html\nDisallow: /folder"
        r = compiled(txt)
        assert r.is_allowed("/folder/page.html")
        assert not r.is_allowed("/folder/other")

    def test_default_allow(self):
        r = compiled("User-agent: *\nDisallow: /a")
        assert r.is_allowed("/b")

    def test_empty_disallow_value_ignored(self):
        # parsePath only records non-empty values (Robots.cpp:203-216)
        r = compiled("User-agent: *\nDisallow:\nDisallow: /a")
        assert not r.is_allowed("/a/x")
        assert r.is_allowed("/b")


class TestWildcards:
    def test_star_middle(self):
        r = compiled("User-agent: *\nDisallow: /a/*/secret")
        assert not r.is_allowed("/a/x/secret")
        assert not r.is_allowed("/a/x/y/secretzzz")
        assert r.is_allowed("/a/secret")

    def test_star_collapses(self):
        r = compiled("User-agent: *\nDisallow: /a/**/b")
        assert not r.is_allowed("/a/x/b")

    def test_trailing_star_stripped(self):
        # RobotRule.cpp:16-19
        r = compiled("User-agent: *\nDisallow: /dir*")
        assert not r.is_allowed("/dir/x")
        assert not r.is_allowed("/directory")

    def test_dollar_anchor_exact(self):
        r = compiled("User-agent: *\nDisallow: /page.html$")
        assert not r.is_allowed("/page.html")
        assert r.is_allowed("/page.html?x=1")
        assert r.is_allowed("/page.htmlx")

    def test_dollar_with_wildcard(self):
        r = compiled("User-agent: *\nDisallow: /*.php$")
        assert not r.is_allowed("/a.php")
        assert not r.is_allowed("/dir/b.php")
        assert r.is_allowed("/a.php?x=1")
        assert r.is_allowed("/a.phpx")

    def test_query_is_matched(self):
        # match target is path+?query (Url.h:158-166)
        r = compiled("User-agent: *\nDisallow: /*?print=1")
        assert not r.is_allowed("/article?print=1")
        assert r.is_allowed("/article")


class TestPercentNormalize:
    def test_unreserved_decoded(self):
        assert percent_normalize("/%61bc") == "/abc"

    def test_reserved_uppercased(self):
        assert percent_normalize("/a%2fb") == "/a%2Fb"

    def test_bare_percent_encoded(self):
        assert percent_normalize("/a%") == "/a%25"

    def test_rule_with_percent(self):
        r = compiled("User-agent: *\nDisallow: /%7Euser")
        assert not r.is_allowed("/~user/x")


class TestCrawlDelay:
    def test_float_seconds_to_ms(self):
        r = compiled("User-agent: *\nCrawl-delay: 1.5")
        assert r.crawl_delay_ms() == 1500

    def test_specific_overrides_default(self):
        txt = (
            "User-agent: *\nCrawl-delay: 30\n\n"
            f"User-agent: {UA}\nCrawl-delay: 0.5\nDisallow: /x\n"
        )
        assert compiled(txt).crawl_delay_ms() == 500

    def test_specific_group_without_delay_hides_default_delay(self):
        # Robots.cpp:391-404: ua group found -> its (unset) delay wins
        txt = (
            "User-agent: *\nCrawl-delay: 30\n\n"
            f"User-agent: {UA}\nDisallow: /x\n"
        )
        assert compiled(txt).crawl_delay_ms() == -1

    def test_invalid_delay_ignored(self):
        r = compiled("User-agent: *\nCrawl-delay: 10abc")
        assert r.crawl_delay_ms() == -1


class TestLineHandling:
    def test_comments_stripped(self):
        r = compiled("User-agent: * # all bots\nDisallow: /a # comment")
        assert not r.is_allowed("/a/x")

    def test_crlf(self):
        r = compiled("User-agent: *\r\nDisallow: /a\r\n")
        assert not r.is_allowed("/a")

    def test_whitespace_around_field_and_value(self):
        r = compiled("  User-agent :  *  \n  Disallow :  /a  ")
        assert not r.is_allowed("/a")


class TestBatch:
    def test_batch_allowed_and_delay(self):
        txt = "User-agent: *\nDisallow: /no\nCrawl-delay: 2"
        allowed = robots_allowed_batch([txt, txt, "", None], ["/no/1", "/yes", "/x", "/y"], UA)
        assert allowed == [False, True, True, True]
        delays = crawl_delay_batch([txt, "", None], UA)
        assert delays == [2000, -1, -1]


REF_CORPUS = "/root/reference/test/unit/robots"


@pytest.mark.skipif(not os.path.isdir(REF_CORPUS), reason="reference corpus absent")
def test_real_site_corpus_parses():
    """Smoke over the reference's real-site fixtures: parse deterministically,
    produce sane verdicts for a probe set."""
    for name in sorted(os.listdir(REF_CORPUS)):
        with open(os.path.join(REF_CORPUS, name), "rb") as fh:
            body = fh.read().decode("utf-8", "replace")
        r1 = parse_robots(body, UA)
        r2 = parse_robots(body, UA)
        for probe in ["/", "/index.html", "/wiki/Special:Random", "/search?q=x"]:
            assert r1.is_allowed(probe) == r2.is_allowed(probe)
        assert r1.crawl_delay_ms() == r2.crawl_delay_ms()


@pytest.mark.skipif(not os.path.isdir(REF_CORPUS), reason="reference corpus absent")
def test_wikipedia_corpus_specifics():
    with open(os.path.join(REF_CORPUS, "wikipedia.org"), "rb") as fh:
        body = fh.read().decode("utf-8", "replace")
    r = parse_robots(body, "anybot")
    # wikipedia disallows /w/ and api paths for all UAs, allows articles
    assert r.is_allowed("/wiki/Spark")
    assert not r.is_allowed("/w/index.php?title=X")
