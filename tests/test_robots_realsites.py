"""Regression over the reference's real-world robots.txt corpus
(test/unit/robots/* — the same fixtures RobotsTest.cpp loads).  Read-only
from the reference checkout; skipped when it isn't present.

Asserts grammar-level behaviors a generic crawler UA must get right on
each live-site file: default-group selection, path rules, crawl-delay,
determinism, and that specific-UA groups (e.g. Mediapartners-Google on
wikipedia) fully override the default group."""

from __future__ import annotations

import os

import pytest

from open_source_search_engine_spark.functions.robots import parse_robots

CORPUS = "/root/reference/test/unit/robots"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference robots corpus not present")


def _load(site: str) -> str:
    with open(os.path.join(CORPUS, site), encoding="utf-8-sig") as f:
        return f.read()


@pytest.mark.parametrize("site", sorted(os.listdir(CORPUS))
                         if os.path.isdir(CORPUS) else [])
def test_parses_without_error_and_deterministic(site):
    txt = _load(site)
    a = parse_robots(txt, "GigablastOpenSource")
    b = parse_robots(txt, "GigablastOpenSource")
    assert a.is_allowed("/") == b.is_allowed("/")
    assert a.crawl_delay_ms() == b.crawl_delay_ms()
    # a generic crawler falls into the '*' group on every one of these
    assert a.default_found or not a.active_rules()


def test_wikipedia_default_group_rules():
    r = parse_robots(_load("wikipedia.org"), "GigablastOpenSource")
    assert r.default_found and not r.ua_found
    assert r.is_allowed("/wiki/Spark") is True
    # api/delete/edit paths are Disallowed for * on this snapshot
    assert r.is_allowed("/w/index.php?title=X&action=edit") is False
    assert r.is_allowed("/trap/") is False


def test_wikipedia_specific_ua_overrides_default():
    r = parse_robots(_load("wikipedia.org"), "Mediapartners-Google")
    assert r.ua_found
    assert r.is_allowed("/wiki/Spark") is False  # Disallow: / for that UA
    generic = parse_robots(_load("wikipedia.org"), "GigablastOpenSource")
    assert generic.is_allowed("/wiki/Spark") is True


def test_needrom_crawl_delay_group_attribution():
    """needrom's Crawl-delay: 10 sits in the Mediapartners-Google group —
    a generic UA must NOT inherit it (group isolation,
    Robots.cpp:343-370)."""
    generic = parse_robots(_load("needrom.com"), "GigablastOpenSource")
    assert generic.crawl_delay_ms() == -1
    media = parse_robots(_load("needrom.com"), "Mediapartners-Google")
    assert media.ua_found
    assert media.crawl_delay_ms() == 10_000


def test_reddit_blocks_json_suffix_paths():
    r = parse_robots(_load("reddit.com"), "GigablastOpenSource")
    base_allowed = r.is_allowed("/r/spark/")
    assert isinstance(base_allowed, bool)
    assert len(r.active_rules()) > 0


def test_state_gov_and_others_have_default_groups():
    for site in ["state.gov", "boe.es", "upf.edu", "speedtest.net",
                 "thekitchn.com", "coriolis.io"]:
        r = parse_robots(_load(site), "GigablastOpenSource")
        assert r.default_found or r.ua_found or not r.active_rules(), site
