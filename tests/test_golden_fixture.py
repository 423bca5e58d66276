"""Committed golden fixture: the oracle must reproduce the stored
crawl_order/url_seen/host_final byte-for-byte for the fixed corpus.
Catches accidental semantic drift in the scheduling rules — if a change is
INTENDED to alter crawl semantics, regenerate the fixture in the same
commit and say so."""

from __future__ import annotations

import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "crawl_seed7.json")


def test_oracle_matches_golden():
    from open_source_search_engine_spark.config import CrawlConfig
    from open_source_search_engine_spark.corpus import generate_corpus
    from open_source_search_engine_spark.oracle import run_oracle
    with open(GOLDEN) as f:
        want = json.load(f)
    g = want["corpus"]
    c = generate_corpus(seed=g["seed"], n_domains=g["n_domains"],
                        n_urls=g["n_urls"])
    r = run_oracle(c, CrawlConfig(max_rounds=want["max_rounds"]))
    assert r.crawl_order == want["crawl_order"]
    assert r.url_seen == want["url_seen"]
    assert r.host_final == want["host_final"]
