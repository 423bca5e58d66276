"""Round-boundary parity: Spark pipeline == Python oracle (FIXTURES.md §6).

Asserts, in order of strictness:
1. url_seen set equality (exact, after full crawl)
2. crawl_order equality on every column, every row
3. host_final equality
4. politeness: within-IP fetch_at spacing >= the scheduling delay budget
"""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.config import CrawlConfig
from open_source_search_engine_spark.corpus import generate_corpus, write_parquet
from open_source_search_engine_spark.oracle import run_oracle


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    c = generate_corpus(seed=7, n_domains=8, n_urls=160)
    d = tmp_path_factory.mktemp("corpus")
    write_parquet(c, str(d))
    return c, str(d)


@pytest.fixture(scope="module")
def cfg():
    return CrawlConfig(max_rounds=14)


@pytest.fixture(scope="module")
def oracle_out(small_corpus, cfg):
    c, _ = small_corpus
    return run_oracle(c, cfg)


@pytest.fixture(scope="module")
def spark_out(spark, small_corpus, cfg, tmp_path_factory):
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    _, corpus_dir = small_corpus
    state = str(tmp_path_factory.mktemp("state"))
    runner = CrawlRunner(spark, corpus_dir, state, cfg)
    runner.run()
    return runner


def test_crawl_order_exact(oracle_out, spark_out):
    got = sorted(
        (tuple(r) for r in spark_out.crawl_order()
         .select("round", "seq_in_round", "uh48", "url_norm", "first_ip",
                 "priority", "hop_count", "fetch_at_ms").collect()))
    want = sorted(
        (r["round"], r["seq_in_round"], r["uh48"], r["url_norm"],
         r["first_ip"], r["priority"], r["hop_count"], r["fetch_at_ms"])
        for r in oracle_out.crawl_order)
    assert len(got) == len(want)
    assert got == want


def test_url_seen_set(oracle_out, spark_out):
    got = {(r["uh48"], r["url_norm"], r["first_seen_round"])
           for r in spark_out.url_seen().collect()}
    want = {(r["uh48"], r["url_norm"], r["first_seen_round"])
            for r in oracle_out.url_seen}
    assert got == want


def test_host_final(oracle_out, spark_out):
    got = {(r["first_ip"], r["last_download_end_ms"], r["crawl_delay_ms"])
           for r in spark_out.host_final().collect()}
    want = {(r["first_ip"], r["last_download_end_ms"], r["crawl_delay_ms"])
            for r in oracle_out.host_final}
    assert got == want


def test_politeness_spacing(oracle_out):
    """Within (round, first_ip), consecutive fetch_at gaps must be >= the
    politeness budget: >= sameIpWait (1000 ms privacore default) always."""
    from collections import defaultdict
    by = defaultdict(list)
    for r in oracle_out.crawl_order:
        by[(r["round"], r["first_ip"])].append(r["fetch_at_ms"])
    checked = 0
    for times in by.values():
        times.sort()
        for a, b in zip(times, times[1:]):
            assert b - a >= 1000
            checked += 1
    assert checked > 0


def test_compaction_preserves_crawl(spark, small_corpus, cfg, oracle_out,
                                    tmp_path_factory):
    """Run 4 rounds → compact (F7 rewrite) → resume to completion: outputs
    must still match the oracle byte-for-byte (compaction is a physical
    rewrite, never a semantic change)."""
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    _, corpus_dir = small_corpus
    state = str(tmp_path_factory.mktemp("cstate"))
    runner = CrawlRunner(spark, corpus_dir, state, cfg)
    runner.run(max_rounds=4)
    runner.compact()
    runner.run()
    got = sorted(tuple(r) for r in runner.crawl_order()
                 .select("round", "seq_in_round", "uh48", "url_norm",
                         "first_ip", "priority", "hop_count",
                         "fetch_at_ms").collect())
    want = sorted(
        (r["round"], r["seq_in_round"], r["uh48"], r["url_norm"],
         r["first_ip"], r["priority"], r["hop_count"], r["fetch_at_ms"])
        for r in oracle_out.crawl_order)
    assert got == want
    got_seen = {(r["uh48"], r["first_seen_round"])
                for r in runner.url_seen().collect()}
    want_seen = {(r["uh48"], r["first_seen_round"])
                 for r in oracle_out.url_seen}
    assert got_seen == want_seen


def test_crawl_discovers_beyond_seeds(oracle_out, small_corpus):
    c, _ = small_corpus
    assert len(oracle_out.url_seen) > len(c.seeds)
    assert len(oracle_out.crawl_order) > 50


def test_crawl_completion_detection(spark, tmp_path_factory):
    """F26: with a drain-style ladder (no respider rules inside the
    horizon), the crawl must reach finished=True — every discovered URL
    fetched or permanently filtered, nothing eligible within the clock-
    jump horizon (SpiderLoop.cpp:2107-2136 SP_ROUNDDONE)."""
    from open_source_search_engine_spark.config import (CrawlConfig,
                                                        UrlFilterRule)
    from open_source_search_engine_spark.corpus import (generate_corpus,
                                                        write_parquet)
    from open_source_search_engine_spark.oracle import run_oracle
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    drain_ladder = [
        UrlFilterRule("errorcount>=2 && hastmperror", 3, 1.0, 1, 1000, 1,
                      force_delete=True),
        UrlFilterRule("errorcount>=1 && hastmperror", 45, 2e-5, 1, 1000, 1),
        UrlFilterRule("errorcount>=1", 2, 5.0, 1, 1000, 1,
                      force_delete=True),
        UrlFilterRule("hasreply", 40, 30.0, 9, 1000, 7),  # respider: 30 d
        UrlFilterRule("default", 10, 60.0, 99, 1000, 7),
    ]
    cfg = CrawlConfig(max_rounds=40, url_filters=drain_ladder)
    c = generate_corpus(seed=17, n_domains=4, n_urls=60)
    cd = str(tmp_path_factory.mktemp("dcorpus"))
    sd = str(tmp_path_factory.mktemp("dstate"))
    write_parquet(c, cd)
    runner = CrawlRunner(spark, cd, sd, cfg)
    m = runner.run()
    assert m.finished, "drain ladder must reach crawl completion"
    want = run_oracle(c, cfg)
    got_seen = {(r["uh48"], r["first_seen_round"])
                for r in runner.url_seen().collect()}
    want_seen = {(r["uh48"], r["first_seen_round"]) for r in want.url_seen}
    assert got_seen == want_seen
    got = sorted(tuple(r) for r in runner.crawl_order()
                 .select("round", "seq_in_round", "uh48", "url_norm",
                         "first_ip", "priority", "hop_count",
                         "fetch_at_ms").collect())
    want_rows = sorted(
        (r["round"], r["seq_in_round"], r["uh48"], r["url_norm"],
         r["first_ip"], r["priority"], r["hop_count"], r["fetch_at_ms"])
        for r in want.crawl_order)
    assert got == want_rows
