"""Zero-fetch crawls are legitimate outcomes, not crashes (VERDICT r2 #4).

Two degenerate states every accessor must survive with schema-correct
EMPTY frames:

1. an all-seeds-robots-blocked crawl (requests committed, zero waves) —
   the reference's analogue is a collection whose url filters / robots
   reject everything: SpiderLoop just never doles (SpiderLoop.cpp:369+),
   it does not abort;
2. a state dir with no manifest at all (crawl never ran).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def blocked_runner(spark, tmp_path_factory):
    from open_source_search_engine_spark.config import CrawlConfig
    from open_source_search_engine_spark.corpus import (generate_corpus,
                                                        write_parquet)
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    # n_domains=6 so every trap-seed host (www.a0..a3) exists in the hosts
    # dim — an unknown host has no robots.txt and is fetchable by design
    c = generate_corpus(seed=77, n_domains=6, n_urls=60)
    for h in c.hosts:
        h["robots_txt"] = "User-agent: *\nDisallow: /\n"
        h["robots_txt_after"] = None
    cd = str(tmp_path_factory.mktemp("blocked_corpus"))
    sd = str(tmp_path_factory.mktemp("blocked_state"))
    write_parquet(c, cd)
    runner = CrawlRunner(spark, cd, sd, CrawlConfig(max_rounds=3))
    runner.run()
    yield runner
    runner.close()


def test_blocked_crawl_completes_and_accessors_are_empty(blocked_runner):
    r = blocked_runner
    order = r.crawl_order()
    assert order.count() == 0
    assert order.columns == ["round", "seq_in_round", "uh48", "url_norm",
                             "first_ip", "priority", "hop_count",
                             "fetch_at_ms"]
    # seeds WERE ingested (robots blocks fetching, not logging), so
    # url_seen reflects the seed set; nothing was ever fetched
    seen = r.url_seen()
    assert seen.count() > 0
    assert seen.columns == ["uh48", "url_norm", "first_seen_round"]
    assert r.crawl_stats().count() == 0
    assert r.host_final().count() == 0
    assert r.link_graph().count() == 0
    assert r.indexed_docs().count() == 0
    # compaction over a wave-less state must be safe too
    r.compact()
    assert r.url_seen().count() == seen.count()


def test_never_run_state_dir_accessors_are_empty(spark, tmp_path_factory):
    from open_source_search_engine_spark.config import CrawlConfig
    from open_source_search_engine_spark.corpus import (generate_corpus,
                                                        write_parquet)
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    c = generate_corpus(seed=78, n_domains=3, n_urls=30)
    cd = str(tmp_path_factory.mktemp("norun_corpus"))
    sd = str(tmp_path_factory.mktemp("norun_state"))
    write_parquet(c, cd)
    runner = CrawlRunner(spark, cd, sd, CrawlConfig(max_rounds=1))
    try:
        assert runner.crawl_order().count() == 0
        assert runner.url_seen().count() == 0
        assert runner.url_seen().columns == ["uh48", "url_norm",
                                             "first_seen_round"]
        assert runner.crawl_stats().count() == 0
        assert runner.host_final().count() == 0
        assert runner.link_graph().count() == 0
        assert runner.link_graph().columns == ["src", "dst"]
        assert runner.indexed_docs().count() == 0
        runner.compact()     # no manifest: documented no-op
    finally:
        runner.close()
