"""Multi-collection round-robin (SpiderLoop.cpp:503-539): fairness of the
rotation and byte-identical isolation vs running each collection alone."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.config import CrawlConfig
from open_source_search_engine_spark.corpus import (generate_corpus,
                                                    write_parquet)
from open_source_search_engine_spark.oracle import run_oracle
from open_source_search_engine_spark.pipeline.multicoll import (
    MultiCrawlRunner)


@pytest.mark.slow
def test_round_robin_fairness_and_isolation(spark, tmp_path_factory):
    corpora = {
        "alpha": generate_corpus(seed=17, n_domains=4, n_urls=60),
        "beta": generate_corpus(seed=23, n_domains=3, n_urls=40),
    }
    cfg = CrawlConfig(max_rounds=6)   # bounded: compare the 6-round prefix
    multi = MultiCrawlRunner(spark)
    for name, c in corpora.items():
        cd = str(tmp_path_factory.mktemp(f"{name}_corpus"))
        sd = str(tmp_path_factory.mktemp(f"{name}_state"))
        write_parquet(c, cd)
        multi.add_collection(name, cd, sd, cfg)
    launches = multi.run(max_passes=6)

    # fairness: while both collections are active, every pass launches
    # each exactly once, in rotation order (no starvation)
    names = [l.collection for l in launches]
    n_beta = names.count("beta")
    both_active = names[: 2 * min(names.count("alpha"), n_beta)]
    assert both_active[::2] == ["alpha"] * (len(both_active) // 2)
    assert both_active[1::2] == ["beta"] * (len(both_active) // 2)

    # per-collection rounds are strictly sequential
    for name in corpora:
        rounds = [l.round for l in launches if l.collection == name]
        assert rounds == list(range(len(rounds)))
        assert len(rounds) == 6

    # isolation: interleaved run == the single-collection oracle, per coll
    for name, c in corpora.items():
        want = run_oracle(c, cfg)
        got = sorted(tuple(r) for r in
                     multi.runners[name].crawl_order().collect())
        want_rows = sorted(
            (r["round"], r["seq_in_round"], r["uh48"], r["url_norm"],
             r["first_ip"], r["priority"], r["hop_count"], r["fetch_at_ms"])
            for r in want.crawl_order)
        assert got == want_rows, name
