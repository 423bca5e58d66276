"""Time-travel reads over the snapshot layer (snapshots.read_table —
the Iceberg ``VERSION AS OF`` analogue): an as-of read reconstructs the
exact state an independently-stopped crawl would have committed, prunes
later rounds at the dir level, and degrades to logical (round-column)
filtering across a compaction boundary."""

from __future__ import annotations

from open_source_search_engine_spark.config import CrawlConfig
from open_source_search_engine_spark.corpus import generate_corpus, write_parquet
from open_source_search_engine_spark.pipeline import snapshots as snap
from open_source_search_engine_spark.pipeline.crawl import CrawlRunner


def _wave_rows(df):
    return sorted(tuple(r) for r in df.select(
        "round", "seq_in_round", "uh48", "fetch_at_ms").collect())


def test_as_of_read_equals_shorter_crawl(spark, tmp_path_factory):
    c = generate_corpus(seed=31, n_domains=5, n_urls=90)
    cd = str(tmp_path_factory.mktemp("ttcorpus"))
    write_parquet(c, cd)

    sd_long = str(tmp_path_factory.mktemp("ttlong"))
    CrawlRunner(spark, cd, sd_long, CrawlConfig(max_rounds=6)).run()
    sd_short = str(tmp_path_factory.mktemp("ttshort"))
    CrawlRunner(spark, cd, sd_short, CrawlConfig(max_rounds=3)).run()

    # VERSION AS OF round 2 on the 6-round state == the 3-round crawl
    got = snap.read_table(spark, sd_long, "waves", as_of_round=2)
    want = snap.read_table(spark, sd_short, "waves")
    assert _wave_rows(got) == _wave_rows(want)

    # latest (None) == everything committed
    all_waves = snap.read_table(spark, sd_long, "waves")
    m = snap.load_manifest(sd_long)
    n_committed = sum(n for k, n in m.rows.items()
                      if k.startswith("waves/"))
    assert all_waves.count() == n_committed

    # dir-level pruning: rounds past the target never reach the scan
    files = got.inputFiles()
    assert files and all(
        any(f"round={r}" in f for r in (0, 1, 2)) for f in files)


def test_as_of_read_across_compaction_is_logical(spark, tmp_path_factory):
    c = generate_corpus(seed=37, n_domains=4, n_urls=70)
    cd = str(tmp_path_factory.mktemp("ttccorpus"))
    write_parquet(c, cd)
    sd = str(tmp_path_factory.mktemp("ttcstate"))
    runner = CrawlRunner(spark, cd, sd, CrawlConfig(max_rounds=5))
    runner.run()

    before = snap.read_table(spark, sd, "requests", as_of_round=2)
    before_uh = {r["uh48"] for r in before.select("uh48").collect()}
    runner.compact()

    # post-compaction: the folded generation filters on the row-level
    # round column — every uh48 first seen by round 2 is still there,
    # none first seen later leaks in
    after = snap.read_table(spark, sd, "requests", as_of_round=2)
    after_uh = {r["uh48"] for r in after.select("uh48").collect()}
    assert after_uh == before_uh
    assert after.filter(after["round"] > 2).count() == 0

    # waves are never compacted: exact reconstruction either side
    w_before = snap.read_table(spark, sd, "waves", as_of_round=1)
    assert w_before.filter(w_before["round"] > 1).count() == 0


def test_read_table_empty_states(spark, tmp_path_factory):
    sd = str(tmp_path_factory.mktemp("ttempty"))
    assert snap.read_table(spark, sd, "waves") is None          # no manifest
    m = snap.Manifest()
    snap.commit_manifest(sd, m)
    assert snap.read_table(spark, sd, "waves") is None          # no rounds
