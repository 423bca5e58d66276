"""Time-travel reads through the TableFormat seam (the Iceberg
``VERSION AS OF`` analogue), parametrized over BOTH backends (manifest
store + directory commit log): an as-of read reconstructs the exact
state an independently-stopped crawl would have committed, prunes later
rounds at the dir level, and degrades to logical (round-column)
filtering across a compaction boundary."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.config import CrawlConfig
from open_source_search_engine_spark.corpus import generate_corpus, write_parquet
from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
from open_source_search_engine_spark.pipeline.tableformat import (
    DirectoryLogFormat, ManifestParquetFormat)

BACKENDS = ["manifest", "dirlog"]


def make_fmt(kind: str, state_dir: str):
    return (ManifestParquetFormat(state_dir) if kind == "manifest"
            else DirectoryLogFormat(state_dir))


def _wave_rows(df):
    return sorted(tuple(r) for r in df.select(
        "round", "seq_in_round", "uh48", "fetch_at_ms").collect())


@pytest.mark.parametrize("backend", BACKENDS)
def test_as_of_read_equals_shorter_crawl(spark, tmp_path_factory, backend):
    c = generate_corpus(seed=31, n_domains=5, n_urls=90)
    cd = str(tmp_path_factory.mktemp("ttcorpus"))
    write_parquet(c, cd)

    sd_long = str(tmp_path_factory.mktemp("ttlong"))
    CrawlRunner(spark, cd, sd_long, CrawlConfig(max_rounds=6),
                table_format=make_fmt(backend, sd_long)).run()
    sd_short = str(tmp_path_factory.mktemp("ttshort"))
    CrawlRunner(spark, cd, sd_short, CrawlConfig(max_rounds=3),
                table_format=make_fmt(backend, sd_short)).run()

    # VERSION AS OF round 2 on the 6-round state == the 3-round crawl
    fmt_long = make_fmt(backend, sd_long)
    got = fmt_long.read(spark, "waves", as_of=2)
    want = make_fmt(backend, sd_short).read(spark, "waves")
    assert _wave_rows(got) == _wave_rows(want)

    # latest (None) == everything committed
    all_waves = fmt_long.read(spark, "waves")
    m = fmt_long.load()
    n_committed = sum(n for k, n in m.rows.items()
                      if k.startswith("waves/"))
    assert all_waves.count() == n_committed

    # dir-level pruning: rounds past the target never reach the scan
    files = got.inputFiles()
    early = {fmt_long.data_path("waves", r).rstrip("/").split("/")[-1]
             for r in (0, 1, 2)}
    assert files and all(any(f"/{d}/" in f for d in early) for f in files)


@pytest.mark.parametrize("backend", BACKENDS)
def test_as_of_read_across_compaction_is_logical(spark, tmp_path_factory,
                                                 backend):
    c = generate_corpus(seed=37, n_domains=4, n_urls=70)
    cd = str(tmp_path_factory.mktemp("ttccorpus"))
    write_parquet(c, cd)
    sd = str(tmp_path_factory.mktemp("ttcstate"))
    runner = CrawlRunner(spark, cd, sd, CrawlConfig(max_rounds=5),
                         table_format=make_fmt(backend, sd))
    runner.run()

    fmt = make_fmt(backend, sd)
    before = fmt.read(spark, "requests", as_of=2)
    before_uh = {r["uh48"] for r in before.select("uh48").collect()}
    runner.compact()

    # post-compaction: the folded generation filters on the row-level
    # round column — every uh48 first seen by round 2 is still there,
    # none first seen later leaks in
    after = make_fmt(backend, sd).read(spark, "requests", as_of=2)
    after_uh = {r["uh48"] for r in after.select("uh48").collect()}
    assert after_uh == before_uh
    assert after.filter(after["round"] > 2).count() == 0

    # waves are never compacted: exact reconstruction either side
    w_before = make_fmt(backend, sd).read(spark, "waves", as_of=1)
    assert w_before.filter(w_before["round"] > 1).count() == 0


@pytest.mark.parametrize("backend", BACKENDS)
def test_read_table_empty_states(spark, tmp_path_factory, backend):
    sd = str(tmp_path_factory.mktemp("ttempty"))
    fmt = make_fmt(backend, sd)
    assert fmt.read(spark, "waves") is None           # nothing committed
    fmt.load()
    fmt.commit(fmt.begin())
    assert make_fmt(backend, sd).read(spark, "waves") is None  # no rounds
