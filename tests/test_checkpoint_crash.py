"""Crash-consistency of the snapshot layer: uncommitted files from a
'crashed' round are invisible to resume, vacuum removes them, and the
resumed crawl still matches the oracle byte-for-byte."""

from __future__ import annotations

import os

import pytest

from open_source_search_engine_spark.config import CrawlConfig
from open_source_search_engine_spark.corpus import generate_corpus, write_parquet
from open_source_search_engine_spark.oracle import run_oracle
from open_source_search_engine_spark.pipeline import snapshots as snap
from open_source_search_engine_spark.pipeline.crawl import CrawlRunner


@pytest.mark.slow
def test_orphan_files_ignored_and_vacuumed(spark, tmp_path_factory):
    cfg = CrawlConfig(max_rounds=7)
    c = generate_corpus(seed=23, n_domains=5, n_urls=90)
    cd = str(tmp_path_factory.mktemp("xcorpus"))
    sd = str(tmp_path_factory.mktemp("xstate"))
    write_parquet(c, cd)

    runner = CrawlRunner(spark, cd, sd, cfg)
    runner.run(max_rounds=3)

    # simulate a crash mid-round-3: data written but manifest NOT committed
    orphan = snap.round_dir(sd, "requests", 99)
    os.makedirs(orphan)
    spark.range(50).selectExpr("id as junk").write.mode("overwrite") \
        .parquet(orphan)
    orphan_wave = snap.round_dir(sd, "waves", 98)
    os.makedirs(orphan_wave)
    with open(os.path.join(orphan_wave, "part-corrupt.parquet"), "wb") as f:
        f.write(b"not parquet at all")

    # resume: orphans must be invisible (manifest-driven reads)
    runner2 = CrawlRunner(spark, cd, sd, cfg)
    runner2.run()
    want = run_oracle(c, cfg)
    got = sorted(tuple(r) for r in runner2.crawl_order()
                 .select("round", "seq_in_round", "uh48", "url_norm",
                         "first_ip", "priority", "hop_count",
                         "fetch_at_ms").collect())
    want_rows = sorted(
        (r["round"], r["seq_in_round"], r["uh48"], r["url_norm"],
         r["first_ip"], r["priority"], r["hop_count"], r["fetch_at_ms"])
        for r in want.crawl_order)
    assert got == want_rows

    # table-scoped vacuum (through the TableFormat seam) touches ONLY the
    # named table: the waves orphan must survive a requests-only pass
    from open_source_search_engine_spark.pipeline.tableformat import (
        ManifestParquetFormat)
    fmt = ManifestParquetFormat(sd)
    m = snap.load_manifest(sd)
    removed = fmt.vacuum(m, tables=("requests",))
    assert any("round=99" in p for p in removed)
    assert not any("round=98" in p for p in removed)
    assert not os.path.exists(orphan)
    assert os.path.exists(orphan_wave)

    # full vacuum removes the remaining unreferenced dirs
    removed = snap.vacuum(sd, m)
    assert any("round=98" in p for p in removed)
    assert not os.path.exists(orphan_wave)
    # committed data untouched; outputs still readable and identical
    got2 = sorted(tuple(r) for r in runner2.crawl_order()
                  .select("round", "seq_in_round", "uh48", "url_norm",
                          "first_ip", "priority", "hop_count",
                          "fetch_at_ms").collect())
    assert got2 == got


def test_vacuum_after_compaction(spark, tmp_path_factory):
    cfg = CrawlConfig(max_rounds=4)
    c = generate_corpus(seed=29, n_domains=4, n_urls=60)
    cd = str(tmp_path_factory.mktemp("vcorpus"))
    sd = str(tmp_path_factory.mktemp("vstate"))
    write_parquet(c, cd)
    runner = CrawlRunner(spark, cd, sd, cfg)
    runner.run()
    before = runner.url_seen().count()
    runner.compact()
    m = snap.load_manifest(sd)
    removed = snap.vacuum(sd, m)
    assert removed, "pre-compaction round dirs should be reclaimed"
    assert runner.url_seen().count() == before


def test_verify_integrity_detects_missing_files(spark, tmp_path_factory):
    import glob
    cfg = CrawlConfig(max_rounds=3)
    c = generate_corpus(seed=37, n_domains=4, n_urls=50)
    cd = str(tmp_path_factory.mktemp("icorpus"))
    sd = str(tmp_path_factory.mktemp("istate"))
    write_parquet(c, cd)
    CrawlRunner(spark, cd, sd, cfg).run()
    assert snap.verify_integrity(sd) == []
    victim = glob.glob(os.path.join(sd, "waves", "round=0", "*.parquet"))[0]
    os.remove(victim)
    problems = snap.verify_integrity(sd)
    assert any("waves/0" in p for p in problems)
