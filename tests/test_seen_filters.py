"""Bloom + cuckoo URL-seen filter tests (F5 scale path):
- no false negatives ever (a seen key always probes positive)
- false-positive rate sane
- cuckoo supports delete (the TTL-expiry analogue)
- end-to-end: bloom-filtered crawl == oracle (byte-identical outputs)
"""

from __future__ import annotations

import numpy as np
import pytest

from open_source_search_engine_spark.pipeline.seen import (
    CuckooFilter, _build_bitmap, _test_bitmap)


def test_bloom_no_false_negatives():
    rng = np.random.RandomState(1)
    keys = rng.randint(0, 1 << 48, size=50_000).astype(np.int64)
    bitmap, n_bits = _build_bitmap(keys)
    arr = np.frombuffer(bitmap, dtype=np.uint8)
    assert _test_bitmap(keys, arr, n_bits).all()


def test_bloom_false_positive_rate():
    rng = np.random.RandomState(2)
    keys = rng.randint(0, 1 << 48, size=50_000).astype(np.int64)
    other = rng.randint(1 << 48, 1 << 49, size=50_000).astype(np.int64)
    bitmap, n_bits = _build_bitmap(keys)
    arr = np.frombuffer(bitmap, dtype=np.uint8)
    fp = _test_bitmap(other, arr, n_bits).mean()
    assert fp < 0.05


def test_cuckoo_membership_and_delete():
    rng = np.random.RandomState(3)
    keys = rng.randint(0, 1 << 48, size=10_000).astype(np.int64)
    cf = CuckooFilter(capacity=20_000)
    failed = cf.insert_batch(keys)
    assert failed == 0
    assert cf.contains_batch(keys).all()
    other = rng.randint(1 << 48, 1 << 49, size=10_000).astype(np.int64)
    assert cf.contains_batch(other).mean() < 0.02
    half = keys[:5000]
    removed = cf.delete_batch(half)
    assert removed.all()
    assert cf.contains_batch(keys[5000:]).all()  # survivors intact


def test_spark_bloom_build_probe(spark):
    from pyspark.sql import functions as F
    from open_source_search_engine_spark.pipeline.seen import (
        build_bloom, probe_bloom)
    seen = spark.range(20_000).select(
        (F.col("id") * 7919).alias("uh48"),
        (F.col("id") % 37 + 1000).alias("first_ip"))
    bloom_rows = build_bloom(seen).collect()
    assert all(r["n_keys"] > 0 for r in bloom_rows)
    news = spark.range(1_000).select(
        (F.col("id") * 7919).alias("uh48"),          # all seen
        (F.col("id") % 37 + 1000).alias("first_ip"))
    probed = probe_bloom(news, bloom_rows)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # no false negs
    fresh = spark.range(1_000).select(
        (F.col("id") * 7919 + 3).alias("uh48"),      # none seen
        (F.col("id") % 37 + 1000).alias("first_ip"))
    fp = probe_bloom(fresh, bloom_rows).filter("maybe_seen").count()
    assert fp < 100


@pytest.mark.slow
def test_bloom_crawl_matches_oracle(spark, tmp_path_factory):
    """Full crawl with the Bloom-seen path on must equal the oracle."""
    from open_source_search_engine_spark.config import CrawlConfig
    from open_source_search_engine_spark.corpus import (generate_corpus,
                                                        write_parquet)
    from open_source_search_engine_spark.oracle import run_oracle
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    cfg = CrawlConfig(max_rounds=8)
    c = generate_corpus(seed=11, n_domains=6, n_urls=100)
    cd = str(tmp_path_factory.mktemp("bcorpus"))
    sd = str(tmp_path_factory.mktemp("bstate"))
    write_parquet(c, cd)
    runner = CrawlRunner(spark, cd, sd, cfg, use_bloom_seen=True)
    runner.run()
    want = run_oracle(c, cfg)
    got = sorted(tuple(r) for r in runner.crawl_order().collect())
    want_rows = sorted(
        (r["round"], r["seq_in_round"], r["uh48"], r["url_norm"],
         r["first_ip"], r["priority"], r["hop_count"], r["fetch_at_ms"])
        for r in want.crawl_order)
    assert got == want_rows
    got_seen = {(r["uh48"], r["first_seen_round"])
                for r in runner.url_seen().collect()}
    want_seen = {(r["uh48"], r["first_seen_round"]) for r in want.url_seen}
    assert got_seen == want_seen


def test_bloom_state_is_distributed(spark):
    """The maintained filter must hold NO bitmap bytes on the driver: its
    state is a (bucket, bitmap) DataFrame, updates are executor-side
    OR-merges, and the probe cogroups per bucket (no broadcast/collect of
    bitmaps)."""
    from pyspark.sql import functions as F
    from open_source_search_engine_spark.pipeline.seen import (
        BloomState, probe_bloom_table)
    st = BloomState()
    assert not hasattr(st, "bitmaps")          # no driver-resident bitmaps
    seen = spark.range(30_000).select(
        (F.col("id") * 7919).alias("uh48"),
        (F.col("id") % 23 + 5000).alias("first_ip"))
    st.add_df(seen)
    assert not hasattr(st, "bitmaps")
    assert st.state is not None and "bitmap" in st.state.columns
    # incremental OR: second add extends membership without rebuild
    more = spark.range(30_000, 35_000).select(
        (F.col("id") * 7919).alias("uh48"),
        (F.col("id") % 23 + 5000).alias("first_ip"))
    st.add_df(more)
    probe_all = spark.range(35_000).select(
        (F.col("id") * 7919).alias("uh48"),
        (F.col("id") % 23 + 5000).alias("first_ip"))
    probed = probe_bloom_table(probe_all, st)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # no false negs
    fresh = spark.range(5_000).select(
        (F.col("id") * 7919 + 3).alias("uh48"),
        (F.col("id") % 23 + 5000).alias("first_ip"))
    fp = probe_bloom_table(fresh, st).filter("maybe_seen").count()
    assert fp < 500
    # counts/overfull read only the 64-row (bucket, n_keys) projection
    assert sum(st.counts().values()) >= 30_000
    assert not st.overfull()


def test_bloom_size_from_observed_counts():
    from open_source_search_engine_spark.pipeline.seen import (
        BITS_PER_KEY, BloomState)
    assert BloomState.size_bits_per_bucket(1000) == 1 << 21  # floor
    big = BloomState.size_bits_per_bucket(64 * (1 << 20))
    assert big >= (1 << 20) * BITS_PER_KEY        # fits with headroom
    assert big & (big - 1) == 0                   # power of two
