"""Structured Streaming surface: seed ingest through the Arrow kernels and
windowed reply telemetry."""

from __future__ import annotations

import time


def test_stream_seed_ingest(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from open_source_search_engine_spark.streaming.ingest import (
        stream_seed_ingest)
    src = tmp_path / "drop"
    src.mkdir()
    pq.write_table(pa.table({
        "url": ["HTTP://WWW.STREAM.EXAMPLE:80/a", "http://www.stream.example/b"],
        "added_time": [1700000000, 1700000001]}), str(src / "seeds0.parquet"))
    q = stream_seed_ingest(spark, str(src), str(tmp_path / "ckpt"),
                           str(tmp_path / "out"), trigger_once=True)
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    urls = sorted(r["url_norm"] for r in out)
    assert urls == ["http://www.stream.example/a", "http://www.stream.example/b"]
    assert all(r["uh48"] > 0 for r in out)


def test_reply_telemetry_batch_equivalent(spark):
    from open_source_search_engine_spark.streaming.ingest import (
        reply_telemetry_stream)
    rows = [(1000, 1700000005, 0, 1700000005200),
            (1000, 1700000015, 32769, 1700000015200),
            (2000, 1700000025, 0, 1700000025200)]
    df = spark.createDataFrame(
        rows, "first_ip long, spidered_time long, err_code int, download_end_ms long")
    got = {(r["first_ip"], r["fetches"], r["errors"])
           for r in reply_telemetry_stream(df).collect()}
    assert (1000, 2, 1) in got and (2000, 1, 0) in got


def test_stream_url_seen_batch_dedup(spark):
    from open_source_search_engine_spark.streaming.frontier import (
        stream_url_seen)
    df = spark.createDataFrame(
        [(10, 1700000000), (10, 1700000100), (20, 1700000050)],
        "uh48 long, added_time long")
    got = sorted(r["uh48"] for r in stream_url_seen(df).collect())
    assert got == [10, 20]


def test_stream_crawl_waves_rounds(spark, tmp_path):
    """Micro-batch = crawl round: each parquet drop becomes one wave via
    the PRODUCTION assembly; the seen-state anti-join keeps a uh48 that
    re-arrives in a later drop out of its wave (exact F5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from open_source_search_engine_spark.streaming.frontier import (
        stream_crawl_waves)

    src = tmp_path / "req"
    src.mkdir()

    def drop(name, rows):
        pq.write_table(pa.table({
            "uh48": pa.array([r[0] for r in rows], pa.int64()),
            "url": [r[1] for r in rows],
            "first_ip": pa.array([r[2] for r in rows], pa.int64()),
            "hop_count": pa.array([r[3] for r in rows], pa.int32()),
            "added_time": pa.array([r[4] for r in rows], pa.int64()),
        }), str(src / name))

    t0 = 1_700_000_000
    drop("r0.parquet", [
        (1, "http://a.example/1", 111, 0, t0),
        (2, "http://a.example/2", 111, 0, t0),
        (3, "http://b.example/3", 222, 1, t0),
    ])
    drop("r1.parquet", [
        (2, "http://a.example/2", 111, 0, t0 + 60),   # already seen
        (4, "http://b.example/4", 222, 2, t0 + 60),
    ])
    state = tmp_path / "state"
    q = stream_crawl_waves(spark, str(src), str(state), trigger_once=True)
    q.awaitTermination(180)

    waves = spark.read.parquet(str(state / "waves")).collect()
    by_round = {}
    for r in waves:
        by_round.setdefault(r["round"], set()).add(r["uh48"])
    # batch order follows file order (maxFilesPerTrigger=1)
    assert by_round[0] == {1, 2, 3}
    assert by_round[1] == {4}                 # uh48=2 blocked by seen-state
    seen = {r["uh48"] for r in
            spark.read.parquet(str(state / "seen")).collect()}
    assert seen == {1, 2, 3, 4}
    # production politeness: same-IP fetches are spaced, not simultaneous
    r0 = sorted((r["uh48"], r["fetch_at_ms"]) for r in waves
                if r["round"] == 0 and r["first_ip"] == 111)
    assert len({t for _, t in r0}) == len(r0)
