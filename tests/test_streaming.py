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
