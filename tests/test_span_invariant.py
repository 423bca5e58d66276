"""Per-row span-sequence invariant (BASELINE input_hint): every
transformation that touches the interleaved docs table must preserve
(kind, text, media_ref, order) exactly, per row."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.corpus import generate_corpus, write_parquet


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    c = generate_corpus(seed=5, n_domains=5, n_urls=80)
    d = tmp_path_factory.mktemp("spancorpus")
    write_parquet(c, str(d))
    return str(d)


def _canon(rows):
    """doc_id → ordered (kind, text, media_ref, offset) tuples."""
    out = {}
    for r in rows:
        spans = r["spans"]
        out[r["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in sorted(spans, key=lambda s: s["offset"])]
    return out


def test_spark_roundtrip_preserves_span_sequence(spark, docs_dir, tmp_path):
    """Read → repartition → shuffle → write → read-back: spans unchanged."""
    original = _canon(pq.read_table(f"{docs_dir}/docs.parquet").to_pylist())
    df = spark.read.parquet(f"{docs_dir}/docs.parquet")
    out_path = str(tmp_path / "roundtrip")
    (df.repartition(7, "doc_id")
       .sortWithinPartitions("doc_id")
       .write.mode("overwrite").parquet(out_path))
    back = spark.read.parquet(out_path).collect()
    got = _canon([{"doc_id": r["doc_id"],
                   "spans": [s.asDict() for s in r["spans"]]} for r in back])
    assert got == original


def test_fetch_path_preserves_span_sequence(spark, docs_dir):
    """The crawl's parse stage consumes spans via mapInPandas; feeding the
    docs through the same join+select shape must not reorder or mutate."""
    df = spark.read.parquet(f"{docs_dir}/docs.parquet")
    original = _canon(pq.read_table(f"{docs_dir}/docs.parquet").to_pylist())
    wave_like = df.select(F.col("doc_id").alias("url"))
    joined = (wave_like.join(df, wave_like["url"] == df["doc_id"])
              .select("doc_id", "spans").collect())
    got = _canon([{"doc_id": r["doc_id"],
                   "spans": [s.asDict() for s in r["spans"]]}
                  for r in joined])
    assert got == original


def test_offsets_strictly_increasing(docs_dir):
    rows = pq.read_table(f"{docs_dir}/docs.parquet").to_pylist()
    assert rows
    for r in rows:
        offs = [s["offset"] for s in r["spans"]]
        assert offs == sorted(offs)
        assert len(set(offs)) == len(offs)
        for s in r["spans"]:
            if s["kind"] == "text":
                assert s["media_ref"] is None and s["text"] is not None
            else:
                assert s["kind"] == "media_ref"
                assert s["media_ref"] is not None and s["text"] is None
