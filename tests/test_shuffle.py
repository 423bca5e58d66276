"""Deterministic global corpus shuffle (seeded hash permutation +
range-sharded exact positions)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.functions.ghash import hash64b_bytes
from open_source_search_engine_spark.training.shuffle import (
    shuffle_corpus, shuffle_positions)


def _docs(spark, n=200):
    return spark.createDataFrame([(i, f"doc {i}") for i in range(n)],
                                 "doc_id long, text string")


def test_positions_are_exact_permutation(spark):
    out = shuffle_positions(_docs(spark), seed=7).collect()
    assert sorted(r["position"] for r in out) == list(range(200))


def test_positions_match_key_sort_oracle(spark):
    out = {r["doc_id"]: r["position"]
           for r in shuffle_positions(_docs(spark), seed=7).collect()}
    h = hash64b_bytes([f"{i}\x1f7".encode() for i in range(200)])
    keys = (h >> np.uint64(1)).astype(np.int64)
    order = sorted(range(200), key=lambda i: (keys[i], i))
    want = {doc: pos for pos, doc in enumerate(order)}
    assert out == want


def test_shuffled_frame_row_order(spark):
    rows = shuffle_corpus(_docs(spark), seed=7).collect()
    keys = [r["shuffle_key"] for r in rows]
    assert keys == sorted(keys)
    assert sorted(r["doc_id"] for r in rows) == list(range(200))


def test_seed_changes_permutation_deterministically(spark):
    a = [r["doc_id"] for r in sorted(shuffle_positions(
        _docs(spark), seed=1).collect(), key=lambda r: r["position"])]
    b = [r["doc_id"] for r in sorted(shuffle_positions(
        _docs(spark), seed=1).collect(), key=lambda r: r["position"])]
    c = [r["doc_id"] for r in sorted(shuffle_positions(
        _docs(spark), seed=2).collect(), key=lambda r: r["position"])]
    assert a == b
    assert a != c


def test_partitioning_invariance(spark):
    base = _docs(spark)
    a = {(r["doc_id"], r["position"])
         for r in shuffle_positions(base.repartition(1), seed=3).collect()}
    b = {(r["doc_id"], r["position"])
         for r in shuffle_positions(base.repartition(7), seed=3).collect()}
    assert a == b


def test_no_per_doc_global_window(spark):
    df = shuffle_positions(_docs(spark), seed=7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_write_training_shards(spark, tmp_path):
    from open_source_search_engine_spark.sources.writers import (
        write_training_shards)

    out = str(tmp_path / "shards")
    manifest = write_training_shards(_docs(spark), out, shard_size=64,
                                     seed=7).collect()
    # 200 docs / 64 -> shards 0..3, last partial
    assert [r["shard"] for r in manifest] == [0, 1, 2, 3]
    assert [r["n_docs"] for r in manifest] == [64, 64, 64, 8]
    assert manifest[1]["pos_min"] == 64 and manifest[1]["pos_max"] == 127
    # shard is a disk partition column: reading one shard prunes to it
    back = spark.read.parquet(out)
    one = back.filter("shard = 2")
    got = sorted(r["position"] for r in one.collect())
    assert got == list(range(128, 192))
    # membership identical across a re-run (determinism of the layout)
    out2 = str(tmp_path / "shards2")
    write_training_shards(_docs(spark), out2, shard_size=64, seed=7)
    a = {(r["doc_id"], r["shard"])
         for r in spark.read.parquet(out).select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"])
         for r in spark.read.parquet(out2).select("doc_id", "shard").collect()}
    assert a == b
