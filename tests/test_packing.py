"""Concat-and-chunk sequence packing (training/packing.py)."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.training.packing import (
    pack_sequences,
    packing_stats,
)


def _spans(df):
    return sorted((r.doc_id, r.chunk_id, r.tok_start, r.tok_end)
                  for r in df.collect())


class TestPacking:
    def test_exact_chunk_layout(self, spark):
        # docs of 3+1, 2+1, 4+1 tokens (EOS added) = stream of 12,
        # context 5: chunks [0,5) [5,10) [10,12)
        docs = spark.createDataFrame(
            [(0, "a b c"), (1, "d e"), (2, "f g h i")],
            "doc_id long, text string")
        out = _spans(pack_sequences(docs, context_len=5))
        assert out == [
            (0, 0, 0, 4),        # doc0 fully in chunk 0 (tokens 0-3)
            (1, 0, 0, 1),        # doc1's first token finishes chunk 0
            (1, 1, 1, 3),        # rest of doc1 in chunk 1
            (2, 1, 0, 3),        # doc2 tokens 0-2 fill chunk 1
            (2, 2, 3, 5),        # doc2's tail in chunk 2
        ]

    def test_every_chunk_full_except_last(self, spark):
        docs = spark.createDataFrame(
            [(i, "w " * (i % 7 + 1)) for i in range(50)],
            "doc_id long, text string")
        spans = pack_sequences(docs, context_len=16)
        fills = {r.chunk_id: r.fill for r in
                 spans.groupBy("chunk_id")
                 .agg(F.sum(F.col("tok_end") - F.col("tok_start"))
                      .alias("fill")).collect()}
        last = max(fills)
        for cid, fill in fills.items():
            assert fill == 16 or cid == last

    def test_tokens_conserved(self, spark):
        docs = spark.createDataFrame(
            [(i, "x " * (i % 11 + 1)) for i in range(40)],
            "doc_id long, text string")
        spans = pack_sequences(docs, context_len=32)
        total = spans.agg(
            F.sum(F.col("tok_end") - F.col("tok_start"))).first()[0]
        expect = sum((i % 11 + 1) + 1 for i in range(40))
        assert total == expect

    def test_range_sharding_invariant(self, spark):
        # tiny range width forces many ranges: output must be identical
        docs = spark.createDataFrame(
            [(i, "w " * (i % 5 + 1)) for i in range(30)],
            "doc_id long, text string")
        a = _spans(pack_sequences(docs, context_len=8))
        b = _spans(pack_sequences(docs, context_len=8, range_width=4))
        assert a == b

    def test_grouped_packing_independent_streams(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b", "s1"), (1, "c d", "s2"), (2, "e f", "s1")],
            "doc_id long, text string, source string")
        spans = pack_sequences(docs, context_len=6, group_col="source")
        by_grp = {(r.group, r.doc_id) for r in spans.collect()}
        assert ("s1", 0) in by_grp and ("s2", 1) in by_grp
        # each source starts its own chunk 0
        firsts = (spans.filter("chunk_id = 0 and tok_start = 0")
                  .select("group").distinct().count())
        assert firsts == 2

    def test_stats(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b c"), (1, "d e"), (2, "f g h i")],
            "doc_id long, text string")
        st = packing_stats(pack_sequences(docs, context_len=5),
                           context_len=5).first()
        assert st.n_chunks == 3
        assert st.n_tokens == 12
        assert st.pad_tokens == 3
