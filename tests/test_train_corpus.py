"""End-to-end training-corpus plan: crawl → curate → pack
(plans/train_corpus.py build_training_corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def runner(spark, tmp_path_factory):
    from open_source_search_engine_spark.config import CrawlConfig
    from open_source_search_engine_spark.corpus import (generate_corpus,
                                                        write_parquet)
    from open_source_search_engine_spark.pipeline.crawl import CrawlRunner
    c = generate_corpus(seed=17, n_domains=5, n_urls=100)
    cd = str(tmp_path_factory.mktemp("tc_corpus"))
    sd = str(tmp_path_factory.mktemp("tc_state"))
    write_parquet(c, cd)
    r = CrawlRunner(spark, cd, sd, CrawlConfig(max_rounds=4))
    r.run()
    return r


@pytest.fixture(scope="module")
def built(runner):
    from open_source_search_engine_spark.plans.train_corpus import (
        build_training_corpus,
    )
    # fixture recipe: the synthetic crawl pages are ~30-word lorem-ipsum,
    # so the Gopher shape gate and the language gate (meaningless on
    # lorem) are off; repetition/dup-ngram/line-dedup/near-dup stay on.
    kept, spans, attrition, stats = build_training_corpus(
        runner, context_len=64, lang_keep=("en",),
        gates=("repetition", "dup_ngram", "line_dedup", "near_dup"))
    return (kept.cache(), spans.cache(), attrition.cache(), stats.cache())


class TestTrainCorpus:
    def test_kept_docs_come_from_indexed(self, runner, built):
        kept = built[0]
        indexed_ids = {r.uh48 for r in
                       runner.indexed_docs().select("uh48").collect()}
        kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
        assert kept_ids and kept_ids <= indexed_ids

    def test_attrition_accounts_for_every_doc(self, runner, built):
        attrition = built[2]
        total = attrition.agg(F.sum("n_docs")).first()[0]
        assert total == runner.indexed_docs().count()
        stages = {r.stage for r in attrition.collect()}
        assert "kept" in stages

    def test_spans_cover_kept_tokens_exactly(self, built):
        kept, spans = built[0], built[1]
        span_toks = spans.agg(
            F.sum(F.col("tok_end") - F.col("tok_start"))).first()[0]
        doc_toks = kept.select(
            (F.size(F.split(F.trim("text"), r"\s+")) + 1)
            .alias("n")).agg(F.sum("n")).first()[0]
        assert span_toks == doc_toks

    def test_groups_are_sites(self, built):
        kept, spans = built[0], built[1]
        assert {r.group for r in spans.select("group")
                .distinct().collect()} == \
            {r.source for r in kept.select("source").distinct().collect()}

    def test_stats_pad_bound(self, built):
        # per group: only the final chunk may be partial
        stats = built[3]
        for r in stats.collect():
            assert 0 <= r.pad_tokens < 64

    def test_lm_gate_and_mix_compose(self, runner):
        """--lm-gate + --mix-alpha: the optional stages compose — the
        LM-tail reason shows up in attrition, the mixed corpus has
        unique per-copy doc ids, packing conservation still holds."""
        from open_source_search_engine_spark.plans.train_corpus import (
            build_training_corpus,
        )
        kept, spans, attrition, stats = build_training_corpus(
            runner, context_len=64, lang_keep=("en",),
            gates=("repetition", "dup_ngram", "line_dedup", "near_dup"),
            lm_gate=True, mix_alpha=0.3)
        stages = {r.stage for r in attrition.collect()}
        assert "lm_tail" in stages          # terciles always drop a tail
        ids = [r.doc_id for r in kept.select("doc_id").collect()]
        assert len(ids) == len(set(ids))    # per-copy ids unique
        span_toks = spans.agg(
            F.sum(F.col("tok_end") - F.col("tok_start"))).first()[0]
        doc_toks = kept.select(
            (F.size(F.split(F.trim("text"), r"\s+")) + 1)
            .alias("n")).agg(F.sum("n")).first()[0]
        assert span_toks == doc_toks

    def test_shuffle_stage_composes(self, runner):
        """--shuffle-seed: kept ids become the exact 0..n-1 shuffled
        stream positions, packing covers one global stream, token
        conservation holds, and the layout is seed-deterministic."""
        from open_source_search_engine_spark.plans.train_corpus import (
            build_training_corpus,
        )
        kept, spans, attrition, stats = build_training_corpus(
            runner, context_len=64, lang_keep=("en",),
            gates=("repetition", "dup_ngram", "line_dedup", "near_dup"),
            shuffle_seed=7)
        ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
        assert ids == list(range(len(ids)))        # dense positions
        assert [r.group for r in stats.collect()] == [""]  # one stream
        span_toks = spans.agg(
            F.sum(F.col("tok_end") - F.col("tok_start"))).first()[0]
        doc_toks = kept.select(
            (F.size(F.split(F.trim("text"), r"\s+")) + 1)
            .alias("n")).agg(F.sum("n")).first()[0]
        assert span_toks == doc_toks
        kept2, _, _, _ = build_training_corpus(
            runner, context_len=64, lang_keep=("en",),
            gates=("repetition", "dup_ngram", "line_dedup", "near_dup"),
            shuffle_seed=7)
        a = sorted(map(tuple, kept.select("doc_id", "text").collect()))
        b = sorted(map(tuple, kept2.select("doc_id", "text").collect()))
        assert a == b
