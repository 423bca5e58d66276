"""Benchmark decontamination (training/decontam.py): planted overlap,
boundary n-gram behavior, tokenization robustness."""

from __future__ import annotations

from open_source_search_engine_spark.training.decontam import (
    decontaminate, eval_ngram_set)


def test_planted_contamination(spark):
    evals = spark.createDataFrame(
        [(100, "The quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [
            # exact 4 consecutive words from the eval doc -> contaminated
            (1, "witness said quick brown fox jumps away fast"),
            # only 3 consecutive shared words -> clean at n=4
            (2, "a quick brown fox appeared in the garden"),
            # same words but different order -> clean
            (3, "fox brown quick jumps dog lazy the over"),
            # shorter than n words -> no grams, clean
            (4, "tiny doc"),
            # case + punctuation must not defeat the match
            (5, "QUICK, Brown; FOX!! Jumps... over anything"),
        ],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_shared_grams"], r["contaminated"])
           for r in decontaminate(train, evals, n=4).collect()}
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    assert out[4] == (0, False)
    # "quick brown fox jumps" and "brown fox jumps over" both survive
    # lowercasing + punctuation stripping
    assert out[5] == (2, True)
    assert set(out) == {1, 2, 3, 4, 5}      # every train doc reported


def test_eval_ngram_set_distinct_and_windowed(spark):
    evals = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")],   # duplicate doc
        "doc_id long, text string")
    grams = {r["gram"] for r in eval_ngram_set(evals, n=4).collect()}
    assert grams == {"a b c d", "b c d e"}


def test_no_udf_in_plan(spark):
    """The operator must stay JVM-side: no BatchEvalPython / ArrowEval
    nodes in the physical plan (the 100 TB hot path is codegen'd)."""
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = (decontaminate(docs, docs, n=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEval" not in plan
