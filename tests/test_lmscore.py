"""CCNet-style LM perplexity scoring (training/lmscore.py): Python-twin
parity, smoothing semantics, bucket determinism, plan shape."""

from __future__ import annotations

import math
import re
from collections import Counter

from open_source_search_engine_spark.training.lmscore import (
    bucket_by_thresholds, bucket_thresholds, ccnet_buckets,
    lm_cross_entropy, train_bigram_lm)

_TOK = re.compile(r"[^a-z0-9]+")


def _py_tokens(text: str) -> list[str]:
    return [t for t in _TOK.split(text.lower()) if t]


def _py_lm(texts: list[str]):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        ws = _py_tokens(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    return uni, bi, len(uni)


def _py_nll_micro(text: str, uni, bi, v) -> tuple[int, int]:
    ws = _py_tokens(text)
    nll = 0
    for a, b in zip(ws, ws[1:]):
        p = (bi.get((a, b), 0) + 1) / (uni.get(a, 0) + v)
        nll -= round(math.log(p) * 1_000_000)
    return nll, max(0, len(ws) - 1)


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "the quick brown fox jumps over the lazy cat", "en"),
    (3, "colorless green ideas sleep furiously tonight again", "en"),
    # gibberish with SEEN prefixes and unseen continuations — the worst
    # case under an add-one bigram LM (p = 1/(c1+V) < 1/V): strictly
    # higher cross-entropy than fully-unseen text like doc 3
    (4, "the zzz the qqq the xxx the vvv", "en"),
    (5, "the the the the the the the the", "en"),
    (6, "one", "en"),                                      # n_scored = 0
    (7, "", "en"),                                         # empty
    (8, "der schnelle braune fuchs springt", "de"),
    (9, "ein kleiner hund schlaeft dort", "de"),
    (10, "der schnelle braune fuchs schlaeft", "de"),
]


def _spark_docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_cross_entropy_matches_python_twin(spark):
    docs = _spark_docs(spark)
    uni, bi, v = train_bigram_lm(docs)
    out = {r["doc_id"]: r
           for r in lm_cross_entropy(docs, uni, bi, v).collect()}
    puni, pbi, pv = _py_lm([t for _, t, _ in DOCS])
    assert v == pv
    for doc_id, text, _ in DOCS:
        nll, n = _py_nll_micro(text, puni, pbi, pv)
        row = out[doc_id]
        assert row["n_scored"] == n
        # java Math.log vs python math.log may differ in the last ulp ->
        # at most 1 micro-nat per scored position after rounding
        assert abs(row["nll_micro"] - nll) <= max(1, n)
        if n == 0:
            assert row["ce_milli"] is None
        else:
            assert abs(row["ce_milli"] - nll // (n * 1000)) <= 1


def test_seen_bigrams_score_better_than_unseen(spark):
    docs = _spark_docs(spark)
    uni, bi, v = train_bigram_lm(docs)
    out = {r["doc_id"]: r["ce_milli"]
           for r in lm_cross_entropy(docs, uni, bi, v).collect()}
    # doc 5 is a single repeated high-count bigram -> lowest cross-entropy;
    # doc 4's bigrams are all unseen-except-self singletons -> highest en CE
    en = {d: out[d] for d, _, lang in DOCS
          if lang == "en" and out[d] is not None}
    assert min(en, key=en.get) == 5
    assert out[1] < out[4]


def test_min_count_pruning_is_conservative(spark):
    """Pruned bigrams score as unseen -> per-doc NLL can only rise."""
    docs = _spark_docs(spark)
    uni, bi, v = train_bigram_lm(docs, min_count=1)
    uni2, bi2, v2 = train_bigram_lm(docs, min_count=2)
    assert v2 == v                    # vocab counted before pruning
    a = {r["doc_id"]: r["nll_micro"]
         for r in lm_cross_entropy(docs, uni, bi, v).collect()}
    b = {r["doc_id"]: r["nll_micro"]
         for r in lm_cross_entropy(docs, uni2, bi2, v2).collect()}
    assert all(b[d] >= a[d] for d in a)
    assert any(b[d] > a[d] for d in a)    # singleton bigrams got pruned


def test_buckets_per_language_and_unscored_tail(spark):
    docs = _spark_docs(spark)
    uni, bi, v = train_bigram_lm(docs)
    scores = lm_cross_entropy(docs, uni, bi, v)
    out = {r["doc_id"]: r["bucket"]
           for r in ccnet_buckets(scores, docs).collect()}
    assert set(out) == {d for d, _, _ in DOCS}
    # unscored docs land in tail like CCNet's unmodelled documents
    assert out[6] == "tail" and out[7] == "tail"
    # the repeated-bigram doc reads most like the corpus -> head
    assert out[5] == "head"
    # each language got all three buckets (8 en docs, 3 de docs)
    en = {out[d] for d, _, lang in DOCS if lang == "en"}
    assert en == {"head", "middle", "tail"}


def test_threshold_path_agrees_with_exact_on_interior_docs(spark):
    docs = _spark_docs(spark)
    uni, bi, v = train_bigram_lm(docs)
    scores = lm_cross_entropy(docs, uni, bi, v)
    exact = {r["doc_id"]: r["bucket"]
             for r in ccnet_buckets(scores, docs).collect()}
    th = bucket_thresholds(scores, docs)
    approx = {r["doc_id"]: r["bucket"]
              for r in bucket_by_thresholds(scores, docs, th).collect()}
    # head-most and tail-most docs cannot disagree between the two paths
    assert approx[5] == exact[5] == "head"
    assert approx[6] == "tail" and approx[7] == "tail"
    agree = sum(1 for d in exact if exact[d] == approx[d])
    assert agree >= len(exact) - 3      # only boundary docs may differ


def test_curate_lm_gate_drops_tail(spark):
    """curate(lm_ref_docs=...) adds the CCNet perplexity gate: the
    planted gibberish doc lands in the tail bucket with reason
    'lm_tail'; the most corpus-like doc survives."""
    from open_source_search_engine_spark.training.pipeline import curate

    docs = _spark_docs(spark)
    ref = docs.filter("doc_id in (1, 2, 5, 8, 9, 10)")   # fluent docs
    out = {r["doc_id"]: (r["keep"], r["reason"])
           for r in curate(docs, lm_ref_docs=ref, gates=()).collect()}
    assert out[4] == (False, "lm_tail")       # gibberish -> tail
    assert out[5][0] and out[5][1] is None    # repeated seen bigram -> head
    # terciles: roughly a third of each language is dropped, no more
    dropped = [d for d, (k, _) in out.items() if not k]
    assert 0 < len(dropped) <= len(DOCS) // 2


def test_no_python_in_data_path(spark):
    docs = _spark_docs(spark)
    uni, bi, v = train_bigram_lm(docs)
    plan = (lm_cross_entropy(docs, uni, bi, v)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEval" not in plan
