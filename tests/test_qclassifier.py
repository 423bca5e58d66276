"""Hashed-n-gram NB quality classifier (the fastText-style curation
filter: Brown 2020 App. A, Joulin 2016 hashing trick).

Pins: (1) scores match an independent single-process recompute, (2) the
classifier separates held-out docs written in each class's vocabulary,
(3) the prior bias moves scores the right way, (4) model size is bounded
by the bucket space, (5) determinism, (6) no row-at-a-time Python."""

import math

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.training.dsir import _LOG_SCALE
from open_source_search_engine_spark.training.qclassifier import (
    nb_score, nb_train, quality_classify)
from tests.test_dsir import _oracle_buckets

GOOD = "theorem lemma proof integral manifold tensor"
BAD = "casino jackpot bonus spins deposit winnings"


def _corpus(spark):
    rows = []
    for i in range(5):
        rows.append((i, f"{GOOD} chapter {i}", True))
        rows.append((100 + i, f"{BAD} page {i}", False))
    # held-out, unlabeled: 2 good-vocab, 2 bad-vocab
    rows.append((200, f"{GOOD} appendix", None))
    rows.append((201, f"{GOOD} notes", None))
    rows.append((300, f"{BAD} promo", None))
    rows.append((301, f"{BAD} signup", None))
    return spark.createDataFrame(
        rows, "doc_id long, text string, label boolean")


def test_scores_match_recompute(spark):
    docs = _corpus(spark)
    n_buckets = 4096
    labeled = [(r["doc_id"], r["text"], r["label"])
               for r in docs.collect()]
    pb, nb, pt, nt, npos, nneg = {}, {}, 0, 0, 0, 0
    for _, text, lab in labeled:
        if lab is None:
            continue
        bc = _oracle_buckets(text, n_buckets)
        if lab:
            npos += 1
            for b, c in bc.items():
                pb[b] = pb.get(b, 0) + c
                pt += c
        else:
            nneg += 1
            for b, c in bc.items():
                nb[b] = nb.get(b, 0) + c
                nt += c
    bias_q = int(round((math.log(npos + 1) - math.log(nneg + 1))
                       * _LOG_SCALE))
    want = {}
    for did, text, _ in labeled:
        s = bias_q
        for b, c in _oracle_buckets(text, n_buckets).items():
            lr = (math.log(pb.get(b, 0) + 1) - math.log(pt + n_buckets)
                  - math.log(nb.get(b, 0) + 1) + math.log(nt + n_buckets))
            s += c * int(round(lr * _LOG_SCALE))
        want[did] = s
    got = {r["doc_id"]: r["score_q"]
           for r in quality_classify(docs).collect()}
    assert got == want


def test_separates_heldout_vocab(spark):
    out = {r["doc_id"]: r for r in quality_classify(_corpus(spark)).collect()}
    assert out[200]["predict"] and out[201]["predict"]
    assert not out[300]["predict"] and not out[301]["predict"]
    assert min(out[200]["score_q"], out[201]["score_q"]) > \
        max(out[300]["score_q"], out[301]["score_q"])


def test_prior_bias(spark):
    # 4 positive docs vs 1 negative -> positive prior; an empty doc
    # (no tokens) scores exactly the bias
    rows = [(i, f"{GOOD} v{i}", True) for i in range(4)]
    rows.append((10, f"{BAD} x", False))
    rows.append((20, "", None))
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, label boolean")
    out = {r["doc_id"]: r["score_q"]
           for r in quality_classify(docs).collect()}
    assert out[20] == int(round((math.log(5) - math.log(2)) * _LOG_SCALE))


def test_model_bounded_by_buckets(spark):
    model = nb_train(_corpus(spark).filter("label IS NOT NULL"),
                     n_buckets=64)
    rows = model.collect()
    assert len(rows) <= 65
    assert {r["bucket"] for r in rows if r["bucket"] < 0} == {-1}


def test_deterministic(spark):
    a = sorted(map(tuple, quality_classify(_corpus(spark)).collect()))
    b = sorted(map(tuple, quality_classify(_corpus(spark)).collect()))
    assert a == b


def test_curate_classifier_gate(spark):
    """curate(classifier_labels=...) drops MAP-rejected docs with reason
    'classifier_reject'; good-vocab held-outs survive the gate."""
    from open_source_search_engine_spark.training.pipeline import curate

    docs = _corpus(spark).select("doc_id", "text")
    labels = _corpus(spark).filter("label IS NOT NULL").select(
        "doc_id", "label")
    out = {r["doc_id"]: (r["keep"], r["reason"])
           for r in curate(docs, classifier_labels=labels,
                           gates=()).collect()}
    assert out[300] == (False, "classifier_reject")
    assert out[301] == (False, "classifier_reject")
    assert out[200][0] and out[200][1] is None
    assert out[201][0] and out[201][1] is None


def test_plan_no_row_python(spark):
    docs = _corpus(spark)
    model = nb_train(docs.filter("label IS NOT NULL"))
    df = nb_score(docs, model)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoop" in plan
