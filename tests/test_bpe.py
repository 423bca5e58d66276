"""BPE train + apply: the published algorithm's known behavior, Spark/local
parity, and segmentation invariants."""

from __future__ import annotations

from collections import Counter

from open_source_search_engine_spark.training.bpe import (
    apply_bpe, encode_word, learn_merges, train_bpe, word_frequencies)
from open_source_search_engine_spark.training.textqual import BPE_RE

# the Sennrich et al. 2016 worked example: low(5) lower(2) newest(6)
# widest(3) — first merges are es, est, then the lexicographic tie-breaks
CLASSIC = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_classic_example():
    merges = learn_merges(CLASSIC, n_merges=5)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
                      ("e", "w")]


def test_learn_merges_deterministic():
    assert learn_merges(CLASSIC, 50) == learn_merges(CLASSIC, 50)
    # stops when no pair repeats rather than padding
    assert len(learn_merges([("ab", 1)], 50)) == 1


def test_encode_word_uses_rank_order():
    merges = learn_merges(CLASSIC, 5)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("newest", ranks) == ["n", "ew", "est"]
    # unseen characters pass through unmerged
    assert encode_word("xyz", ranks) == ["x", "y", "z"]


def test_spark_train_matches_local(spark):
    texts = ["the low bird", "lower and lower still", "newest of the new",
             "widest river", "the newest low"] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = train_bpe(docs, n_merges=30, max_words=1000)
    wf = Counter()
    for t in texts:
        wf.update(BPE_RE.findall(t))
    want = learn_merges(
        sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:1000], 30)
    assert got == want


def test_apply_bpe_invariants(spark):
    texts = ["the low bird", "lower, and lower still!", "",
             "newest of the new 123"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=20, max_words=1000)
    rows = {r["doc_id"]: r for r in apply_bpe(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(texts):
        toks = BPE_RE.findall(t)
        pieces = [p for w in toks for p in encode_word(w, ranks)]
        assert rows[i]["n_pretokens"] == len(toks)
        assert rows[i]["n_bpe_pieces"] == len(pieces)
        assert rows[i]["first_pieces"] == " ".join(pieces[:8])
        # segmentation is lossless: pieces concatenate back to pre-tokens
        assert "".join(pieces) == "".join(toks)


def test_word_frequencies_distributed(spark):
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string")
    got = {r["word"]: r["n"] for r in word_frequencies(docs).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}
