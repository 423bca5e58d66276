"""Cross-document exact-substring dedup (Lee et al. 2021 ExactSubstr):
duplicated >=L-token spans are cut from every occurrence; unique text
survives untouched.  Pinned against a naive Python recomputation."""

from __future__ import annotations

import pytest


def _naive_exact_substr(texts: dict[int, str], L: int) -> dict[int, str]:
    """Independent twin: mark every L-token window string occurring >= 2
    times corpus-wide, cut the union of covered positions."""
    toks = {d: t.split(" ") for d, t in texts.items()}
    from collections import Counter
    wins = Counter()
    for d, tk in toks.items():
        for i in range(len(tk) - L + 1):
            wins[" ".join(tk[i:i + L])] += 1
    out = {}
    for d, tk in toks.items():
        covered = set()
        for i in range(len(tk) - L + 1):
            if wins[" ".join(tk[i:i + L])] >= 2:
                covered.update(range(i, i + L))
        out[d] = " ".join(t for j, t in enumerate(tk) if j not in covered)
    return out


@pytest.fixture(scope="module")
def corpus():
    boiler = " ".join(f"b{i}" for i in range(10))        # shared 10-gram
    return {
        1: f"u1 u2 u3 {boiler} tail1 tail2",
        2: f"start2 {boiler} v1 v2 v3 v4",
        3: "all unique words here nothing shared at all today friend",
        4: ("r1 r2 r3 r4 r5 r6 r7 r8 " * 2).strip(),      # self-repeat
        5: "short doc",                                    # < L tokens
    }


def test_exact_substring_dedup_matches_naive(spark, corpus):
    from open_source_search_engine_spark.training.substring import (
        exact_substring_dedup)
    L = 8
    docs = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           exact_substring_dedup(docs, min_len=L).collect()}
    want = _naive_exact_substr(corpus, L)
    for d in corpus:
        assert got[d]["text_dedup"] == want[d], d
    # the shared boilerplate is cut from BOTH docs (remove-all policy)
    assert "b0" not in got[1]["text_dedup"]
    assert "b0" not in got[2]["text_dedup"]
    # flanks survive
    assert got[1]["text_dedup"].startswith("u1 u2 u3")
    assert got[2]["text_dedup"].endswith("v4")
    # untouched docs
    assert got[3]["n_removed"] == 0
    assert got[3]["text_dedup"] == corpus[3]
    assert got[5]["text_dedup"] == corpus[5]
    # within-doc repetition counts as duplication
    assert got[4]["n_removed"] == got[4]["n_tokens"]
    assert got[4]["text_dedup"] == ""


def test_window_hashes_positions(spark):
    from open_source_search_engine_spark.training.substring import (
        window_hashes)
    docs = spark.createDataFrame(
        [(7, "a b c d e"), (8, "x y")], ["doc_id", "text"])
    rows = window_hashes(docs, 3).collect()
    got = {(r["doc_id"], r["start"]) for r in rows}
    assert got == {(7, 0), (7, 1), (7, 2)}      # doc 8 too short
    # identical windows hash identically across docs
    d2 = spark.createDataFrame(
        [(1, "p q r s"), (2, "z p q r")], ["doc_id", "text"])
    by_h = {}
    for r in window_hashes(d2, 3).collect():
        by_h.setdefault(r["h"], []).append((r["doc_id"], r["start"]))
    assert sorted(v for vs in by_h.values() if len(vs) == 2
                  for v in vs) == [(1, 0), (2, 1)]   # 'p q r' twice
