"""Byte-pair-encoding tokenizer: distributed train + distributed apply.

The build brief's token-counting operator gets a REAL BPE here (the
published algorithm — Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"; apply loop per the GPT-2
reference encoder shape), not just the pre-tokenizer regex.

100 TB shape:
  * TRAIN — the corpus-size-dependent work (word-frequency counting) runs
    distributed: pre-tokenize inside ``mapInPandas`` batches, explode,
    ``groupBy(word).count()``.  Only the TOP ``max_words`` (count desc,
    word asc — deterministic) are collected; Heaps' law bounds the
    distinct-word table, and the cap bounds driver memory at
    O(max_words) regardless of corpus size.  The merge loop itself is
    inherently sequential and runs driver-side over that bounded table —
    ``n_merges`` iterations with an inverted pair→word index, so each
    merge touches only the words containing the merged pair.
  * APPLY — the learned merge ranks broadcast as a plain dict;
    ``mapInPandas`` encodes each batch with a per-batch word→pieces memo
    (Zipf makes the memo hit rate very high), no shuffle at all.

Reference tie-in: the reference engine counts words per doc during
indexing (Words.cpp / Phrases.cpp token walk); subword tokenization is a
training-data-pipeline addition per the build brief.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textqual import BPE_RE

# ---------------------------------------------------------------------------
# driver-side merge learning (bounded input: the collected word-freq table)
# ---------------------------------------------------------------------------


def learn_merges(word_counts: list[tuple[str, int]],
                 n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training over a (word, count) table.  Deterministic:
    best pair = max total count, ties broken by the lexicographically
    smallest (left, right).  Incremental pair-count maintenance via an
    inverted pair -> word-index map (only words containing the merged
    pair are re-walked per iteration)."""
    words: list[list[str]] = [list(w) for w, _ in word_counts]
    counts: list[int] = [c for _, c in word_counts]

    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word_pairs(i: int, sign: int) -> None:
        syms = words[i]
        c = counts[i] * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_count[p] = pair_count.get(p, 0) + c
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)

    for i in range(len(words)):
        add_word_pairs(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best: tuple[str, str] | None = None
        best_c = 0
        for p, c in pair_count.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None or best_c < 1:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            add_word_pairs(i, -1)          # retract old adjacencies
            syms = words[i]
            out: list[str] = []
            j = 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == best[0]
                        and syms[j + 1] == best[1]):
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            add_word_pairs(i, +1)
        # drop exhausted entries so the argmax scan stays tight
        dead = [p for p, c in pair_count.items() if c <= 0]
        for p in dead:
            del pair_count[p]
            pair_words.pop(p, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                memo: dict | None = None) -> list[str]:
    """Apply learned merges to one pre-token, lowest-rank-first (the GPT-2
    encoder loop shape)."""
    if memo is not None and word in memo:
        return memo[word]
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_j = -1
        for j, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j:best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    if memo is not None:
        memo[word] = syms
    return syms


# ---------------------------------------------------------------------------
# Spark train / apply
# ---------------------------------------------------------------------------

_WORD_SCHEMA = T.StructType([T.StructField("word", T.StringType())])


def _words_map_in_pandas(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        toks: list[str] = []
        for t in batch["text"].fillna(""):
            toks.extend(BPE_RE.findall(t))
        yield pd.DataFrame({"word": pd.Series(toks, dtype="object")})


def word_frequencies(docs: DataFrame) -> DataFrame:
    """Distributed (word, n) table — the only corpus-scale stage of
    training.  Map-side combine via groupBy; output is dictionary-sized."""
    return (docs.select("text").mapInPandas(_words_map_in_pandas,
                                            schema=_WORD_SCHEMA)
            .groupBy("word").agg(F.count("*").alias("n")))


def train_bpe(docs: DataFrame, n_merges: int = 200,
              max_words: int = 20000) -> list[tuple[str, str]]:
    """Distributed word count -> bounded deterministic collect -> classic
    merge learning.  The collect is capped at ``max_words`` rows ordered
    (n DESC, word ASC), so driver memory is corpus-size-independent."""
    rows = (word_frequencies(docs)
            .orderBy(F.desc("n"), F.asc("word"))
            .limit(max_words)
            .collect())
    return learn_merges([(r["word"], r["n"]) for r in rows], n_merges)


BPE_APPLY_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_pretokens", T.LongType()),
    T.StructField("n_bpe_pieces", T.LongType()),
    T.StructField("first_pieces", T.StringType()),
])


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]],
              n_first: int = 8) -> DataFrame:
    """Encode every document with the learned merges: per-doc pre-token
    and BPE-piece counts plus the first ``n_first`` pieces (space-joined,
    a value-checkable fingerprint of the segmentation)."""
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(
        {p: i for i, p in enumerate(merges)})

    def _encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = b_ranks.value
        memo: dict = {}
        for batch in it:
            ids, n_pre, n_pieces, firsts = [], [], [], []
            for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
                toks = BPE_RE.findall(text)
                pieces: list[str] = []
                for w in toks:
                    pieces.extend(encode_word(w, ranks, memo))
                ids.append(int(doc_id))
                n_pre.append(len(toks))
                n_pieces.append(len(pieces))
                firsts.append(" ".join(pieces[:n_first]))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_pretokens": pd.Series(n_pre, dtype="int64"),
                "n_bpe_pieces": pd.Series(n_pieces, dtype="int64"),
                "first_pieces": pd.Series(firsts, dtype="object"),
            })

    return docs.select("doc_id", "text").mapInPandas(
        _encode, schema=BPE_APPLY_SCHEMA)
