"""Speller: unified popularity dictionary + compound-word splitting.

The reference's Speller (Speller.cpp) is a corpus-derived popularity
dictionary plus a backtracking word-splitter:

- ``generateDicts`` (Speller.cpp:66) dumps the top words of the indexed
  corpus with popularity scores into the "unified dict";
  ``getPhrasePopularity`` (Speller.cpp:469-488) looks a phrase up,
  returning 0 when absent ("if not in dictionary assume 0 popularity").
- ``canSplitWords``/``findNext`` (Speller.cpp:553-770) split a
  run-together string ("homedepot") into dictionary words, longest-first
  with backtracking, used for did-you-mean on no-space queries and for
  detecting adult words hidden in domain names (the ``isPorn`` out-param
  — an adult needle at the start of a segment short-circuits the split).

Spark shape: the dict build is one groupBy(word) count over the corpus
(map-side combined); lookups are broadcast joins; the splitter is a pure
Python kernel applied per-distinct-domain through a pandas UDF with the
dict broadcast — the dict is the top-N words by construction, bounded,
exactly like the reference's in-memory unified dict.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..training.adult import DEFAULT_NEEDLES

# candidate segments findNext refuses even when the dict contains them —
# each line in Speller.cpp:622-760 documents the runaway split it stops
# (e.g. "bookslut" -> "books lut", "grooverotica" -> "groove rot ica").
_BLOCKED_WORDS = frozenset({
    "ult", "ul", "ex", "ck", "ales", "ica", "tik", "nud", "nos", "lut",
    "xe", "xd", "rn", "or", "lu", "sco", "xci", "bes", "hem", "wim",
    "dsm", "nal", "bra", "spor", "scor", "lutz", "freep", "hemal",
    "inbond", "wingers", "xc", "xs", "phonesex", "cybersex",
})
# "any 3 letter ... word starting with ex" / "orn*" prefix families
_BLOCKED_PREFIX = (("ex", 3), ("orn", 4))


def _blocked(word: str) -> bool:
    if word in _BLOCKED_WORDS:
        return True
    for pfx, ln in _BLOCKED_PREFIX:
        if len(word) == ln and word.startswith(pfx):
            return True
    return False


def _adult_at(s: str) -> bool:
    """An adult needle at position 0 of the segment (Speller.cpp:600-611
    isAdult loc==s gate; the word 'adult' itself is skipped for false
    positives)."""
    for needle, weight in DEFAULT_NEEDLES:
        if weight > 0 and needle != "adult" and s.startswith(needle):
            return True
    return False


def _find_next(s: str, start: int, limit: int, words: frozenset
               ) -> tuple[int, bool] | None:
    """findNext (Speller.cpp:597-770): the longest admissible dictionary
    word at the start of the window s[start:limit].  Returns (absolute
    cut position, porn flag) or None.  An adult needle at the window
    start consumes the whole window (loc==s gate, Speller.cpp:602-611)."""
    if _adult_at(s[start:limit]):
        return limit, True
    for a in range(limit - start, 0, -1):
        cand = s[start:start + a]
        if a == 1 and cand not in ("a", "i"):
            continue                       # 1-letter words: only a/i
        if a == limit - start and a <= 2:
            continue                       # end word can't be <=2 chars
        if _blocked(cand):
            continue
        if cand in words:
            return start + a, False
    return None


def can_split_words(s: str, words: frozenset
                    ) -> tuple[bool, bool, str]:
    """Backtracking split of ``s`` into dictionary words, longest-first
    (Speller.cpp:553-595 canSplitWords, same index-array control flow).
    Returns (ok, is_porn, split): the first segmentation found in the
    reference's search order, with is_porn set when a segment starts
    with an adult needle."""
    n = len(s)
    if n == 0:
        return True, False, ""
    # index[0]=start of segment 1; index[curr]=search limit, shrunk on
    # backtrack (Speller.cpp:562-563, 586-592)
    index = [0, n]
    curr = 1
    is_porn = False
    while curr > 0:
        while True:
            got = _find_next(s, index[curr - 1], index[curr], words)
            if got is None:
                break
            nxt, porn = got
            is_porn = is_porn or porn
            index[curr] = nxt
            curr += 1
            if curr == len(index):
                index.append(n)
            else:
                index[curr] = n
            if is_porn or nxt == n:
                parts = [s[index[k - 1]:index[k]]
                         for k in range(1, curr)]
                return True, is_porn, " ".join(parts)
        curr -= 1
        while curr > 0:
            if index[curr] > index[curr - 1]:
                index[curr] -= 1
                break
            curr -= 1
    return False, False, ""


def build_unified_dict(docs: DataFrame, text_col: str = "text",
                       top_n: int | None = None) -> DataFrame:
    """(word, pop) popularity dictionary from the corpus — the
    generateDicts dump (Speller.cpp:66): distributed tokenize + count;
    optionally keep only the top_n words like numWordsToDump."""
    words = (docs.select(F.explode(F.split(F.lower(F.col(text_col)),
                                           r"\s+")).alias("word"))
             .filter(F.length("word") > 0)
             .groupBy("word").agg(F.count("*").alias("pop")))
    if top_n is not None:
        words = words.orderBy(F.desc("pop"), "word").limit(top_n)
    return words


def phrase_popularity(terms: DataFrame, unified: DataFrame,
                      term_col: str = "word") -> DataFrame:
    """getPhrasePopularity over a frame of terms: broadcast join, 0 when
    absent (Speller.cpp:488)."""
    d = unified.withColumnRenamed("word", term_col)
    return (terms.join(F.broadcast(d), term_col, "left")
            .withColumn("pop", F.coalesce(F.col("pop"), F.lit(0))))


def split_compounds(df: DataFrame, col: str, words: frozenset
                    ) -> DataFrame:
    """Batch splitter: adds can_split / is_porn / split_words columns.
    The dict is a driver-built frozenset (bounded: the unified dict is
    top-N by construction) shipped once per executor via the UDF
    closure, not per row."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("can_split", T.BooleanType()),
        T.StructField("is_porn", T.BooleanType()),
        T.StructField("split_words", T.StringType()),
    ])

    @F.pandas_udf(schema)
    def _split(col_s: pd.Series) -> pd.DataFrame:
        rows = [can_split_words(x or "", words) for x in col_s]
        return pd.DataFrame(rows,
                            columns=["can_split", "is_porn",
                                     "split_words"])

    return df.withColumn("_sp", _split(F.col(col))).select(
        "*", "_sp.can_split", "_sp.is_porn", "_sp.split_words"
    ).drop("_sp")


def did_you_mean(query: str, words: frozenset) -> str | None:
    """No-space query suggestion: for each query word missing from the
    dict, try the compound split; returns the corrected query or None
    when nothing improves (the reference's main spell surface after the
    edit-distance recommender was retired)."""
    out, changed = [], False
    for w in query.lower().split():
        if w in words:
            out.append(w)
            continue
        ok, _, split = can_split_words(w, words)
        if ok and " " in split and all(p in words
                                       for p in split.split()):
            out.append(split)
            changed = True
        else:
            out.append(w)
    return " ".join(out) if changed else None
