"""Encyclopedia-title phrase fixture loader (the Wiki.cpp analogue).

The reference loads a wikipedia-title dump once at startup
(``Wiki.cpp:29-167`` ``g_wiki.load`` -> cumulative word-hash table) and
asks ``Wiki::getNumWordsInWikiPhrase`` (``Wiki.cpp:175``) per query word
whether a run starting there is a known title — such runs become wiki
phrases in the Posdb ranker (pair targets query spacing + wiki-bigram
weighting).  Here the dump is a committed parquet
(``fixtures/wikititles/wikititles.parquet``, built by
``scripts/make_wikititles.py``: hand-authored general-knowledge
multi-word titles), loaded once per process with plain pyarrow — a few
KB of query-side metadata, never a distributed table.  The probe set is
word TUPLES (the repo's ``wiki_phrase_ids`` greedy longest-run matcher,
``search/posdbrank.py``), not cumulative hashes: same semantics, no
hash-collision false positives.
"""
from __future__ import annotations

import os
from functools import lru_cache

WIKITITLES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures", "wikititles", "wikititles.parquet")


@lru_cache(maxsize=1)
def load_wiki_titles(path: str | None = None) -> frozenset[tuple[str, ...]]:
    """Lowercase word tuples of every fixture title."""
    import pyarrow.parquet as pq

    table = pq.read_table(path or WIKITITLES_PATH, columns=["title"])
    return frozenset(tuple(t.split(" "))
                     for t in table["title"].to_pylist())
