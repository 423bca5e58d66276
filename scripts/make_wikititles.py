#!/usr/bin/env python
"""Build the encyclopedia-title phrase fixture parquet.

The reference ships a wikipedia-title dump (``wikititles.txt.part1/2``,
loaded by ``Wiki.cpp:29-167`` into a hash table of cumulative word-id
hashes) that the query pipeline probes to detect when adjacent query
words form a known encyclopedia title (``Wiki::getNumWordsInWikiPhrase``,
``Wiki.cpp:175``): such a run is scored as one wiki phrase — the pair
targets its QUERY spacing and takes the wiki-bigram weighting in the
Posdb ranker.  That dump is an external corpus; this repo's equivalent
is a small hand-authored table of common multi-word encyclopedia-style
titles (general-knowledge phrases, no external dataset) with the same
access pattern: lowercase word tuple -> membership.

The first block is built from the synthetic corpus vocabulary (the words
that appear in testdata ``documents.text``) so catalog queries exercise
real phrase hits; the rest is a general-knowledge tail giving the table
realistic size and miss behavior.

Schema (one row per title):
    title   : string  lowercase, single-space-joined words
    n_words : int32   word count (reference caps probes at 12,
                      Wiki.cpp:188)

Regenerate with:  python scripts/make_wikititles.py
Output:           fixtures/wikititles/wikititles.parquet
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

# --- corpus-vocabulary titles (documents.text words) -------------------
CORPUS_TITLES = [
    "hash table",
    "merge sort",
    "data stream",
    "big data",
    "hash join",
    "sort merge join",
    "column order",
    "query window",
    "stream filter",
    "row value",
    "fast hash table",
]

# --- general-knowledge tail --------------------------------------------
GENERAL_TITLES = [
    "binary search", "binary search tree", "red black tree",
    "breadth first search", "depth first search", "shortest path",
    "dynamic programming", "linear algebra", "prime number",
    "fast fourier transform", "finite state machine",
    "turing machine", "machine learning", "deep learning",
    "neural network", "natural language processing",
    "information retrieval", "operating system", "file system",
    "virtual memory", "garbage collection", "race condition",
    "mutual exclusion", "public key cryptography", "hash function",
    "bloom filter", "skip list", "priority queue", "linked list",
    "regular expression", "context free grammar", "lambda calculus",
    "graph theory", "game theory", "set theory", "number theory",
    "probability theory", "standard deviation", "central limit theorem",
    "monte carlo method", "markov chain", "hidden markov model",
    "gradient descent", "least squares", "principal component analysis",
    "support vector machine", "decision tree", "random forest",
    "new york", "new york city", "los angeles", "san francisco",
    "united states", "united kingdom", "south africa", "new zealand",
    "costa rica", "puerto rico", "hong kong", "sri lanka",
    "saudi arabia", "czech republic", "dominican republic",
    "papua new guinea", "north pole", "south pole",
    "pacific ocean", "atlantic ocean", "indian ocean",
    "amazon river", "mount everest", "grand canyon", "great wall",
    "solar system", "milky way", "black hole", "big bang",
    "speed of light", "theory of relativity", "quantum mechanics",
    "periodic table", "carbon dioxide", "climate change",
    "greenhouse effect", "natural selection", "food chain",
    "immune system", "nervous system", "blood pressure",
    "world war", "cold war", "civil war", "french revolution",
    "industrial revolution", "roman empire", "middle ages",
    "renaissance art", "classical music", "jazz music",
    "rock and roll", "science fiction", "short story",
    "prime minister", "supreme court", "united nations",
    "human rights", "free speech", "civil rights movement",
    "stock market", "interest rate", "supply and demand",
    "gross domestic product", "exchange rate", "central bank",
    "olympic games", "world cup", "grand slam", "home run",
    "lock pick", "lock pick set", "swiss army knife",
    "solar panel", "wind turbine", "electric vehicle",
    "search engine", "web crawler", "domain name", "internet protocol",
    "transmission control protocol", "hypertext transfer protocol",
    "uniform resource locator", "world wide web", "social network",
    "open source", "source code", "version control",
    "programming language", "assembly language", "compiler design",
    "database management system", "relational database",
    "structured query language", "distributed system",
    "cloud computing", "parallel computing", "load balancing",
    "fault tolerance", "message queue", "shared memory",
]


def main() -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "wikititles")
    os.makedirs(out_dir, exist_ok=True)
    titles = sorted(set(CORPUS_TITLES) | set(GENERAL_TITLES))
    for t in titles:
        assert t == t.lower().strip() and "  " not in t, t
        assert 2 <= len(t.split()) <= 12, t
    table = pa.table({
        "title": pa.array(titles, pa.string()),
        "n_words": pa.array([len(t.split()) for t in titles], pa.int32()),
    })
    path = os.path.join(out_dir, "wikititles.parquet")
    pq.write_table(table, path)
    print(f"wrote {table.num_rows} titles -> {path}")


if __name__ == "__main__":
    main()
