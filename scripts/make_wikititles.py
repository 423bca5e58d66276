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


# --- programmatic tail --------------------------------------------------
# The reference's dump has ~millions of titles; a 200-row fixture gives
# the phrase matcher unrealistically high miss rates and near-zero
# multi-title queries.  Compose a few thousand additional plausible
# encyclopedia-style titles from small public-knowledge seed lists x
# templates (deterministic, no external data).  Every composed title is
# *shaped* like a real article title ("history of <place>", "<place>
# national football team", "<surname> theorem"); exact-dump fidelity is
# not the goal — realistic size, word-length mix and hit/miss behavior
# for Wiki::getNumWordsInWikiPhrase-style probing is.

_PLACES = [
    "france", "germany", "italy", "spain", "portugal", "greece",
    "austria", "belgium", "netherlands", "switzerland", "sweden",
    "norway", "denmark", "finland", "iceland", "ireland", "scotland",
    "wales", "england", "poland", "hungary", "romania", "bulgaria",
    "croatia", "serbia", "ukraine", "russia", "turkey", "egypt",
    "morocco", "algeria", "tunisia", "nigeria", "ghana", "kenya",
    "ethiopia", "tanzania", "uganda", "senegal", "cameroon", "angola",
    "mozambique", "zimbabwe", "botswana", "namibia", "madagascar",
    "india", "pakistan", "bangladesh", "nepal", "bhutan", "myanmar",
    "thailand", "vietnam", "cambodia", "laos", "malaysia", "singapore",
    "indonesia", "philippines", "japan", "china", "mongolia", "korea",
    "taiwan", "australia", "fiji", "samoa", "tonga", "canada",
    "mexico", "guatemala", "honduras", "nicaragua", "panama", "cuba",
    "jamaica", "haiti", "colombia", "venezuela", "ecuador", "peru",
    "bolivia", "chile", "argentina", "uruguay", "paraguay", "brazil",
    "texas", "california", "florida", "ohio", "michigan", "oregon",
    "arizona", "colorado", "georgia", "virginia", "vermont", "maine",
]

_PLACE_TOPICS = [
    "history of", "geography of", "economy of", "politics of",
    "culture of", "demographics of", "climate of", "transport in",
    "education in", "cinema of", "music of", "religion in",
    "architecture of", "tourism in", "agriculture in", "energy in",
    "healthcare in", "languages of", "flag of", "coat of arms of",
]

_PLACE_SUFFIXES = [
    "national football team", "national anthem", "general election",
    "presidential election", "war of independence", "civil war",
    "grand prix", "stock exchange", "air force", "navy", "army",
    "supreme court", "national museum", "national library",
    "national park", "olympic committee", "premier league",
    "independence day", "armed forces", "central bank",
]

_UNI_TEMPLATES = ["university of {p}", "{p} state university",
                  "{p} institute of technology"]

# historical mathematicians / physicists x the concepts named after
# them — standard public-knowledge naming pattern ("euler theorem")
_SCIENTISTS = [
    "euler", "gauss", "newton", "fourier", "laplace", "fermat",
    "pascal", "bernoulli", "lagrange", "legendre", "poisson",
    "cauchy", "riemann", "hilbert", "cantor", "godel", "turing",
    "shannon", "markov", "chebyshev", "kolmogorov", "bayes",
    "boole", "hamming", "dijkstra", "kruskal", "huffman",
]
_STEM_CONCEPTS = [
    "theorem", "conjecture", "equation", "distribution", "transform",
    "matrix", "polynomial", "inequality", "constant", "function",
    "series", "integral", "algorithm", "number", "method",
]


def _programmatic_titles() -> list[str]:
    out: list[str] = []
    for p in _PLACES:
        for t in _PLACE_TOPICS:
            out.append(f"{t} {p}")
        for s in _PLACE_SUFFIXES:
            out.append(f"{p} {s}")
        for tmpl in _UNI_TEMPLATES:
            out.append(tmpl.format(p=p))
    for s in _SCIENTISTS:
        for c in _STEM_CONCEPTS:
            out.append(f"{s} {c}")
    return out


def main() -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "wikititles")
    os.makedirs(out_dir, exist_ok=True)
    titles = sorted(set(CORPUS_TITLES) | set(GENERAL_TITLES)
                    | set(_programmatic_titles()))
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
