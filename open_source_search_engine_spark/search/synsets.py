"""Dictionary-synset fixture loader (the Wiktionary.cpp analogue).

The reference loads a Wiktionary-derived synonym buffer once at startup
(`Wiktionary.cpp:60-135` ``g_wiktionary.load``) and serves per-word
synset lookups to Synonyms.cpp.  Here the blob is a committed parquet
(``fixtures/synsets/synsets.parquet``, built by
``scripts/make_synsets.py``: hand-authored common-English synonym
groups), loaded once per process with plain pyarrow — it is a few KB of
query-side metadata, never a distributed table.  Catalog oracles join
the same parquet from DuckDB so both engines read one source of truth.
"""
from __future__ import annotations

import os
from functools import lru_cache

SYNSETS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures", "synsets", "synsets.parquet")


@lru_cache(maxsize=1)
def load_synsets(path: str | None = None) -> dict[str, tuple[str, ...]]:
    """term -> ordered alternate forms, from the fixture parquet."""
    import pyarrow.parquet as pq

    table = pq.read_table(path or SYNSETS_PATH)
    out: dict[str, list[tuple[int, str]]] = {}
    for term, alt, rank in zip(table["term"].to_pylist(),
                               table["alt"].to_pylist(),
                               table["rank"].to_pylist()):
        out.setdefault(term, []).append((rank, alt))
    return {t: tuple(a for _, a in sorted(pairs))
            for t, pairs in out.items()}
