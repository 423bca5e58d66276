"""High-frequency term shortcuts — HighFrequencyTermShortcuts.cpp.

The reference pre-computes truncated PosDB termlists for stopword-
frequency terms ("is", "the", ...) so an overly-broad query doesn't
become a denial-of-service scan: at query time the seek substitutes the
pre-calculated short list for the full one
(HighFrequencyTermShortcuts.cpp:15-22, the binary file emitted offline
by ``termfreq_posdb_extract``; PosdbTable consumes the shortcut payload
in place of the Msg2 termlist read).

Spark-first: the shortcut table is one aggregate + one top-N window
over the postings table, materialized offline exactly like the
reference's extract step —

- ``hf_term_shortcuts``: terms whose document frequency exceeds
  ``min_df`` keep only their ``top_n`` best postings (tf-descending,
  doc-id ascending — the static-quality proxy for the reference's
  PosDB key order).  Partitioned by term, so the window never sees more
  than one term's list per task; the df aggregate is map-side combined.
- ``apply_shortcuts``: the query-time substitution — for each query
  term, read the truncated list when the term is in the shortcut table,
  the full termlist otherwise.  Expressed as an anti-join + union so
  Catalyst prunes both sides to the query's terms before any shuffle.

At 100 TB the shortcut table is tiny (O(hf-terms x top_n) rows) and
broadcast-joins; the full postings side stays term-bucketed so the
non-hf reads are single-bucket scans.  Results for hf terms are
deliberately approximate — the reference's own trade ("we still have to
return something vaguely relevant without accepting a denial-of-
service").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hf_term_shortcuts(postings: DataFrame, min_df: int = 1000,
                      top_n: int = 128) -> DataFrame:
    """Offline extract (termfreq_posdb_extract analogue): truncated
    termlists for every term with document frequency > ``min_df``."""
    df_counts = (postings.groupBy("term")
                 .agg(F.count("*").alias("df"))
                 .filter(F.col("df") > min_df))
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (postings.join(F.broadcast(df_counts.select("term")), "term")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top_n)
            .drop("_rn"))


def apply_shortcuts(postings: DataFrame, shortcuts: DataFrame,
                    terms: list[str]) -> DataFrame:
    """Query-time substitution: shortcut lists replace full termlists
    for the terms that have one; everything else reads the full list."""
    q = [t.lower() for t in terms]
    short = shortcuts.filter(F.col("term").isin(q))
    hf_terms = short.select("term").distinct()
    full = (postings.filter(F.col("term").isin(q))
            .join(F.broadcast(hf_terms), "term", "left_anti"))
    return full.unionByName(short)


def search_with_shortcuts(postings: DataFrame, shortcuts: DataFrame,
                          terms: list[str], k: int = 10) -> DataFrame:
    """AND search over shortcut-substituted termlists (the PosdbTable
    seek with the shortcut payload in place)."""
    from .postings import search
    return search(apply_shortcuts(postings, shortcuts, terms), terms, k=k)
