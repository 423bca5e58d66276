"""Q5: result summaries/titles (Summary.cpp / Title.cpp analogue).

The reference scores candidate sentence windows by query-term coverage and
position (``Summary.cpp`` getBestWindow).  Here: a Catalyst-side token
window scorer — for each (doc, query) pick the fixed-width token window
containing the most distinct query terms (earliest window wins ties),
return the joined snippet plus a title (leading tokens).

Pure DataFrame ops: split → slide via sequence+transform → score → argmax,
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_TOKENS = 12
TITLE_TOKENS = 8


def summarize(docs: DataFrame, terms: list[str],
              window: int = WINDOW_TOKENS) -> DataFrame:
    """docs(doc_id, text) → (doc_id, title, snippet, n_hits).

    n_hits = distinct query terms inside the chosen window."""
    terms = [t.lower() for t in terms]
    term_arr = F.array(*[F.lit(t) for t in terms])
    toks = F.split(F.lower(F.col("text")), r"\s+")
    n = F.size(toks)
    # one row per candidate window start (stride = window/2 keeps the
    # explode linear in doc length)
    stride = max(1, window // 2)
    starts = F.sequence(F.lit(0),
                        F.greatest(n - window, F.lit(0)), F.lit(stride))
    exploded = (docs
                .withColumn("toks", toks)
                .withColumn("start", F.explode(starts)))
    win = F.slice("toks", F.col("start") + 1, window)
    hits = F.size(F.array_intersect(F.array_distinct(win), term_arr))
    scored = (exploded
              .withColumn("win", win)
              .withColumn("n_hits", hits))
    best = scored.groupBy("doc_id").agg(
        F.max_by(F.struct("win", "start"),
                 F.struct(F.col("n_hits"), -F.col("start"))).alias("b"),
        F.max("n_hits").alias("n_hits"),
        F.first("toks").alias("toks_all"))
    return best.select(
        "doc_id",
        F.concat_ws(" ", F.slice("toks_all", 1, TITLE_TOKENS)).alias("title"),
        F.concat_ws(" ", F.col("b.win")).alias("snippet"),
        F.col("n_hits").cast("long").alias("n_hits"))
