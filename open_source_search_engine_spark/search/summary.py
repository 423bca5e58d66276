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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WINDOW_TOKENS = 12
TITLE_TOKENS = 8
MAX_TITLE_CHARS = 80


def title_expr(text: Column | str) -> Column:
    """Title.cpp candidate ladder as one Catalyst expression: the
    reference scores <title>, itemprop/og meta titles, <h1>..., and falls
    back to body text (Title.cpp candidate loop).  Here, in priority
    order: <title> tag → og:title meta → first <h1> → leading body
    tokens; the winner is entity-decoded (common entities), whitespace-
    collapsed, and truncated like the reference's title length cap."""
    t = F.col(text) if isinstance(text, str) else text

    def _cand(pattern: str) -> F.Column:
        return F.nullif(F.trim(F.regexp_extract(t, pattern, 1)), F.lit(""))

    raw = F.coalesce(
        _cand(r"(?is)<title[^>]*>(.*?)</title>"),
        _cand(r"""(?is)<meta[^>]+property=["']og:title["'][^>]*content=["']([^"']*)"""),
        _cand(r"(?is)<h1[^>]*>(.*?)</h1>"),
        F.concat_ws(" ", F.slice(F.split(F.trim(t), r"\s+"), 1,
                                 TITLE_TOKENS)))
    # strip any tags nested in the candidate, decode common entities
    clean = F.regexp_replace(raw, r"<[^>]*>", " ")
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]:
        clean = F.replace(clean, F.lit(ent), F.lit(ch))
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    return F.substring(clean, 1, MAX_TITLE_CHARS)


def extract_title(text: str) -> str:
    """Python twin of ``title_expr`` (oracle/test side)."""
    import html as _html
    import re as _re
    for pat in (r"(?is)<title[^>]*>(.*?)</title>",
                r"""(?is)<meta[^>]+property=["']og:title["'][^>]*content=["']([^"']*)"""):
        m = _re.search(pat, text or "")
        if m and m.group(1).strip():
            break
    else:
        m = _re.search(r"(?is)<h1[^>]*>(.*?)</h1>", text or "")
    if m and m.group(1).strip():
        raw = m.group(1)
    else:
        raw = " ".join((text or "").split()[:TITLE_TOKENS])
    clean = _re.sub(r"<[^>]*>", " ", raw)
    clean = _html.unescape(clean)
    return _re.sub(r"\s+", " ", clean).strip()[:MAX_TITLE_CHARS]


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
        # Title.cpp candidate ladder; plain-text docs fall through to the
        # leading-token title (identical to the historical behavior)
        title_expr(F.concat_ws(" ", "toks_all")).alias("title"),
        F.concat_ws(" ", F.col("b.win")).alias("snippet"),
        F.col("n_hits").cast("long").alias("n_hits"))
