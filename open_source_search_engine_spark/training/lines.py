"""Line-level corpus deduplication and line-shape filtering.

The standard second tier of a training-data pipeline after document-level
dedup (CCNet, RefinedWeb §3.3, C4 §2.2): boilerplate (nav bars, cookie
banners, footers) repeats across *documents*, so each distinct line is
kept only at its first occurrence in corpus order and removed everywhere
else, then documents are rebuilt from their surviving lines.

Scale shape (the part that matters at 100 TB):
- one explode (doc -> lines) that is linear in corpus size,
- ONE shuffle, keyed by the line itself, to elect the first occurrence
  (``min(struct(doc_id, line_no))`` is a partial-aggregatable min, so the
  map side combines before the exchange),
- one shuffle back on doc_id to rebuild documents.
  At real scale you would key the election by ``xxhash64(line)`` to keep
  the exchange narrow and verify collisions on the way back; the fixture
  keys by the line text so the result is exactly collision-free and the
  DuckDB oracle can reproduce it with a window function.

No Python in the row path: explode/groupBy/join/array_join only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic pseudo-line segmentation for corpora that carry no
# newlines (the synthetic fixture docs are single-line token streams):
# insert a newline after every 10th token.  Expressed as a regex so the
# DuckDB oracle can apply the identical transform.
SEGMENT_TOKENS = 10
_SEG_PATTERN = r"((?:\S+ ){" + str(SEGMENT_TOKENS - 1) + r"}\S+) "


def segment_text(text: Column | str, delim: str = "\n") -> Column:
    """Break a whitespace token stream into fixed 10-token lines."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(t, _SEG_PATTERN, r"$1" + delim)


def explode_lines(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", delim: str = "\n") -> DataFrame:
    """docs -> (doc_id, line_no, line); blank lines dropped, lines
    trimmed.  line_no is the 0-based position within the document."""
    return (docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), delim))
        .alias("line_no", "raw"))
        .withColumn("line", F.trim("raw"))
        .filter(F.col("line") != "")
        .drop("raw"))


def line_dedup(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", delim: str = "\n") -> DataFrame:
    """Corpus-wide first-occurrence line dedup.

    A line survives only in the document where it first appears, ordered
    by (doc_id, line_no) — every later occurrence (same doc or any other)
    is removed.  Returns one row per input document:
    (doc_id, n_lines, n_kept, text_dedup) where text_dedup is the
    surviving lines re-joined in original order ('' if none survive).
    """
    lines = explode_lines(docs, text_col, id_col, delim)
    # election: min(struct) is map-side combinable, so a boilerplate line
    # occurring 10^9 times still reduces to one row per map partition
    # before the exchange (no single-partition straggler, unlike a
    # row_number window partitioned by line)
    first = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_no")).alias("first"))
    # tag-join instead of filter-join so totals and kept counts come out
    # of ONE per-doc aggregate (one scan of the exploded lines here plus
    # one in the election above — collect_list skips the nulls that
    # when() leaves on dropped lines)
    tagged = (lines.join(first, "line")
              .withColumn("keep",
                          (F.col("doc_id") == F.col("first.doc_id"))
                          & (F.col("line_no") == F.col("first.line_no"))))
    per_doc = tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(
                F.when(F.col("keep"), F.struct("line_no", "line")))),
                lambda s: s["line"]),
            delim).alias("text_dedup"))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .fillna({"n_lines": 0, "n_kept": 0, "text_dedup": ""})
            .select("doc_id", "n_lines", "n_kept", "text_dedup"))


def c4_line_filter(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", delim: str = "\n",
                   min_words: int = 3,
                   require_terminal_punct: bool = False,
                   banned_substrings: tuple[str, ...] = (
                       "lorem ipsum", "javascript", "cookie policy", "{"),
                   ) -> DataFrame:
    """C4's per-line cleaning rules (Raffel et al. 2020 §2.2): keep lines
    with >= min_words words, optionally require terminal punctuation, and
    drop lines containing boilerplate markers.  Returns one row per doc:
    (doc_id, n_lines, n_kept, text_clean)."""
    lines = explode_lines(docs, text_col, id_col, delim)
    low = F.lower("line")
    keep = F.size(F.split(F.col("line"), r"\s+")) >= min_words
    if require_terminal_punct:
        keep = keep & F.col("line").rlike(r'[.!?"”]$')
    for s in banned_substrings:
        keep = keep & ~low.contains(s.lower())
    kept = lines.filter(keep)
    per_doc = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(
                F.struct("line_no", "line"))), lambda s: s["line"]),
            delim).alias("text_clean"))
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(totals, "doc_id", "left")
            .join(per_doc, "doc_id", "left")
            .fillna({"n_lines": 0, "n_kept": 0, "text_clean": ""})
            .select("doc_id", "n_lines", "n_kept", "text_clean"))
