"""Query-serving tier: inverted index build + posting-list intersection +
top-K ranking — the Spark re-expression of Posdb/PosdbTable/TopTree
(SURVEY.md §2.3 Q2/Q3).

Reference shape:
- Posdb stores (term, doc, position) keys sorted by term then doc
  (``Posdb.h``); a query zipper-intersects the termlists with positional
  scoring (``PosdbTable.cpp:3044-5115`` intersectLists10_r) and keeps a
  balanced top-K (``TopTree.cpp:209``).

Spark shape:
- the index IS a DataFrame ``postings(term, doc_id, tf, positions)``
  bucketable by term — a termlist lookup is a partition-pruned filter
- intersection = N-way inner join on doc_id (Catalyst picks
  broadcast/shuffle per termlist size; rare terms broadcast)
- scoring = tf sum + a proximity bonus from the position arrays
  (min pairwise gap, like the reference's position-pair scoring loops)
- top-K = ``ORDER BY score LIMIT k`` → TakeOrderedAndProject, Spark's
  native TopTree equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """documents → postings(term, doc_id, tf, positions).  Pure Catalyst:
    split + posexplode + groupBy; at scale write this bucketed by term so
    termlist reads are single-bucket scans (the Posdb shard analogue)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+"))
        .alias("pos", "term"))
    return (toks.filter(F.length("term") > 0)
            .groupBy("term", "doc_id")
            .agg(F.count("*").alias("tf"),
                 F.sort_array(F.collect_list("pos")).alias("positions")))


def build_postings_ref_tokens(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              has_tags: bool = True) -> DataFrame:
    """Postings built with the reference's Words.cpp segmenter
    (functions/words.py) instead of the whitespace split: HTML tags
    dropped, ``java++``/``c#``/``1,000.50``/``we're`` kept whole, CJK
    one codepoint per term.  Arrow-batched pandas_udf — one Python pass
    per document, then the same pure-Catalyst explode/groupBy as
    ``build_postings`` (term-bucketable identically)."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.words import words_batch

    @pandas_udf("array<string>")
    def _seg(texts):
        return words_batch(texts, has_tags=has_tags)

    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        _seg(F.col(text_col)).alias("_w"))
            .select("doc_id",
                    F.posexplode(F.expr("transform(_w, x -> lower(x))"))
                    .alias("pos", "term")))
    return (toks.groupBy("term", "doc_id")
            .agg(F.count("*").alias("tf"),
                 F.sort_array(F.collect_list("pos")).alias("positions")))


def build_postings_with_anchors(docs: DataFrame, links: DataFrame,
                                text_col: str = "text",
                                id_col: str = "doc_id") -> DataFrame:
    """Postings that also index INCOMING link text, like the reference's
    term table: XmlDoc::getCountTable hashes each inlink's anchor text
    into the linked-to document's term counts (``XmlDoc.cpp:4150-4172``
    "add each incoming link text", via Msg25's LinkInfo).

    ``links(dst_doc_id, anchor_text)`` — one row per inlink.  Anchor
    terms contribute tf to the DESTINATION doc but carry no body
    positions (the reference hashes them without body offsets; proximity
    scoring only sees body hits).  One extra shuffle: the anchor-side
    groupBy co-keys with the body aggregate on (term, doc_id), and at
    scale both sides bucket by term exactly like ``build_postings``."""
    body = build_postings(docs, text_col=text_col, id_col=id_col)
    anchor_toks = links.select(
        F.col("dst_doc_id").alias("doc_id"),
        F.explode(F.split(F.lower(F.col("anchor_text")), r"\s+"))
        .alias("term"))
    anchors = (anchor_toks.filter(F.length("term") > 0)
               .groupBy("term", "doc_id")
               .agg(F.count("*").alias("anchor_tf")))
    return (body.join(anchors, ["term", "doc_id"], "full_outer")
            .select("term", "doc_id",
                    (F.coalesce(F.col("tf"), F.lit(0))
                     + F.coalesce(F.col("anchor_tf"), F.lit(0)))
                    .cast("long").alias("tf"),
                    F.coalesce(F.col("positions"),
                               F.array().cast("array<int>"))
                    .alias("positions")))


def _min_gap(a, b):
    """Minimum absolute distance between two sorted position arrays — the
    proximity kernel, as a LINEAR sorted-merge like the reference's zipper
    (``PosdbTable.cpp:3044+``), pure Catalyst (no UDF): tag each position
    with its source list, merge-sort once, and fold tracking the last
    position seen from each side.  The true min |x-y| is always achieved
    by a cross-source pair adjacent in the merged order, so one O(n+m)
    aggregate replaces the |a|x|b| cartesian (which for stopword-frequency
    terms with tf in the thousands was an OOM-shaped cell explosion)."""
    merged = F.array_sort(F.concat(
        F.transform(a, lambda x: F.struct(x.cast("long").alias("p"),
                                          F.lit(0).alias("src"))),
        F.transform(b, lambda y: F.struct(y.cast("long").alias("p"),
                                          F.lit(1).alias("src")))))
    init = F.struct(F.lit(None).cast("long").alias("l0"),
                    F.lit(None).cast("long").alias("l1"),
                    F.lit(None).cast("long").alias("best"))

    def step(acc, e):
        is0 = e["src"] == 0
        gap = F.when(is0, e["p"] - acc["l1"]).otherwise(e["p"] - acc["l0"])
        return F.struct(
            F.when(is0, e["p"]).otherwise(acc["l0"]).alias("l0"),
            F.when(~is0, e["p"]).otherwise(acc["l1"]).alias("l1"),
            F.least(acc["best"], gap).alias("best"))   # least skips nulls

    return F.aggregate(merged, init, step, lambda acc: acc["best"])


SAME_LANG_WEIGHT = 20       # Parms.cpp:4134 'same lang weight' default
SITE_RANK_SCALE = 9         # our integer scores = reference floats * 9


def score_with_boosts(results: DataFrame, doc_meta: DataFrame,
                      qlang: str | None = None,
                      same_lang_weight: int = SAME_LANG_WEIGHT,
                      k: int | None = None) -> DataFrame:
    """Final-score boosts from PosdbTable.cpp:4413-4426, in exact integer
    arithmetic so the result value-hashes identically across engines:

    - effectiveSiteRank = siteRank + (highestInlinkSiteRank-siteRank)/3
      when a higher-ranked site links in ("don't adjust it too much");
    - score *= effectiveSiteRank * 1/3 + 1   (SITERANKMULTIPLIER);
    - score *= sameLangWeight when the query language matches the doc's
      or either is unknown ("not foreign language? give a huge boost").

    The two float multipliers combine to (3*sr + max(hisr-sr,0) + 9)/9,
    so our integer score is the reference's float score scaled by 9
    (``SITE_RANK_SCALE``) — ordering identical, values exact.

    ``doc_meta``: (doc_id, site_rank, highest_inlink_site_rank, lang);
    missing columns default to rank 0 / unknown lang."""
    m = doc_meta
    sr = (F.col("site_rank") if "site_rank" in m.columns
          else F.lit(0)).cast("long")
    hisr = (F.col("highest_inlink_site_rank")
            if "highest_inlink_site_rank" in m.columns
            else F.lit(0)).cast("long")
    lang = F.col("lang") if "lang" in m.columns else F.lit(None)
    meta = m.select("doc_id", sr.alias("_sr"), hisr.alias("_hisr"),
                    lang.alias("_lang"))
    out = results.join(meta, "doc_id", "left").fillna(
        {"_sr": 0, "_hisr": 0})
    mult = F.lit(3) * F.col("_sr") + F.greatest(
        F.col("_hisr") - F.col("_sr"), F.lit(0)) + F.lit(9)
    same = (F.lit(qlang is None) | F.col("_lang").isNull()
            | (F.col("_lang") == F.lit(qlang or "")))
    boosted = (F.col("score") * mult
               * F.when(same, F.lit(int(same_lang_weight)))
               .otherwise(F.lit(1)))
    out = (out.select("doc_id", boosted.cast("long").alias("score"))
           .orderBy(F.desc("score"), "doc_id"))
    return out.limit(k) if k else out


def search(postings: DataFrame, terms: list[str], k: int = 10) -> DataFrame:
    """AND-intersect termlists, score tf-sum + proximity bonus, top-K.

    Returns (doc_id, score, min_gap) — deterministic tie-break on doc_id.
    """
    assert terms, "empty query"
    terms = [t.lower() for t in terms]
    lists = [
        postings.filter(F.col("term") == t).select(
            "doc_id",
            F.col("tf").alias(f"tf_{i}"),
            F.col("positions").alias(f"pos_{i}"))
        for i, t in enumerate(terms)
    ]
    joined = lists[0]
    for nxt in lists[1:]:
        joined = joined.join(nxt, "doc_id", "inner")   # zipper-intersect
    tf_sum = sum((F.col(f"tf_{i}") for i in range(1, len(terms))),
                 F.col("tf_0"))
    if len(terms) >= 2:
        gap = _min_gap(F.col("pos_0"), F.col("pos_1"))
        for i in range(2, len(terms)):
            gap = F.least(gap, _min_gap(F.col(f"pos_{i-1}"),
                                        F.col(f"pos_{i}")))
        # adjacent terms score like the reference's in-order pair bonus
        score = (tf_sum * 10
                 + F.when(gap <= 1, 50).when(gap <= 4, 20)
                 .when(gap <= 16, 5).otherwise(0))
    else:
        gap = F.lit(None).cast("int")
        score = tf_sum * 10
    return (joined
            .select("doc_id", score.cast("long").alias("score"),
                    gap.cast("long").alias("min_gap"))
            .orderBy(F.desc("score"), "doc_id")
            .limit(k))


# termfreq weight (the reference's collection-frequency scoring knob):
# getTermFreqWeight (PosdbTable.cpp:613-628, applied per term pair at
# PosdbTable.cpp:766,1006,1063) maps the term's document-frequency RATIO
# through scale_linear(ratio, freqMin, freqMax, wMin, wMax)
# (ScalingFunctions.cpp:3-12) with the Parms.cpp:4138-4186 defaults
# freq [0.0, 0.5] -> weight [0.5, 1.0]: a term in half the collection or
# more weighs 1.0, a vanishing term 0.5 (frequent terms weigh MORE — the
# reference trusts intersection to handle selectivity).  Integer-exact at
# x1000: w1000 = 500 + least(500, (1000 * df) DIV numDocs).
TFW_SCALE = 1000


def term_freq_weights(postings: DataFrame, num_docs: int) -> DataFrame:
    """(term, w1000): integer-exact getTermFreqWeight per distinct term.
    df = documents containing the term (the termlist length the reference
    estimates from list size, PosdbTable.cpp:617-620); one aggregate,
    map-side combinable."""
    assert num_docs > 0
    df = postings.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df"))
    return df.select(
        "term",
        (F.lit(500) + F.least(
            F.lit(500),
            F.expr(f"(1000 * df) DIV {int(num_docs)}")))
        .cast("long").alias("w1000"))


def search_tfw(postings: DataFrame, terms: list[str], num_docs: int,
               k: int = 10) -> DataFrame:
    """AND search with termfreq weighting: each term's contribution is
    tf * 10 * w1000 (score scale x1000 vs plain search).  The weight
    join is per-TERM (a handful of rows) — broadcast, no extra shuffle
    on the doc axis."""
    assert terms, "empty query"
    terms = [t.lower() for t in terms]
    tls = postings.filter(F.col("term").isin(terms))
    w = term_freq_weights(tls, num_docs)
    scored = (tls.join(F.broadcast(w), "term")
              .select("term", "doc_id",
                      (F.col("tf") * 10 * F.col("w1000")).alias("_s")))
    parts = [scored.filter(F.col("term") == t)
             .select("doc_id", F.col("_s").alias(f"_s{i}"))
             for i, t in enumerate(terms)]
    base = parts[0]
    for p in parts[1:]:
        base = base.join(p, "doc_id")
    total = F.col("_s0")
    for i in range(1, len(parts)):
        total = total + F.col(f"_s{i}")
    return (base.select(F.col("doc_id").cast("long").alias("doc_id"),
                        total.cast("long").alias("score"))
            .orderBy(F.desc("score"), "doc_id")
            .limit(k))


def build_bigram_postings(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Bigram termlists: postings(term, doc_id, tf, positions) where term
    = 'w1_w2' for each ADJACENT word pair, positions = first word's slot.

    The reference indexes every two-word phrase alongside the single
    words (Phrases.h:3-6 "generate phrases ... it only hashes 2+ word
    phrases"; XmlDoc hashes m_phraseIds2 into the term table) so a
    quoted 2-word phrase is answered from ONE termlist instead of a
    position-verify join — the same trade here: index once, turn the
    phrase query's positions join into a single bucket-prunable scan.
    Adjacency matches the position-chain rule exactly (pair slots differ
    by 1, both tokens non-empty), so the bigram path is result-identical
    to the position verify."""
    t = F.split(F.lower(F.col(text_col)), r"\s+")
    pairs = F.expr("""
        filter(
          transform(slice(_t, 1, greatest(size(_t) - 1, 0)),
                    (w, i) -> struct(w AS w1,
                                     element_at(_t, i + 2) AS w2,
                                     i AS pos)),
          p -> length(p.w1) > 0 AND length(p.w2) > 0)
    """)
    ex = (docs.withColumn("_t", t)
          .select(F.col(id_col).alias("doc_id"),
                  F.explode(pairs).alias("p"))
          .select("doc_id",
                  F.concat("p.w1", F.lit("_"), "p.w2").alias("term"),
                  F.col("p.pos").alias("pos")))
    return (ex.groupBy("term", "doc_id")
            .agg(F.count("*").alias("tf"),
                 F.sort_array(F.collect_list("pos")).alias("positions")))
