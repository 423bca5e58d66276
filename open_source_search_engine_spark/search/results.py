"""Query-time result post-filtering: the Msg51 setClusterLevels pass +
the Msg40 post-query filter loop, re-expressed as DataFrame stages.

Reference shape (all rank-ordered over the merged docid list):
- ``Msg51.cpp:457`` setClusterLevels — family filter (adult bit →
  CR_DIRTY), language filter (CR_BAD_LANG), then hostname clustering:
  a running count per siteHash26 in rank order; results beyond
  ``maxDocIdsPerHostname`` become CR_CLUSTERED.
- ``Msg40.cpp:1440-1460`` — urls carrying CDATA markers → CR_BAD_URL,
  empty title+summary → CR_EMPTY_TITLE_SUMMARY.
- ``Msg40.cpp:1465-1520`` — duplicate-summary removal: for each still-
  visible result i (rank order), any lower-ranked visible m whose
  summary vector is >= percentSimilarSummary Dice-similar to i's gets
  CR_DUP_SUMMARY.  Greedy and sequential: a result marked dup never
  serves as a dedup source itself.
- ``Msg40.cpp:1525-1600`` — duplicate-URL removal: normalize (redirect
  url preferred, trailing slash stripped, recognized language/country
  subdomain stripped, lowercased, scheme dropped), first visible result
  per normalized hash wins, later ones get CR_DUP_URL.

Spark shape:
- every stage except dup-summary is pure Catalyst: boolean projections
  plus rank-ordered ``row_number`` windows partitioned by
  (query, site-hash) / (query, url-hash) — no driver loop, no UDF.
- dup-summary is inherently sequential-greedy (similarity is not
  transitive), so it runs as ``applyInPandas`` per query group.  The
  input is the already-ranked result page (<= docsWanted rows, like the
  reference's m_numReplies), so each group is small and bounded no
  matter the corpus size — the 100 TB scale knob is the number of
  concurrent queries, which parallelizes across groups.

The summary "gigabit vector" (``XmlDoc.cpp:4382`` getSummaryVector →
computeVector) is the deduped word set of title+summary; similarity is
``XmlDoc.cpp:4705`` computeSimilarity with unit scores, which for
deduped vectors reduces to Dice: 100 * 2|A∩B| / (|A|+|B|).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# cluster levels (Msg51.h enum — reference ordinal values kept)
CR_DIRTY = 3
CR_BAD_LANG = 4
CR_CLUSTERED = 5
CR_BAD_URL = 6
CR_EMPTY_TITLE_SUMMARY = 8
CR_DUP_SUMMARY = 10
CR_DUP_URL = 14
CR_OK = 16

# language/country prefixes stripped before the dup-URL compare
# (Msg40.cpp:1958 s_subDoms)
SUB_DOMS = (
    "en fr es ru zz ja tw cn ko de nl it fi sv no pt vi ar he id el th "
    "hi bn pl tl us uk www").split()

MAX_PER_SITE = 2          # maxDocIdsPerHostname default (SearchInput)


# ---------------------------------------------------------------------------
# dup-URL normalization (Msg40.cpp:1525-1600) — Python twin + Catalyst form
# ---------------------------------------------------------------------------

def normalize_result_url(url: str, redirect_url: str | None = None) -> str:
    """The compare key the reference hashes: redirect url preferred,
    scheme dropped, trailing slash dropped, one recognized subdomain
    prefix stripped when a path is present, lowercased."""
    u = (redirect_url or url or "").strip().lower()
    u = re.sub(r"^[a-z][a-z0-9+.-]*://", "", u)
    if u.endswith("/"):
        u = u[:-1]
    host, sep, path = u.partition("/")
    if sep and path:                       # getPathLen() > 1
        # the reference tests the ENTIRE prefix before the mid-domain
        # (Msg40.cpp:1563-1569), so only sub.mid.tld hosts whose single
        # sub label is recognized ever strip; mid-domain is approximated
        # as the second-to-last label (multi-part TLDs stay unstripped)
        labels = host.split(".")
        if len(labels) == 3 and labels[0] in SUB_DOMS:
            host = ".".join(labels[1:])
    return host + (sep + path if sep else "")


def normalize_result_url_col(url: Column, redirect_url: Column | None = None
                             ) -> Column:
    """Catalyst twin of :func:`normalize_result_url` (no UDF)."""
    u = F.lower(F.trim(F.coalesce(redirect_url, url)
                       if redirect_url is not None else url))
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"/$", "")
    sub = "|".join(SUB_DOMS)
    # strip one recognized subdomain label iff a path follows and exactly
    # two host labels remain (sub.mid.tld — see normalize_result_url)
    return F.regexp_replace(u, r"^(?:%s)\.(?=[^/.]+\.[^/.]+/)" % sub, "")


def host_of(url: Column) -> Column:
    """Hostname for site clustering (Clusterdb siteHash26 analogue)."""
    return F.regexp_extract(F.lower(url), r"^(?:[a-z][a-z0-9+.-]*://)?([^/]+)",
                            1)


# ---------------------------------------------------------------------------
# summary-vector similarity (XmlDoc.cpp:4705 computeSimilarity, unit scores)
# ---------------------------------------------------------------------------

def summary_vector(title: str, summary: str) -> frozenset[str]:
    """getSummaryVector analogue: the deduped alnum-word set of
    title+summary (computeVector dedups word ids; the sampling mask only
    engages past ~3000 unique words, far beyond any summary)."""
    return frozenset(re.findall(r"[0-9a-z]+",
                                ((title or "") + " " + (summary or ""))
                                .lower()))


def dice_percent(a: frozenset, b: frozenset) -> float:
    """computeSimilarity with unit scores over deduped vectors:
    100 * (2 * matches) / (|a| + |b|); empty side → 0 like the ref."""
    if not a or not b:
        return 0.0
    return 100.0 * 2 * len(a & b) / (len(a) + len(b))


def _greedy_dup_summary(pdf: pd.DataFrame, dedup_percent: int) -> pd.DataFrame:
    """Msg40.cpp:1473-1520 loop over one query's ranked results: visible
    result i marks every lower-ranked visible m with similarity >=
    dedup_percent; marked rows never serve as sources."""
    pdf = pdf.sort_values("rank").reset_index(drop=True)
    vecs = [summary_vector(t, s) for t, s in zip(pdf["title"], pdf["summary"])]
    level = pdf["cluster_level"].to_numpy().copy()
    n = len(pdf)
    for i in range(n):
        if level[i] != CR_OK:
            continue
        for m in range(i + 1, n):
            if level[m] != CR_OK:
                continue
            if dice_percent(vecs[i], vecs[m]) >= dedup_percent:
                level[m] = CR_DUP_SUMMARY
    pdf["cluster_level"] = level
    return pdf


# ---------------------------------------------------------------------------
# the staged filter
# ---------------------------------------------------------------------------

def filter_results(results: DataFrame, *,
                   group_col: str | None = None,
                   max_per_site: int = MAX_PER_SITE,
                   do_site_clustering: bool = True,
                   family_filter: bool = False,
                   lang_filter: str | None = None,
                   dedup_percent: int = 0,
                   dedup_url: bool = False,
                   site_key_hash26: bool = False) -> DataFrame:
    """Annotate a ranked result frame with ``cluster_level``.

    ``results`` needs: ``rank`` (0 = best, unique per query), ``url``,
    ``lang``, ``is_adult``, ``title``, ``summary``; optional
    ``redirect_url``; optional ``group_col`` naming the query id column
    when the frame holds many queries' results at once.

    Rows keep their reference cluster level; ``visible`` =
    ``cluster_level == CR_OK`` (Msg51.h: only CR_OK is displayed).
    """
    grp = [group_col] if group_col else []
    df = results
    if "redirect_url" not in df.columns:
        df = df.withColumn("redirect_url", F.lit(None).cast("string"))

    lvl = F.lit(CR_OK)
    # Msg51: family filter, then language filter (both before clustering)
    if family_filter:
        lvl = F.when(F.col("is_adult"), CR_DIRTY).otherwise(lvl)
    if lang_filter:
        lvl = F.when((lvl == CR_OK) & (F.col("lang") != lang_filter),
                     CR_BAD_LANG).otherwise(lvl)
    df = df.withColumn("cluster_level", lvl.cast("int"))

    # Msg51: hostname clustering — rank-ordered running count per site.
    # Only rows that reached the clustering step (still CR_OK) count:
    # a dirty/bad-lang result never increments its site's tally
    # (Msg51.cpp:511-516 `goto loop` fires before the count).
    if do_site_clustering:
        ok = df.filter(F.col("cluster_level") == CR_OK)
        rest = df.filter(F.col("cluster_level") != CR_OK)
        if site_key_hash26:
            # Reference-exact Msg51 key: the 26-bit truncation of the
            # host hash32 stored in the cluster rec (Clusterdb.h:81-84)
            # — distinct hosts colliding in 26 bits DO cluster together,
            # a quirk the pure-Catalyst host-string default avoids.
            import pandas as pd
            from pyspark.sql import types as T
            from ..functions.clusterdb import site_hash26

            @F.pandas_udf(T.LongType())
            def _h26(hosts: pd.Series) -> pd.Series:
                return pd.Series(site_hash26(hosts))

            site_key = _h26(host_of(F.col("url")))
        else:
            site_key = host_of(F.col("url"))
        w = Window.partitionBy(*grp, site_key).orderBy("rank")
        ok = ok.withColumn(
            "cluster_level",
            F.when(F.row_number().over(w) > max_per_site, CR_CLUSTERED)
            .otherwise(F.lit(CR_OK)).cast("int"))
        df = ok.unionByName(rest)

    # Msg40:1440-1460 — CDATA-marker urls, empty title+summary
    bad_url = F.col("url").contains("<![CDATA[") | F.col("url").contains("]]>")
    empty = (F.length(F.trim(F.coalesce(F.col("title"), F.lit("")))) == 0) & \
            (F.length(F.trim(F.coalesce(F.col("summary"), F.lit("")))) == 0)
    df = df.withColumn(
        "cluster_level",
        F.when((F.col("cluster_level") == CR_OK) & bad_url, CR_BAD_URL)
        .when((F.col("cluster_level") == CR_OK) & empty,
              CR_EMPTY_TITLE_SUMMARY)
        .otherwise(F.col("cluster_level")).cast("int"))

    # Msg40:1465-1520 — greedy dup-summary (bounded: one ranked result
    # page per group)
    if dedup_percent:
        schema = df.schema
        dp = int(dedup_percent)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return _greedy_dup_summary(pdf, dp)

        df = (df.groupBy(*(grp or [F.lit(1).alias("_g")]))
              .applyInPandas(kernel, schema=schema))

    # Msg40:1525-1600 — dup-URL: first visible per normalized hash wins
    if dedup_url:
        norm = normalize_result_url_col(F.col("url"), F.col("redirect_url"))
        vis = df.filter(F.col("cluster_level") == CR_OK)
        invis = df.filter(F.col("cluster_level") != CR_OK)
        wu = Window.partitionBy(*grp, norm).orderBy("rank")
        vis = vis.withColumn(
            "cluster_level",
            F.when(F.row_number().over(wu) > 1, CR_DUP_URL)
            .otherwise(F.lit(CR_OK)).cast("int"))
        df = vis.unionByName(invis)

    return df


def visible(df: DataFrame) -> DataFrame:
    """Only CR_OK rows are displayed (Msg51.h isVisible)."""
    return df.filter(F.col("cluster_level") == CR_OK)
