"""Query-time result post-filtering (Msg51 setClusterLevels + Msg40
post-query loop): site clustering, family/lang filters, dup-summary
greedy removal, dup-URL normalize-first-wins — each stage pinned
against a hand-computed expectation or an independent Python twin."""

import pandas as pd
import pytest

from open_source_search_engine_spark.search.results import (
    CR_BAD_LANG, CR_BAD_URL, CR_CLUSTERED, CR_DIRTY, CR_DUP_SUMMARY,
    CR_DUP_URL, CR_EMPTY_TITLE_SUMMARY, CR_OK, dice_percent, filter_results,
    normalize_result_url, summary_vector, visible)


def _mk(spark, rows):
    cols = ["rank", "url", "lang", "is_adult", "title", "summary"]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=cols[:len(rows[0])]))


def _levels(df):
    return {r["rank"]: r["cluster_level"]
            for r in df.select("rank", "cluster_level").collect()}


# ---------------------------------------------------------------------------
# URL normalization twin (Msg40.cpp:1525-1600)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("url,want", [
    ("http://Example.com/Page", "example.com/page"),
    ("https://example.com/dir/", "example.com/dir"),
    ("http://www.example.com/x", "example.com/x"),          # s_subDoms
    ("http://en.example.com/x", "example.com/x"),
    ("http://www.example.com", "www.example.com"),          # no path → keep
    ("http://us.en.example.com/x", "us.en.example.com/x"),  # multi-label
    ("http://blog.example.com/x", "blog.example.com/x"),    # unrecognized
    ("example.com/x", "example.com/x"),                     # schemeless
])
def test_normalize_result_url(url, want):
    assert normalize_result_url(url) == want


def test_normalize_prefers_redirect_url():
    # Msg40.cpp:1546-1551: the redirect url represents the content
    assert normalize_result_url("http://a.com/x", "http://b.com/y") == \
        "b.com/y"


def test_normalize_catalyst_matches_python(spark):
    from pyspark.sql import functions as F
    from open_source_search_engine_spark.search.results import (
        normalize_result_url_col)
    urls = ["http://Example.com/Page", "https://example.com/dir/",
            "http://www.example.com/x", "http://en.example.com/x",
            "http://www.example.com", "http://us.en.example.com/x",
            "http://blog.example.com/x", "example.com/x",
            "http://fr.shop.example.com/x", "http://de.site.org/a/b/c"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r[0] for r in df.select(
        normalize_result_url_col(F.col("url"))).collect()]
    assert got == [normalize_result_url(u) for u in urls]


# ---------------------------------------------------------------------------
# similarity kernel (XmlDoc.cpp:4705 computeSimilarity, unit scores)
# ---------------------------------------------------------------------------

def test_dice_percent():
    a = summary_vector("alpha beta", "gamma delta")
    b = summary_vector("alpha beta", "gamma other")
    assert dice_percent(a, b) == 75.0          # 2*3/(4+4)
    assert dice_percent(a, a) == 100.0
    assert dice_percent(a, frozenset()) == 0.0  # empty side → 0 (ref)


# ---------------------------------------------------------------------------
# staged filter
# ---------------------------------------------------------------------------

def test_site_clustering_third_from_host_clustered(spark):
    rows = [(i, f"http://site-a.com/p{i}", "en", False, f"t{i}", f"s{i}")
            for i in range(4)]
    rows += [(4, "http://site-b.com/p", "en", False, "t4", "s4")]
    out = filter_results(_mk(spark, rows))
    lv = _levels(out)
    assert lv[0] == CR_OK and lv[1] == CR_OK
    assert lv[2] == CR_CLUSTERED and lv[3] == CR_CLUSTERED
    assert lv[4] == CR_OK


def test_family_and_lang_filter_skip_site_count(spark):
    # Msg51.cpp: dirty/bad-lang rows never increment their site's tally
    rows = [(0, "http://s.com/a", "en", True, "t", "s"),   # dirty
            (1, "http://s.com/b", "de", False, "t", "s"),  # bad lang
            (2, "http://s.com/c", "en", False, "t", "s"),
            (3, "http://s.com/d", "en", False, "t", "s"),
            (4, "http://s.com/e", "en", False, "t", "s")]
    out = filter_results(_mk(spark, rows), family_filter=True,
                         lang_filter="en")
    lv = _levels(out)
    assert lv[0] == CR_DIRTY and lv[1] == CR_BAD_LANG
    assert lv[2] == CR_OK and lv[3] == CR_OK      # counts restart at rank 2
    assert lv[4] == CR_CLUSTERED


def test_bad_url_and_empty_title_summary(spark):
    rows = [(0, "http://a.com/<![CDATA[x", "en", False, "t", "s"),
            (1, "http://b.com/ok", "en", False, "", "  "),
            (2, "http://c.com/ok", "en", False, "t", "s")]
    out = filter_results(_mk(spark, rows), do_site_clustering=False)
    lv = _levels(out)
    assert lv[0] == CR_BAD_URL
    assert lv[1] == CR_EMPTY_TITLE_SUMMARY
    assert lv[2] == CR_OK


def test_dup_summary_greedy_not_transitive(spark):
    # A~B similar, B~C similar, A~C not: B is marked dup of A; C must
    # SURVIVE because its only near-match B is itself invisible when C's
    # turn comes (the reference's sequential greedy, Msg40.cpp:1473-1520)
    rows = [
        (0, "http://a.com/", "en", False, "w1 w2 w3 w4 w5 w6", ""),
        (1, "http://b.com/", "en", False, "w1 w2 w3 w4 w5 x1 x2", ""),
        (2, "http://c.com/", "en", False, "x1 x2 w1 w2 y1 y2 y3 y4", ""),
    ]
    out = filter_results(_mk(spark, rows), do_site_clustering=False,
                         dedup_percent=70)
    lv = _levels(out)
    a = summary_vector("w1 w2 w3 w4 w5 w6", "")
    b = summary_vector("w1 w2 w3 w4 w5 x1 x2", "")
    c = summary_vector("x1 x2 w1 w2 y1 y2 y3 y4", "")
    assert dice_percent(a, b) >= 70 and dice_percent(b, c) < 70
    assert dice_percent(a, c) < 70
    assert lv == {0: CR_OK, 1: CR_DUP_SUMMARY, 2: CR_OK}


def test_dup_summary_chain_marks_both(spark):
    # A~B and A~C: both lower-ranked dups are marked by source A
    rows = [
        (0, "http://a.com/", "en", False, "w1 w2 w3 w4", ""),
        (1, "http://b.com/", "en", False, "w1 w2 w3 w4 x1", ""),
        (2, "http://c.com/", "en", False, "w1 w2 w3 w4 y1", ""),
    ]
    out = filter_results(_mk(spark, rows), do_site_clustering=False,
                         dedup_percent=80)
    assert _levels(out) == {0: CR_OK, 1: CR_DUP_SUMMARY, 2: CR_DUP_SUMMARY}


def test_dup_url_first_visible_wins(spark):
    rows = [
        (0, "http://www.example.com/page", "en", False, "t0", "s0"),
        (1, "http://example.com/page/", "en", False, "t1", "s1"),
        (2, "http://en.example.com/page", "en", False, "t2", "s2"),
        (3, "http://other.com/page", "en", False, "t3", "s3"),
    ]
    out = filter_results(_mk(spark, rows), do_site_clustering=False,
                         dedup_url=True)
    lv = _levels(out)
    assert lv[0] == CR_OK
    assert lv[1] == CR_DUP_URL and lv[2] == CR_DUP_URL
    assert lv[3] == CR_OK


def test_stage_order_clustered_rows_skip_dedup(spark):
    # a CR_CLUSTERED row is invisible before the dup passes: it neither
    # serves as a dup-summary source nor claims a url slot
    rows = [
        (0, "http://s.com/a", "en", False, "u1 u2 u3 u4", ""),
        (1, "http://s.com/b", "en", False, "v1 v2 v3 v4", ""),
        (2, "http://s.com/c", "en", False, "w1 w2 w3 w4", ""),  # clustered
        (3, "http://t.com/d", "en", False, "w1 w2 w3 w4 z1", ""),
    ]
    out = filter_results(_mk(spark, rows), dedup_percent=80, dedup_url=True)
    lv = _levels(out)
    assert lv[2] == CR_CLUSTERED
    # rank 3 is 88% similar to the clustered rank-2 but must survive
    assert lv[3] == CR_OK


def test_multi_query_groups_independent(spark):
    rows = [("q1", 0, "http://s.com/a", "en", False, "t", "s"),
            ("q1", 1, "http://s.com/b", "en", False, "t", "s"),
            ("q1", 2, "http://s.com/c", "en", False, "t", "s"),
            ("q2", 0, "http://s.com/x", "en", False, "t", "s"),
            ("q2", 1, "http://s.com/y", "en", False, "t", "s")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["qid", "rank", "url", "lang",
                                    "is_adult", "title", "summary"]))
    out = filter_results(df, group_col="qid")
    lv = {(r["qid"], r["rank"]): r["cluster_level"]
          for r in out.select("qid", "rank", "cluster_level").collect()}
    assert lv[("q1", 2)] == CR_CLUSTERED     # 3rd same-site within q1
    assert lv[("q2", 0)] == CR_OK and lv[("q2", 1)] == CR_OK


def test_visible_helper(spark):
    rows = [(0, "http://a.com/x", "en", False, "t", "s"),
            (1, "http://a.com/y", "de", False, "t", "s")]
    out = filter_results(_mk(spark, rows), lang_filter="en")
    assert {r["rank"] for r in visible(out).collect()} == {0}
