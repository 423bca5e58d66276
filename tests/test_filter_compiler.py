"""F9 equivalence: the Python AST evaluator (oracle side) and the compiled
Catalyst when()-chain (pipeline side) must agree on every rule ladder and
candidate — exercised over the full atom grammar (flags, numerics with all
six comparators, tld sets, prefix/suffix/substring, negation, &&)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.config import UrlFilterRule
from open_source_search_engine_spark.functions.urlfilters import (
    eval_atoms, match_rule_index, parse_expression)
from open_source_search_engine_spark.pipeline.filters import (
    compile_rule_match)

NOW_S = 1_700_100_000

LADDER = [
    "errorcount>=3 && hastmperror",
    "!hasreply && isaddurl",
    "hopcount==0 && iswww",
    "tld==com,org && hopcount<=2",
    "^http://www.mega",
    "$.html",
    "dir3",
    "urlage>50000",
    "spiderwaited<600 && hasreply",
    "isroot && !isindexed",
    "isnew",
    "sitenuminlinks>100",
    "httpstatus==404",
    "errorcode!=0",
    "lastspidertime>1700000000",
    "isinjecting",
    "default",
]


def _candidates():
    urls = ["http://www.mega.example/", "http://a.example.com/dir3/x.html",
            "http://b.example.org/page.php?q=1",
            "http://c.example.net/feed.atom",
            "http://d.example.net/2021/05/my-long-post-title-here"]
    out = []
    i = 0
    for url, hop, has_reply, err_code, err_count in itertools.product(
            urls, [0, 1, 3], [False, True], [0, 32769, 404], [0, 1, 3]):
        tld = url.split("/")[2].rsplit(".", 1)[-1]
        out.append({
            "url": url, "path_cgi": "/" + url.split("/", 3)[-1],
            "tld": tld, "hop_count": hop,
            "is_add_url": i % 3 == 0, "is_injecting": i % 7 == 0,
            "is_www": url.startswith("http://www."),
            "has_reply": has_reply, "err_code": err_code,
            "err_count": err_count,
            "http_status": 404 if err_code == 404 else 200,
            "is_indexed": has_reply and err_code == 0,
            "site_num_inlinks": (i * 37) % 300,
            "page_num_inlinks": (i * 13) % 21,
            "site_pages": (i * 7) % 40,
            "domain_pages": (i * 11) % 60,
            "site_tags": ["authority"] if i % 5 == 0 else [],
            "has_authority_inlink": i % 9 == 0,
            "in_site_list": i % 4 == 0,
            "percent_changed_per_day": (i * 17) % 101,
            "last_spider_time_s": 1_700_000_000 + (i % 5) * 500,
            "discovery_time": NOW_S - (i % 4) * 40000,
            "discovery_time_s": NOW_S - (i % 4) * 40000,
            "now_s": NOW_S,
        })
        i += 1
    return out


def test_parser_rejects_unknown_keyword():
    with pytest.raises(ValueError):
        parse_expression("frobnicate>=3")
    with pytest.raises(ValueError):
        parse_expression("tld<com")


def test_negation_and_conjunction():
    atoms = parse_expression("!hasreply && hopcount<=1 && !iswww")
    c = {"has_reply": False, "hop_count": 1, "is_www": False}
    assert eval_atoms(atoms, c)
    assert not eval_atoms(atoms, {**c, "is_www": True})
    assert not eval_atoms(atoms, {**c, "hop_count": 2})


def test_catalyst_chain_equals_python_eval(spark):
    rules = [UrlFilterRule(e, priority=10 + i) for i, e in enumerate(LADDER)]
    parsed = [parse_expression(r.expression) for r in rules]
    cands = _candidates()
    want = [match_rule_index(parsed, c) for c in cands]

    rows = [{**c, "cand_id": i} for i, c in enumerate(cands)]
    for r in rows:
        r.pop("discovery_time_s")
        r.pop("now_s")
    df = spark.createDataFrame(rows)
    got_rows = (df.withColumn("ufn", compile_rule_match(rules, NOW_S))
                .select("cand_id", "ufn").collect())
    got = [None] * len(cands)
    for r in got_rows:
        got[r["cand_id"]] = r["ufn"]
    assert got == want
    assert len(set(want)) > 8, "grid must exercise many distinct rules"


FULL_FAMILY = [
    "ismanualadd", "isnewrequest && hopcount<=3", "!isrss", "isrssext",
    "ispermalink", "ispermalinkformat", "isdocidbased", "isreindex",
    "isfakeip", "ispingserver", "insitelist", "hasauthorityinlink",
    "tag:authority", "percentchangedperday>5", "numinlinks>=2",
    "sitepages>20", "domainpages>30",
    "age>100000", "lang==en,de", "lang!=zh",
]


def test_full_reference_keyword_family_parses():
    for expr in FULL_FAMILY:
        atoms = parse_expression(expr)
        assert atoms, expr


def test_full_family_catalyst_equals_python(spark):
    """The privacore-style keywords the fixture models as constants must
    still compile and agree between evaluator and Catalyst chain."""
    rules = [UrlFilterRule(e, priority=i) for i, e in
             enumerate(FULL_FAMILY)] + [UrlFilterRule("default", 99)]
    parsed = [parse_expression(r.expression) for r in rules]
    cands = _candidates()   # full grid: every url incl. rss/permalink shapes
    want = [match_rule_index(parsed, c) for c in cands]
    rows = [{**c, "cand_id": i} for i, c in enumerate(cands)]
    for r in rows:
        r.pop("discovery_time_s")
        r.pop("now_s")
    df = spark.createDataFrame(rows)
    got_rows = (df.withColumn("ufn", compile_rule_match(rules, NOW_S))
                .select("cand_id", "ufn").collect())
    got = [None] * len(cands)
    for r in got_rows:
        got[r["cand_id"]] = r["ufn"]
    assert got == want
