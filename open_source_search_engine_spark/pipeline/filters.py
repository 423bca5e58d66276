"""F9: url-filter rule list → one chained ``F.when`` Column expression.

The reference walks the rule list per record in C (``getUrlFilterNum``,
``Spider.cpp:2202-3703``).  Here the ordered first-match-wins ladder compiles
ONCE into a single Catalyst expression tree (nested CASE WHEN) evaluated
JVM-side under whole-stage codegen — zero Python at runtime.

Input columns the compiled expression reads (from the candidate DataFrame):
url, path_cgi, tld, hop_count, is_add_url, is_injecting, is_www, has_reply,
err_code, err_count, http_status, is_indexed, site_num_inlinks,
last_spider_time_s, discovery_time, and the literal now_s (wave clock).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import TMP_ERROR_CODES, UrlFilterRule
from ..functions.urlfilters import Atom, parse_expression


def _atom_to_column(a: Atom, now_s: int) -> Column:
    if a.kind == "tag":
        col = _tag_column(a.name)
    elif a.kind == "flag":
        col = _flag_column(a.name)
    elif a.kind == "num":
        col = _num_compare(a, now_s)
    elif a.kind == "str":
        src = F.col("tld") if a.name == "tld" else F.lit("")  # no lang col
        inset = src.isin(list(a.value))
        col = inset if a.op == "==" else ~inset
    elif a.kind == "prefix":
        col = F.col("url").startswith(a.name)
    elif a.kind == "suffix":
        col = F.col("url").endswith(a.name)
    else:  # substr
        col = F.col("url").contains(a.name)
    return ~col if a.negated else col


def _flag_column(name: str) -> Column:
    if name == "default":
        return F.lit(True)
    if name == "hasreply":
        return F.col("has_reply")
    if name == "hastmperror":
        return F.col("has_reply") & F.col("err_code").isin(list(TMP_ERROR_CODES))
    if name == "isaddurl":
        return F.col("is_add_url")
    if name == "isinjecting":
        return F.col("is_injecting")
    if name == "iswww":
        return F.col("is_www")
    if name == "isindexed":
        return F.col("is_indexed")
    if name == "isroot":
        return F.col("path_cgi") == "/"
    if name in ("isnew", "isnewrequest"):
        return ~F.col("has_reply")
    if name == "ismanualadd":
        return F.col("is_add_url") | F.col("is_injecting")
    if name == "isrssext":
        # URL-format flag (Url::isRSSExt shape): feed-style extension
        return F.col("path_cgi").rlike(r"\.(rss|atom)(\?|$)")
    if name == "ispermalinkformat":
        # ::isPermalinkFormat (Permalink.cpp shape): dated archive path or
        # long hyphenated slug
        return (F.col("path_cgi").rlike(r"/\d{4}/\d{1,2}(/|$)")
                | F.col("path_cgi").rlike(r"/[^/?]*(-[^/?]*){3,}(\?|$)"))
    if name == "hasauthorityinlink":
        # fed by the F29 aggregate in _candidates: any stored link
        # occurrence from an authority-tagged site (Spider.cpp
        # m_hasAuthorityInlink / Linkdb+Tagdb)
        return F.coalesce(F.col("has_authority_inlink"), F.lit(False))
    if name == "insitelist":
        # seed-site-list domain membership (Spider.cpp:2418-2441 via the
        # m_siteListDomTable fast path), joined on in _candidates
        return F.coalesce(F.col("in_site_list"), F.lit(False))
    if name in ("isrss", "ispermalink", "isdocidbased", "isreindex",
                "isfakeip", "ispingserver"):
        # ispingserver is constant false IN THE REFERENCE TOO
        # (Url.cpp:2548 `bool Url::isPingServer() { return false; }`);
        # the others are content-/injection-path flags the deterministic
        # fixture never sets (no RSS parse, no docid reindex) — constant
        # False, matching the oracle's defaults; a deployment carrying
        # these columns swaps in F.col(...)
        return F.lit(False)
    raise AssertionError(name)


def _tag_column(tag: str) -> Column:
    """tag:NAME predicate (Spider.cpp:2430-2470) against the site_state
    tags dimension joined onto the candidate frame (Tagdb.cpp analogue)."""
    return F.array_contains(
        F.coalesce(F.col("site_tags"), F.array().cast("array<string>")),
        tag)


def _num_column(name: str, now_s: int) -> Column:
    gated = {  # reply-gated numerics read 0 when no reply (oracle parity)
        "errorcount": "err_count", "errorcode": "err_code",
        "httpstatus": "http_status", "lastspidertime": "last_spider_time_s",
        "percentchangedperday": "percent_changed_per_day",
    }
    if name in gated:
        return F.when(F.col("has_reply"), F.col(gated[name])).otherwise(F.lit(0))
    if name == "hopcount":
        return F.col("hop_count")
    if name == "sitenuminlinks":
        return F.col("site_num_inlinks")
    if name in ("urlage", "age"):
        return F.lit(now_s) - F.col("discovery_time")
    if name == "numinlinks":
        # F29 C-block inlink count, joined onto the candidate frame by
        # pipeline/crawl._candidates (SpiderColl.cpp:2701-2742)
        return F.col("page_num_inlinks")
    if name == "sitepages":
        return F.col("site_pages")      # F28 quota aggregates, ditto
    if name == "domainpages":
        return F.col("domain_pages")    # (SpiderColl.cpp:2754-2798)
    if name == "spiderwaited":
        return F.when(F.col("has_reply"),
                      F.lit(now_s) - F.col("last_spider_time_s")).otherwise(F.lit(-1))
    raise AssertionError(name)


def _num_compare(a: Atom, now_s: int) -> Column:
    col = _num_column(a.name, now_s)
    v = F.lit(a.value)
    return {"==": col == v, "!=": col != v, "<": col < v,
            ">": col > v, "<=": col <= v, ">=": col >= v}[a.op]


def compile_rule_match(rules: list[UrlFilterRule], now_s: int) -> Column:
    """Ordered ladder → one ``when`` chain returning the matched rule index
    (-1 = no match = never spider).  First match wins, exactly like
    ``getUrlFilterNum`` returning the first satisfied row."""
    expr: Column | None = None
    for i, rule in enumerate(rules):
        atoms = parse_expression(rule.expression)
        cond = F.lit(True)
        for a in atoms:
            cond = cond & _atom_to_column(a, now_s)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    assert expr is not None, "empty rule list"
    return expr.otherwise(F.lit(-1))


def rule_arrays(rules: list[UrlFilterRule]):
    """The parallel policy arrays (Collectiondb.h:440-460) as lookup Columns:
    matched index → priority / freq / ip_wait / ip_max / force_delete /
    harvest, via array literals indexed by ufn (pure Catalyst `element_at`)."""
    def arr(vals):
        return F.array(*[F.lit(v) for v in vals])

    idx = F.col("ufn") + 1  # element_at is 1-based
    return {
        "priority": F.element_at(arr([r.priority for r in rules]), idx),
        "max_per_rule": F.element_at(
            arr([r.max_spiders_per_rule for r in rules]), idx),
        "spider_freq_ms": F.element_at(
            arr([int(r.spider_freq_days * 86_400_000) for r in rules]), idx),
        "ip_wait_ms": F.element_at(arr([r.spider_ip_wait_ms for r in rules]), idx),
        "ip_max": F.element_at(arr([r.spider_ip_max_spiders for r in rules]), idx),
        "force_delete": F.element_at(arr([r.force_delete for r in rules]), idx),
        "harvest": F.element_at(arr([r.harvest_links for r in rules]), idx),
    }
