"""url-filter expression mini-language (F9, ``Spider.cpp:2202-3703``).

The reference's ``getUrlFilterNum`` walks an ordered rule list; each rule is
a ``&&``-conjunction of atoms, atoms may be negated with ``!``; the first
matching rule wins and its row index selects the parallel policy arrays
(priority, spiderFreq, maxSpidersPerRule, spiderIpWait, spiderIpMaxSpiders,
forceDelete — ``Collectiondb.h:440-460``).

Atom forms (subset covering the keyword families at ``Spider.cpp:2270-3695``):

- flags:   ``hasreply`` ``hastmperror`` ``isaddurl`` ``isinjecting``
           ``iswww`` ``isindexed`` ``isroot`` ``isnew`` ``default``
- numeric: ``hopcount`` ``errorcount`` ``errorcode`` ``httpstatus``
           ``sitenuminlinks`` ``lastspidertime`` ``urlage`` ``spiderwaited``
           with ``== != < > <= >=``
- string:  ``tld==com`` (comma-list allowed: ``tld==com,org``)
- URL:     ``^prefix`` (``Spider.cpp:3563-3597``), ``$suffix``
           (``Spider.cpp:3600-3640``), bare substring
           (``Spider.cpp:3642-3695``)

This module parses expressions into a tiny AST shared by:
  * the Python oracle (``eval_rule`` over a candidate dict), and
  * the Spark compiler (``pipeline/filters.py`` maps the same AST to one
    chained ``F.when`` Column — pure Catalyst at runtime).

Candidate fields the atoms read: url, path_cgi, tld, hop_count, is_add_url,
is_injecting, is_www, has_reply, err_code, err_count, http_status,
is_indexed, site_num_inlinks, last_spider_time_s, discovery_time_s, now_s.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import TMP_ERROR_CODES

_OPS = ("<=", ">=", "==", "!=", "<", ">")

FLAG_KEYWORDS = frozenset({
    "hasreply", "hastmperror", "isaddurl", "isinjecting", "isinjected",
    "iswww", "isindexed", "isroot", "isnew", "default",
    # full reference family (Spider.cpp:2270-3560).  ismanualadd /
    # isnewrequest derive from modeled state; the remaining flags read
    # request fields that the deterministic fixture never sets (no RSS
    # detection, no docid-based reindex, no fake-ip injects, no
    # pingservers, no site lists) — they evaluate from their fields,
    # defaulting False, so rule ladders written for the reference compile
    # and run unchanged.
    "ismanualadd", "isnewrequest", "isrss", "isrssext", "ispermalink",
    "ispermalinkformat", "isdocidbased", "isreindex", "isfakeip",
    "ispingserver", "insitelist", "hasauthorityinlink",
})
NUM_KEYWORDS = frozenset({
    "hopcount", "errorcount", "errorcode", "httpstatus", "sitenuminlinks",
    "lastspidertime", "urlage", "spiderwaited",
    # percentchangedperday reads its field, default 0 (no content-change
    # tracking in the fixture); 'age' is urlage's alias (Spider.cpp:3125)
    "percentchangedperday", "age",
    # page quotas (Spider.cpp:2949-2961, counted per SpiderColl.cpp:
    # 2754-2798) and C-block inlink count (Spider.h:524-526, counted per
    # SpiderColl.cpp:2701-2742) — fed by the F28/F29 aggregates
    "sitepages", "domainpages", "numinlinks",
})


@dataclass(frozen=True)
class Atom:
    kind: str          # 'flag' | 'num' | 'str' | 'prefix' | 'suffix' | 'substr'
    name: str          # keyword, or the match text for url atoms
    op: str = ""       # for num/str
    value: float | tuple[str, ...] | None = None
    negated: bool = False


def parse_expression(expr: str) -> list[Atom]:
    """'a && !b && c>=2' -> [Atom...] (conjunction).  Raises ValueError on
    unknown keywords so bad configs fail at compile time, like the reference
    logs-and-skips unknown expressions."""
    atoms: list[Atom] = []
    for raw in expr.split("&&"):
        tok = raw.strip()
        if not tok:
            continue
        negated = False
        while tok.startswith("!"):
            negated = not negated
            tok = tok[1:].strip()
        if tok.startswith("^"):
            atoms.append(Atom("prefix", tok[1:], negated=negated))
            continue
        if tok.startswith("$"):
            atoms.append(Atom("suffix", tok[1:], negated=negated))
            continue
        op_found = None
        for op in _OPS:
            if op in tok:
                op_found = op
                break
        if op_found:
            name, _, val = tok.partition(op_found)
            name = name.strip().lower()
            val = val.strip()
            if name in NUM_KEYWORDS:
                atoms.append(Atom("num", name, op_found, float(val), negated))
                continue
            if name in ("tld", "lang"):
                if op_found not in ("==", "!="):
                    raise ValueError(f"{name} supports ==/!= only: {tok!r}")
                atoms.append(Atom("str", name, op_found,
                                  tuple(v.strip() for v in val.split(",")),
                                  negated))
                continue
            raise ValueError(f"unknown comparison keyword in {tok!r}")
        low = tok.lower()
        if low.startswith("tag:"):
            # tagdb-backed predicate (Spider.cpp:2430-2470): membership in
            # the site_state tags dimension (Tagdb.cpp analogue)
            atoms.append(Atom("tag", low[4:], negated=negated))
            continue
        if low in FLAG_KEYWORDS:
            atoms.append(Atom("flag", "isinjecting" if low == "isinjected"
                              else low, negated=negated))
            continue
        # bare substring match on the url (Spider.cpp:3642-3695)
        atoms.append(Atom("substr", tok, negated=negated))
    return atoms


def _flag_value(name: str, c: dict) -> bool:
    if name == "default":
        return True
    if name == "hasreply":
        return bool(c.get("has_reply"))
    if name == "hastmperror":
        return bool(c.get("has_reply")) and c.get("err_code", 0) in TMP_ERROR_CODES
    if name == "isaddurl":
        return bool(c.get("is_add_url"))
    if name == "isinjecting":
        return bool(c.get("is_injecting"))
    if name == "iswww":
        return bool(c.get("is_www"))
    if name == "isindexed":
        return bool(c.get("is_indexed"))
    if name == "isroot":
        return c.get("path_cgi") == "/"
    if name in ("isnew", "isnewrequest"):
        return not c.get("has_reply")
    if name == "ismanualadd":
        return bool(c.get("is_add_url")) or bool(c.get("is_injecting"))
    if name == "isrssext":
        import re as _re
        return bool(_re.search(r"\.(rss|atom)(\?|$)", c.get("path_cgi") or ""))
    if name == "ispermalinkformat":
        import re as _re
        p = c.get("path_cgi") or ""
        return bool(_re.search(r"/\d{4}/\d{1,2}(/|$)", p)
                    or _re.search(r"/[^/?]*(-[^/?]*){3,}(\?|$)", p))
    # field-backed flags the fixture never sets (default False)
    field = {"isrss": "is_rss", "ispermalink": "is_permalink",
             "isdocidbased": "is_docid_based", "isreindex": "is_reindex",
             "isfakeip": "is_fake_ip", "ispingserver": "is_ping_server",
             "insitelist": "in_site_list",
             "hasauthorityinlink": "has_authority_inlink"}.get(name)
    if field is not None:
        return bool(c.get(field))
    raise AssertionError(name)


def _num_value(name: str, c: dict) -> float:
    if name == "hopcount":
        return c.get("hop_count", 0)
    if name == "errorcount":
        return c.get("err_count", 0) if c.get("has_reply") else 0
    if name == "errorcode":
        return c.get("err_code", 0) if c.get("has_reply") else 0
    if name == "httpstatus":
        return c.get("http_status", 0) if c.get("has_reply") else 0
    if name == "sitenuminlinks":
        return c.get("site_num_inlinks", 0)
    if name == "lastspidertime":
        return c.get("last_spider_time_s", 0) if c.get("has_reply") else 0
    if name in ("urlage", "age"):
        return c.get("now_s", 0) - c.get("discovery_time_s", 0)
    if name == "percentchangedperday":
        # reply-gated like errorcount/errorcode (field lives on the reply)
        return c.get("percent_changed_per_day", 0) if c.get("has_reply") else 0
    if name == "numinlinks":
        return c.get("page_num_inlinks", 0)
    if name == "sitepages":
        return c.get("site_pages", 0)
    if name == "domainpages":
        return c.get("domain_pages", 0)
    if name == "spiderwaited":
        if not c.get("has_reply"):
            return -1.0
        return c.get("now_s", 0) - c.get("last_spider_time_s", 0)
    raise AssertionError(name)


def _cmp(a: float, op: str, b: float) -> bool:
    if op == "==":
        return a == b
    if op == "!=":
        return a != b
    if op == "<":
        return a < b
    if op == ">":
        return a > b
    if op == "<=":
        return a <= b
    return a >= b


def eval_atoms(atoms: list[Atom], c: dict) -> bool:
    for a in atoms:
        if a.kind == "tag":
            v = a.name in (c.get("site_tags") or ())
        elif a.kind == "flag":
            v = _flag_value(a.name, c)
        elif a.kind == "num":
            v = _cmp(_num_value(a.name, c), a.op, a.value)
        elif a.kind == "str":
            inset = c.get(a.name, "") in a.value
            v = inset if a.op == "==" else not inset
        elif a.kind == "prefix":
            v = (c.get("url") or "").startswith(a.name)
        elif a.kind == "suffix":
            v = (c.get("url") or "").endswith(a.name)
        else:  # substr
            v = a.name in (c.get("url") or "")
        if a.negated:
            v = not v
        if not v:
            return False
    return True


def match_rule_index(parsed_rules: list[list[Atom]], c: dict) -> int:
    """First-match-wins rule index; -1 if nothing matches (the reference
    treats a no-match as no-spider)."""
    for i, atoms in enumerate(parsed_rules):
        if eval_atoms(atoms, c):
            return i
    return -1
