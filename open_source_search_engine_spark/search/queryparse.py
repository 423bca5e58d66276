"""Q1: query parsing — boolean operators, quoted phrases, field terms.

The reference's ``Query.cpp`` (3,482 LoC) tokenizes a user query into terms
with operators: implicit AND between bare terms, explicit ``AND``/``OR``
(left-associative, AND binds tighter), ``NOT``/``-term`` negation, quoted
phrases ("exact phrase" matches consecutive positions), and field prefixes
(``site:x``, ``title:x``, ``lang:xx`` — ``Query.cpp`` field table).  This
module re-expresses that surface as a tiny recursive-descent parser into an
AST that ``execute()`` maps onto DataFrame algebra over the postings index
(search/postings.py):

    term        -> postings filter (one termlist: partition-pruned scan)
    AND         -> inner join on doc_id            (zipper-intersect)
    OR          -> full outer union of doc sets    (Msg39 merge analogue)
    NOT         -> left-anti join                  (negative termlist)
    "a b c"     -> consecutive-position verify via the pairwise zipper
                   (positions arrays; gap == 1 in order)
    field:term  -> equality filter on a doc-metadata dimension joined in

Scoring follows search/postings.py: tf-sum * 10 + proximity bonus, with
phrase matches scoring their phrase tf.  Top-K = ORDER BY + LIMIT
(TakeOrderedAndProject — the TopTree analogue, TopTree.cpp:209).

Grammar (left-assoc, AND > OR):
    expr     := orexpr
    orexpr   := andexpr (OR andexpr)*
    andexpr  := unary (AND? unary)*      # adjacency = implicit AND
    unary    := NOT unary | '-' unary | atom
    atom     := '(' expr ')' | '"' words '"' | field ':' word | word
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIELDS = frozenset({"site", "lang", "title", "url", "gbdocid",
                    "link", "sitelink", "ip",
                    "gblang", "gbcountry", "gbisadult", "gbpermalink",
                    "gbhasthumbnail"})  # Query.cpp field table (subset:
#   link:X    = docs that link to page X        (FIELD_LINK, Linkdb)
#   sitelink:X = docs that link to any page on site X (FIELD_SITELINK)
#   gbdocid:N = the doc with docid N            (FIELD_DOCID)
#   gblang:/gbcountry:/gbisadult:/gbpermalink:/gbhasthumbnail: = the
#   doc-attribute meta terms XmlDoc indexes at hash time
#   (XmlDoc_Indexing.cpp:1856-1966 hashLanguage/hashLanguageString/
#   hashCountry/hashIsAdult/hashPermalink, :431 gbhasthumbnail)

# numeric-field operators (Query.cpp:1667-1782): gbsortby:/gbrevsortby:
# re-rank by a numeric doc field low-to-high / high-to-low; gbmin:/gbmax:/
# gbequal: are range constraints on the same termlist.  The *int variants
# are the integer-keyed forms (FIELD_GBSORTBYINT etc.).
_SORT_OPS = {"gbsortby": False, "gbrevsortby": True,
             "gbsortbyint": False, "gbrevsortbyint": True}
_RANGE_OPS = {"gbmin": ">=", "gbmax": "<=", "gbequal": "==",
              "gbminint": ">=", "gbmaxint": "<=", "gbequalint": "=="}


# --------------------------------------------------------------------- AST

@dataclass(frozen=True)
class Term:
    text: str


@dataclass(frozen=True)
class Phrase:
    words: tuple


@dataclass(frozen=True)
class FieldTerm:
    field: str
    value: str


@dataclass(frozen=True)
class SortBy:
    field: str
    reverse: bool
    is_int: bool


@dataclass(frozen=True)
class NumberFilter:
    field: str
    op: str          # ">=", "<=", "=="
    value: float
    is_int: bool


@dataclass(frozen=True)
class FieldMatch:
    """gbfieldmatch:field:value — exact field-value equality
    (Query.cpp:1760-1825 FIELD_GBFIELDMATCH: the value is hashed
    "CASE SENSITIVE!!!!" to match XmlDoc.cpp::hashFieldMatch, so unlike
    FieldTerm the comparison does NOT lowercase)."""
    field: str
    value: str


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


_TOKEN_RE = re.compile(r'"[^"]*"|\(|\)|[^\s()"]+')


class QueryParseError(ValueError):
    pass


def _tokenize(q: str) -> list[str]:
    toks = _TOKEN_RE.findall(q)
    # leading '+' is the required-term sign (Query.cpp m_wordSign '+'):
    # implicit AND already requires every positive term, so the sign is
    # consumed, not matched.  A bare '+' token (e.g. from '+ "phrase"')
    # drops.  '-' stays — the NOT operator handled in unary().
    out = []
    for t in toks:
        if t.startswith("+") and t not in ("+",):
            t = t[1:]
        if t == "+":
            continue
        out.append(t)
    return out


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek() is not None:
            raise QueryParseError(f"trailing token {self.peek()!r}")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() is not None and self.peek().upper() == "OR":
            self.next()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def and_expr(self):
        parts = [self.unary()]
        while True:
            t = self.peek()
            if t is None or t == ")" or t.upper() == "OR":
                break
            if t.upper() == "AND":
                self.next()
                continue
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def unary(self):
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        if t.upper() == "NOT":
            self.next()
            return Not(self.unary())
        if t.startswith("-") and len(t) > 1:
            self.next()
            # -term negation (Query.cpp m_fieldSign '-')
            return Not(_atom_from_token(t[1:]))
        return self.atom()

    def atom(self):
        t = self.next()
        # gbfieldmatch:tag.uri:"http://x" — the quoted value tokenizes
        # separately; glue it back (Query.cpp:1797-1813 inQuotes scan)
        if (t.lower().startswith("gbfieldmatch:") and t.endswith(":")
                and self.peek() is not None
                and self.peek().startswith('"')):
            t = t + self.next()
        if t == "(":
            node = self.or_expr()
            if self.peek() != ")":
                raise QueryParseError("unbalanced parenthesis")
            self.next()
            return node
        if t == ")":
            raise QueryParseError("unbalanced parenthesis")
        return _atom_from_token(t)


def _atom_from_token(t: str):
    if t.startswith('"') and t.endswith('"') and len(t) >= 2:
        words = tuple(w.lower() for w in t[1:-1].split())
        if not words:
            raise QueryParseError("empty phrase")
        return Phrase(words) if len(words) > 1 else Term(words[0])
    if ":" in t:
        f, _, v = t.partition(":")
        fl = f.lower()
        if fl in _SORT_OPS and v:
            # gbsortby:price (Query.cpp FIELD_GBSORTBY*; value = field
            # name, lowercased like hash64Lower_utf8)
            return SortBy(v.lower(), _SORT_OPS[fl], fl.endswith("int"))
        if fl in _RANGE_OPS and v:
            # gbmin:price:1.23 — the LAST colon splits field from number
            # (Query.cpp:1736-1745 lastColonLen)
            fld, sep, num = v.rpartition(":")
            if not sep:
                raise QueryParseError(f"{fl}: needs field:value")
            try:
                val = float(num)
            except ValueError:
                raise QueryParseError(f"bad number in {t!r}") from None
            return NumberFilter(fld.lower(), _RANGE_OPS[fl], val,
                                fl.endswith("int"))
        if fl == "gbfieldmatch" and v:
            # gbfieldmatch:field:value — first colon ends the keyword,
            # second ends the (lowercased) field name; the value keeps
            # its case and may be quoted (Query.cpp:1760-1825)
            fld, sep, val = v.partition(":")
            if not sep or not fld:
                raise QueryParseError("gbfieldmatch needs field:value")
            if val.startswith('"') and val.endswith('"') and len(val) >= 2:
                val = val[1:-1]
            if not val:
                raise QueryParseError("gbfieldmatch needs a value")
            return FieldMatch(fld.lower(), val)
        if fl in FIELDS and v:
            return FieldTerm(fl, v.lower())
    return Term(t.lower())


def parse_query(q: str):
    """User query string → AST.  Raises QueryParseError on malformed input
    (unbalanced quotes are tolerated by the tokenizer: an unclosed quote
    swallows to end of string, like the reference's forgiving parse)."""
    toks = _tokenize(q)
    if not toks:
        raise QueryParseError("empty query")
    return _Parser(toks).parse()


# ----------------------------------------------------------------- execute

@dataclass
class ExecContext:
    postings: DataFrame                    # (term, doc_id, tf, positions)
    doc_meta: DataFrame | None = None      # (doc_id, field columns) dim
    links: DataFrame | None = None         # (src_doc_id, dst_url) — the
                                           # Linkdb dim behind link:/sitelink:
    synonyms: dict | None = None           # term -> (syn, ...) synsets;
                                           # None disables expansion
    bigrams: DataFrame | None = None       # build_bigram_postings output:
                                           # 2-word phrases become ONE
                                           # termlist scan (Phrases.h:3-6)
    region_postings: DataFrame | None = None  # hashgroups build (term,
                                           # doc_id, hashgroup, tf) — the
                                           # title: termlist dimension
    next_id: int = dc_field(default=0)

    def tag(self) -> int:
        self.next_id += 1
        return self.next_id


def _term_docs(ctx: ExecContext, term: str) -> DataFrame:
    """One termlist: (doc_id, score_part) — tf*10 like postings.search.
    With synonyms enabled the term group is the expanded form set and a
    synonym hit scores tf*9 (synonyms.py; Conf::m_synonymWeight 0.9)."""
    if ctx.synonyms is not None:
        from .synonyms import synonym_term_docs
        return synonym_term_docs(ctx.postings, term, ctx.synonyms)
    return (ctx.postings.filter(F.col("term") == term)
            .select("doc_id", (F.col("tf") * 10).alias("score_part")))


def _phrase_docs(ctx: ExecContext, words: tuple) -> DataFrame:
    """Exact-phrase match: all words present AND consecutive positions in
    order.  Uses the merged-zipper idea pairwise: for adjacent word pairs,
    count positions p with p+1 present in the next list via array_intersect
    of (positions_i + 1) with positions_{i+1} — linear, JVM-side."""
    if len(words) == 2 and ctx.bigrams is not None:
        # indexed-bigram fast path: the adjacency the position chain
        # would verify is precomputed at index time (bigram tf == number
        # of consecutive starts), so the phrase is one termlist scan —
        # same score formula, result-identical
        return (ctx.bigrams
                .filter(F.col("term") == f"{words[0]}_{words[1]}")
                .select("doc_id",
                        (F.col("tf") * 10 * 2 + 50).alias("score_part")))
    lists = [
        ctx.postings.filter(F.col("term") == w).select(
            "doc_id", F.col("positions").alias(f"_pos_{i}"))
        for i, w in enumerate(words)
    ]
    joined = lists[0]
    for nxt in lists[1:]:
        joined = joined.join(nxt, "doc_id", "inner")
    # chain: positions of word0 whose +1 is in word1, whose +2 in word2...
    starts = F.col("_pos_0")
    for i in range(1, len(words)):
        shifted = F.transform(starts, lambda p: p + i)  # noqa: B023
        starts = F.array_intersect(
            F.transform(F.array_intersect(shifted, F.col(f"_pos_{i}")),
                        lambda p: p - i),  # noqa: B023
            starts)
    phrase_tf = F.size(starts)
    return (joined.withColumn("_ptf", phrase_tf)
            .filter(F.col("_ptf") > 0)
            # phrase hits score like a high-proximity pair (gap<=1 bonus)
            .select("doc_id", (F.col("_ptf") * 10 * len(words) + 50)
                    .alias("score_part")))


def _strip_sorts(node):
    """Pull SortBy operators out of the boolean tree (the reference marks
    them m_ignoreWordInBoolQuery, Query.cpp:1771-1781, so '(A OR B)
    gbsortby:price' evaluates the boolean over A/B only).  Returns
    (tree-without-sorts | None, [SortBy...])."""
    if isinstance(node, SortBy):
        return None, [node]
    if isinstance(node, Not):
        child, sorts = _strip_sorts(node.child)
        return (Not(child) if child is not None else None), sorts
    if isinstance(node, (And, Or)):
        kids, sorts = [], []
        for c in node.children:
            k, s = _strip_sorts(c)
            sorts.extend(s)
            if k is not None:
                kids.append(k)
        cls = type(node)
        if not kids:
            return None, sorts
        return (kids[0] if len(kids) == 1 else cls(tuple(kids))), sorts
    return node, []


def _number_docs(ctx: ExecContext, node: NumberFilter) -> DataFrame:
    """gbmin/gbmax/gbequal range constraint: docs whose numeric metadata
    field satisfies the bound (the gbsortby termlist range scan)."""
    if ctx.doc_meta is None or node.field not in ctx.doc_meta.columns:
        return (ctx.postings.select("doc_id").limit(0)
                .withColumn("score_part", F.lit(0).cast("long")))
    c = F.col(node.field).cast("long" if node.is_int else "double")
    v = int(node.value) if node.is_int else node.value
    cond = {">=": c >= v, "<=": c <= v, "==": c == v}[node.op]
    return (ctx.doc_meta.filter(c.isNotNull()).filter(cond)
            .select("doc_id", F.lit(0).cast("long").alias("score_part")))


def _nothing(ctx: ExecContext) -> DataFrame:
    return (ctx.postings.select("doc_id").limit(0)
            .withColumn("score_part", F.lit(0).cast("long")))


def _field_docs(ctx: ExecContext, node: FieldTerm) -> DataFrame:
    zero = F.lit(0).cast("long").alias("score_part")
    if node.field in ("link", "sitelink"):
        # docs that link to page X / to any page on site X, from the
        # Linkdb dimension (Query.cpp FIELD_LINK/FIELD_SITELINK; the
        # reference reads the link: termlist Linkdb built at index time)
        if ctx.links is None:
            return _nothing(ctx)
        dst = F.lower(F.col("dst_url"))
        if node.field == "sitelink":
            from .results import host_of
            cond = host_of(dst) == node.value
        else:
            cond = (F.regexp_replace(dst, r"^[a-z][a-z0-9+.-]*://", "")
                    == re.sub(r"^[a-z][a-z0-9+.-]*://", "", node.value))
        return (ctx.links.filter(cond)
                .select(F.col("src_doc_id").alias("doc_id"), zero)
                .distinct())
    if node.field == "gbdocid":
        # direct docid lookup (FIELD_DOCID)
        try:
            did = int(node.value)
        except ValueError:
            return _nothing(ctx)
        return (ctx.postings.select("doc_id").distinct()
                .filter(F.col("doc_id") == did).select("doc_id", zero))
    if node.field == "title":
        # FIELD_TITLE: the term indexed under the title hashgroup
        # (XmlDoc hashTitle; Query.cpp FIELD_TITLE)
        if ctx.region_postings is None:
            return _nothing(ctx)
        return (ctx.region_postings
                .filter((F.col("hashgroup") == "title")
                        & (F.col("term") == node.value))
                .select("doc_id", zero).distinct())
    if node.field == "gblang":
        # gblang: accepts BOTH indexed forms — the numeric langId string
        # (hashLanguage, XmlDoc_Indexing.cpp:1856-1872) and the Lang.cpp
        # abbreviation (hashLanguageString, :1884-1902).  An abbr that
        # getLangIdFromAbbr can't resolve means the term was never
        # indexed → matches nothing (langUnknown is queryable only as
        # gblang:xx / gblang:0).
        from ..functions.langcodes import lang_id_from_abbr
        if ctx.doc_meta is None or "lang_id" not in ctx.doc_meta.columns:
            return _nothing(ctx)
        if node.value.isdigit():
            want = int(node.value)
        else:
            want = lang_id_from_abbr(node.value)
            if want == 0 and node.value not in ("xx",):
                return _nothing(ctx)
        return (ctx.doc_meta.filter(F.col("lang_id") == want)
                .select("doc_id", zero))
    if node.field == "gbcountry":
        # gbcountry: the CountryCode abbreviation of getCountryId
        # (hashCountry, XmlDoc_Indexing.cpp:1905-1930)
        from ..functions.country import COUNTRY_ID
        if ctx.doc_meta is None or "country_id" not in ctx.doc_meta.columns:
            return _nothing(ctx)
        want = COUNTRY_ID.get(node.value)
        if want is None:
            return _nothing(ctx)
        return (ctx.doc_meta.filter(F.col("country_id") == want)
                .select("doc_id", zero))
    if node.field in ("gbisadult", "gbpermalink", "gbhasthumbnail"):
        # boolean meta terms — the reference hashes exactly "1" or "0"
        # (hashIsAdult/hashPermalink; gbhasthumbnail
        # XmlDoc_Indexing.cpp:431), so any other value matches nothing
        col = {"gbisadult": "is_adult", "gbpermalink": "is_permalink",
               "gbhasthumbnail": "has_thumbnail"}[node.field]
        if (ctx.doc_meta is None or col not in ctx.doc_meta.columns
                or node.value not in ("0", "1")):
            return _nothing(ctx)
        want = node.value == "1"
        return (ctx.doc_meta
                .filter(F.col(col).cast("boolean") == want)
                .select("doc_id", zero))
    if node.field in ("url", "site", "ip"):
        # FIELD_URL / FIELD_SITE / FIELD_IP (Query.cpp field table):
        # url: exact scheme-stripped match; site: the doc's site prefix
        # (host or host/path-area, SiteGetter definition); ip: the
        # doc's first ip.  All read the doc_meta dimension the way the
        # reference reads the url:/site:/ip: termlists XmlDoc indexed.
        if ctx.doc_meta is None:
            return _nothing(ctx)
        cols = ctx.doc_meta.columns
        if node.field == "ip":
            if "first_ip" not in cols:
                return _nothing(ctx)
            return (ctx.doc_meta
                    .filter(F.col("first_ip").cast("string") == node.value)
                    .select("doc_id", zero))
        if "url" not in cols:
            return _nothing(ctx)
        bare = F.regexp_replace(F.lower(F.col("url")),
                                r"^[a-z][a-z0-9+.-]*://", "")
        want = re.sub(r"^[a-z][a-z0-9+.-]*://", "", node.value.lower())
        if node.field == "url":
            cond = (F.regexp_replace(bare, "/$", "")
                    == want.rstrip("/"))
        else:
            w = want.rstrip("/")
            # host match covers www.-insertion both ways
            host = F.regexp_extract(bare, r"^([^/]+)", 1)
            cond = ((host == w) | (host == "www." + w)
                    | (bare == w) | bare.startswith(w + "/"))
        return ctx.doc_meta.filter(cond).select("doc_id", zero)
    if ctx.doc_meta is None or node.field not in ctx.doc_meta.columns:
        # unknown field dimension: matches nothing (reference logs+skips)
        return _nothing(ctx)
    return (ctx.doc_meta
            .filter(F.lower(F.col(node.field)) == node.value)
            .select("doc_id", F.lit(0).cast("long").alias("score_part")))


def _field_match_docs(ctx: ExecContext, node: FieldMatch) -> DataFrame:
    """gbfieldmatch: exact, case-SENSITIVE field-value equality — the
    reference composes hash64(value) with hash64(field) case-sensitively
    (Query.cpp:1785-1820, XmlDoc.cpp::hashFieldMatch)."""
    if ctx.doc_meta is None or node.field not in ctx.doc_meta.columns:
        return _nothing(ctx)
    return (ctx.doc_meta
            .filter(F.col(node.field).cast("string") == node.value)
            .select("doc_id", F.lit(0).cast("long").alias("score_part")))


def _all_docs(ctx: ExecContext) -> DataFrame:
    return ctx.postings.select("doc_id").distinct().withColumn(
        "score_part", F.lit(0).cast("long"))


def _exec(ctx: ExecContext, node) -> DataFrame:
    """Evaluate AST → (doc_id, score_part).  NOT at top level is resolved
    against the full doc set by the caller through And handling."""
    if isinstance(node, Term):
        return _term_docs(ctx, node.text)
    if isinstance(node, Phrase):
        return _phrase_docs(ctx, node.words)
    if isinstance(node, FieldTerm):
        return _field_docs(ctx, node)
    if isinstance(node, FieldMatch):
        return _field_match_docs(ctx, node)
    if isinstance(node, NumberFilter):
        return _number_docs(ctx, node)
    if isinstance(node, Or):
        parts = [_exec(ctx, c) for c in node.children]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u.groupBy("doc_id").agg(F.max("score_part").alias("score_part"))
    if isinstance(node, And):
        pos = [c for c in node.children if not isinstance(c, Not)]
        neg = [c.child for c in node.children if isinstance(c, Not)]
        if not pos:
            base = _all_docs(ctx)
        else:
            parts = [_exec(ctx, c) for c in pos]
            base = parts[0]
            for i, p in enumerate(parts[1:], 1):
                base = (base.join(p.withColumnRenamed("score_part",
                                                      f"_sp_{i}"),
                                  "doc_id", "inner"))
            score = F.col("score_part")
            for i in range(1, len(parts)):
                score = score + F.col(f"_sp_{i}")
            base = base.select("doc_id", score.alias("score_part"))
        for n in neg:
            base = base.join(_exec(ctx, n).select("doc_id"),
                             "doc_id", "left_anti")
        return base
    if isinstance(node, Not):
        # bare NOT: everything except matches
        return _all_docs(ctx).join(_exec(ctx, node.child).select("doc_id"),
                                   "doc_id", "left_anti")
    raise AssertionError(type(node))


def search_query(postings: DataFrame, query: str, k: int = 10,
                 doc_meta: DataFrame | None = None,
                 links: DataFrame | None = None,
                 synonyms: dict | None = None,
                 bigrams: DataFrame | None = None,
                 region_postings: DataFrame | None = None) -> DataFrame:
    """Full Q1→Q2→Q3 path: parse → DataFrame algebra → top-K.

    Returns (doc_id, score) ordered by (score desc, doc_id).  With a
    gbsortby:/gbrevsortby: operator in the query the ranking key becomes
    the named numeric metadata field instead of the relevance score
    (PosdbTable m_sortByTermNum: docs lacking the field's termlist are
    not candidates) and the output gains a ``sort_key`` column."""
    ast = parse_query(query)
    ast, sorts = _strip_sorts(ast)
    ctx = ExecContext(postings=postings, doc_meta=doc_meta,
                      links=links, synonyms=synonyms, bigrams=bigrams,
                      region_postings=region_postings)
    if ast is None:
        out = _all_docs(ctx)          # pure gbsortby:... query
    else:
        out = _exec(ctx, ast)
    if sorts:
        sb = sorts[0]                 # reference keeps one sort term
        if ctx.doc_meta is None or sb.field not in ctx.doc_meta.columns:
            out = out.limit(0)
            return (out.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("score_part").cast("long").alias("score"),
                F.lit(None).cast("double").alias("sort_key")))
        key = (F.col(sb.field).cast("long" if sb.is_int else "double")
               .alias("sort_key"))
        out = (out.join(ctx.doc_meta.select("doc_id", key), "doc_id")
               .filter(F.col("sort_key").isNotNull()))
        order = (F.desc("sort_key") if sb.reverse
                 else F.asc("sort_key"))
        return (out.select(F.col("doc_id").cast("long").alias("doc_id"),
                           F.col("score_part").cast("long").alias("score"),
                           F.col("sort_key").cast("double")
                           .alias("sort_key"))
                .orderBy(order, "doc_id")
                .limit(k))
    return (out.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.col("score_part").cast("long").alias("score"))
            .orderBy(F.desc("score"), "doc_id")
            .limit(k))
