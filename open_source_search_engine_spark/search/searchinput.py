"""The SearchInput query-time parameter surface (SearchInput.cpp:1-741).

The reference parses ~80 CGI knobs per request into a SearchInput
struct (the Parms.cpp ``OBJ_SI`` table binds cgi name -> member ->
default), derives a handful of them from each other
(SearchInput.cpp:420-466), and rewrites the advanced-search parms
(prepend/any/plus/minus/quote1/quote2/link/filetype/sortby/secsback)
into the final query string (``setQueryBuffers``,
SearchInput.cpp:473-741).  This module is that surface over the Spark
result pipeline:

- :data:`SI_PARMS` — the OBJ_SI table (cgi name, field, type, default),
  extracted from Parms.cpp with the CollectionRec-inherited defaults
  resolved (pss=90, scores=1, qe=1, langw=20.0, tml=80, sw=80,
  smxcpl=180, smnl=1);
- :func:`parse_search_input` — HttpRequest-style dict -> SearchInput
  with type coercion, the derivation ladder, and the Msg40 hard caps
  (docsWanted<=100, firstResultNum clamped to [0, 200],
  Msg40.cpp:153-158 + Conf defaults max_results_per_page /
  max_results_offset);
- :meth:`SearchInput.compose_query` — the setQueryBuffers port,
  emit-order-exact (including the reference's minus-term loop quirk:
  a minus token NOT at end-of-string breaks the loop unappended,
  SearchInput.cpp:697 ``if (s2 < send) break``);
- :func:`execute_search_input` — maps the struct onto
  ``serve.serve_results`` (k/offset paging, site clustering, dup
  removal, family filter, highlighting) and the render envelope
  (format=html/xml/json).

Query-time parms are driver-side scalars: nothing here touches the
distributed plan except through serve_results' own operators.
"""
from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any

# --------------------------------------------------------------------------
# The OBJ_SI parameter table (Parms.cpp, one entry per m_obj=OBJ_SI parm).
# (cgi, dataclass field, type, default).  Types: bool (0/1 flag), tri
# (char -1/0/1 where -1 = "unset, derive later"), int, float, str.
# Defaults marked CollectionRec in Parms.cpp are resolved to that
# parm's CollectionRec default.
# --------------------------------------------------------------------------
SI_PARMS: tuple[tuple[str, str, str, Any], ...] = (
    ("q",        "query",                       "str",   ""),
    ("c",        "coll",                        "str",   ""),
    ("n",        "docs_wanted",                 "int",   10),
    ("s",        "first_result_num",            "int",   0),
    ("showerrors", "show_errors",               "bool",  False),
    ("sc",       "do_site_clustering",          "bool",  False),
    ("hacr",     "hide_all_clustered",          "bool",  False),
    ("aos",      "ask_other_shards",            "bool",  True),
    ("fx_qid",   "query_id",                    "str",   ""),
    ("dr",       "do_dup_content_removal",      "bool",  False),
    ("pss",      "percent_similar_summary",     "int",   90),
    ("ddu",      "dedup_url",                   "bool",  False),
    ("spell",    "spell_check",                 "bool",  True),
    ("stream",   "stream_results",              "bool",  False),
    ("secsback", "secs_back",                   "int",   0),
    ("sortby",   "sort_by",                     "int",   0),
    ("filetype", "filetype",                    "str",   ""),
    ("scores",   "get_docid_scoring_info",      "bool",  True),
    ("qe",       "query_expansion",             "bool",  True),
    ("rmt",      "real_max_top",                "int",   10),
    ("dmsa",     "do_max_score_algo",           "bool",  True),
    ("qlang",    "default_sort_lang",           "str",   ""),
    ("langw",    "same_lang_weight",            "float", 20.0),
    ("tml",      "title_max_len",               "int",   80),
    ("ns",       "num_lines_in_summary",        "int",   1),
    ("sw",       "summary_max_width",           "int",   80),
    ("smxcpl",   "summary_max_chars_per_line",  "int",   180),
    ("showimages", "show_images",               "bool",  True),
    ("usecache", "use_cache",                   "tri",   -1),
    ("rcache",   "rcache",                      "bool",  True),
    ("wcache",   "wcache",                      "tri",   -1),
    ("minserpdocid", "min_serp_docid",          "int",   0),
    ("maxserpscore", "max_serp_score",          "float", 0.0),
    ("url",      "url",                         "str",   ""),
    ("link",     "link",                        "str",   ""),
    ("quotea",   "quote1",                      "str",   ""),
    ("quoteb",   "quote2",                      "str",   ""),
    ("sites",    "sites",                       "str",   ""),
    ("plus",     "plus",                        "str",   ""),
    ("minus",    "minus",                       "str",   ""),
    ("format",   "format_str",                  "str",   "html"),
    ("ff",       "family_filter",               "bool",  False),
    ("highfreqtermcache", "allow_hf_term_cache", "bool", True),
    ("minmsgthreeatimeout", "min_msg3a_timeout", "int",  0),
    ("qh",       "do_query_highlighting",       "bool",  True),
    ("hq",       "highlight_query",             "str",   ""),
    ("dt",       "display_metas",               "str",   ""),
    ("niceness", "niceness",                    "int",   0),
    ("debug",    "debug",                       "bool",  False),
    ("dio",      "docids_only",                 "bool",  False),
    ("iu",       "img_url",                     "str",   ""),
    ("ix",       "img_link",                    "str",   ""),
    ("iw",       "img_width",                   "int",   200),
    ("ih",       "img_height",                  "int",   200),
    ("admin",    "is_admin",                    "bool",  True),
    ("prepend",  "prepend",                     "str",   ""),
    ("gbcountry", "gb_country",                 "str",   ""),
    ("sb",       "show_banned",                 "bool",  False),
    ("qcs",      "query_charset",               "str",   "utf-8"),
    ("inlinks",  "display_inlinks",             "int",   0),
    ("outlinks", "display_outlinks",            "int",   0),
    ("icc",      "include_cached_copy",         "int",   0),
    # not OBJ_SI rows but read straight off the request in
    # setQueryBuffers (SearchInput.cpp:498,558,719)
    ("any",      "any_terms",                   "str",   ""),
    ("gblang",   "gblang",                      "int",   -1),
    ("mininlinks", "min_inlinks",               "int",   0),
)

# Msg40.cpp:153-158 hard limits (Conf max_results_per_page /
# max_results_offset defaults)
MAX_DOCS_WANTED = 100
MAX_FIRST_RESULT_NUM = 200


@dataclass
class SearchInput:
    # one attribute per SI_PARMS row; populated by parse_search_input
    query: str = ""
    coll: str = ""
    docs_wanted: int = 10
    first_result_num: int = 0
    show_errors: bool = False
    do_site_clustering: bool = False
    hide_all_clustered: bool = False
    ask_other_shards: bool = True
    query_id: str = ""
    do_dup_content_removal: bool = False
    percent_similar_summary: int = 90
    dedup_url: bool = False
    spell_check: bool = True
    stream_results: bool = False
    secs_back: int = 0
    sort_by: int = 0
    filetype: str = ""
    get_docid_scoring_info: bool = True
    query_expansion: bool = True
    real_max_top: int = 10
    do_max_score_algo: bool = True
    default_sort_lang: str = ""
    same_lang_weight: float = 20.0
    title_max_len: int = 80
    num_lines_in_summary: int = 1
    summary_max_width: int = 80
    summary_max_chars_per_line: int = 180
    show_images: bool = True
    use_cache: int = -1
    rcache: bool = True
    wcache: int = -1
    min_serp_docid: int = 0
    max_serp_score: float = 0.0
    url: str = ""
    link: str = ""
    quote1: str = ""
    quote2: str = ""
    sites: str = ""
    plus: str = ""
    minus: str = ""
    format_str: str = "html"
    family_filter: bool = False
    allow_hf_term_cache: bool = True
    min_msg3a_timeout: int = 0
    do_query_highlighting: bool = True
    highlight_query: str = ""
    display_metas: str = ""
    niceness: int = 0
    debug: bool = False
    docids_only: bool = False
    img_url: str = ""
    img_link: str = ""
    img_width: int = 200
    img_height: int = 200
    is_admin: bool = True
    prepend: str = ""
    gb_country: str = ""
    show_banned: bool = False
    query_charset: str = "utf-8"
    display_inlinks: int = 0
    display_outlinks: int = 0
    include_cached_copy: int = 0
    any_terms: str = ""
    gblang: int = -1
    min_inlinks: int = 0

    # ------------------------------------------------- setQueryBuffers
    def compose_query(self, now_ts: int | None = None) -> str:
        """The final compiled query (m_sbuf1 / qbuf1), emit-order-exact
        per SearchInput.cpp:473-741: prepend, (any-terms OR group),
        secsback/sortby/filetype/gblang operators, +link:, the natural
        query, +"quote1" +"quote2", +plus terms, -minus terms (with the
        reference's early-break quirk), gbkeyword:numinlinks."""
        parts: list[str] = []

        def push(s: str) -> None:
            if parts:
                parts.append(" ")
            parts.append(s)

        if self.prepend:
            push(self.prepend)

        boolq = False
        if self.any_terms:
            toks = _split_quoted(self.any_terms)
            if toks:
                push("(" + " OR ".join(toks) + ") AND")
                boolq = True

        if self.secs_back > 0 and now_ts is not None:
            ts = max(0, now_ts - self.secs_back)
            push(f"gbminint:gbspiderdate:{ts}")
        if self.sort_by == 1:
            push("gbsortbyint:gbspiderdate")
        if self.sort_by == 2:
            push("gbrevsortbyint:gbspiderdate")

        ft = self.filetype
        if ft and ft.lower() != "any":
            push(f"filetype:{ft}")

        if self.gblang >= 0:
            push(f"+gblang:{self.gblang}" + (" AND" if boolq else " |"))

        if self.link:
            push(f"+link:{self.link}" + (" AND" if boolq else " |"))

        if self.query:
            push(self.query)

        for quote in (self.quote1, self.quote2):
            if quote:
                if boolq:
                    push(f'AND "{quote}"')
                else:
                    push(f'+"{quote}"')

        if self.plus:
            for tok in _split_quoted(self.plus):
                push(("AND " if boolq else "+") + tok)

        if self.minus:
            toks = _split_quoted_spans(self.minus)
            for tok, at_end in toks:
                # SearchInput.cpp:697: `if (s2 < send) break;` — a minus
                # token that does not reach end-of-string aborts the
                # whole minus loop BEFORE appending; only a single
                # final token ever lands
                if not at_end:
                    break
                push(("AND NOT " if boolq else "-") + tok)

        if self.min_inlinks > 0:
            push("gbkeyword:numinlinks")

        return "".join(parts).strip()


def _split_quoted(s: str) -> list[str]:
    """The setQueryBuffers token scan: whitespace-separated tokens,
    except a leading ``"`` swallows to the closing quote (or EOL)."""
    return [t for t, _ in _split_quoted_spans(s)]


def _split_quoted_spans(s: str) -> list[tuple[str, bool]]:
    out: list[tuple[str, bool]] = []
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i].isspace():
            i += 1
        if i >= n:
            break
        j = i + 1
        if s[i] == '"':
            while j < n and s[j] != '"':
                j += 1
            if j < n:
                j += 1
        else:
            while j < n and not s[j].isspace():
                j += 1
        out.append((s[i:j], j >= n))
        i = j + 1
    return out


def parse_search_input(params: dict[str, Any]) -> SearchInput:
    """HttpRequest-style parameter dict -> SearchInput: per-parm type
    coercion against SI_PARMS, then the derivation ladder
    (SearchInput.cpp:420-466) and the Msg40 hard caps.  Unknown keys are
    ignored like HttpRequest lookups the struct never asks for."""
    si = SearchInput()
    by_cgi = {cgi: (f_, t) for cgi, f_, t, _ in SI_PARMS}
    for k, v in params.items():
        ent = by_cgi.get(k)
        if ent is None:
            continue
        f_, t = ent
        try:
            if t == "bool":
                setattr(si, f_, str(v) not in ("0", "false", "False", ""))
            elif t in ("int", "tri"):
                setattr(si, f_, int(v))
            elif t == "float":
                setattr(si, f_, float(v))
            else:
                setattr(si, f_, str(v))
        except (TypeError, ValueError):
            pass                        # HttpRequest keeps the default

    # ---------------- derivation ladder (SearchInput.cpp:420-466)
    q = (si.compose_query() or "").lower()
    has_site = "site:" in q and "-site:" not in q
    has_url = "url:" in q
    has_quota = "gbquota" in q
    if has_site:
        si.do_site_clustering = False
    if has_quota:
        si.do_site_clustering = False
        si.do_dup_content_removal = False
    if not si.do_site_clustering:
        si.hide_all_clustered = False
    if si.first_result_num < 0:
        si.first_result_num = 0
    # use-cache ladder (spidering assumed enabled, the reference default)
    if si.use_cache == -1:
        if has_site or has_url or si.sites or si.url or "ip:" in q:
            si.use_cache = 0
    if si.use_cache == -1:
        si.use_cache = 1
    read_cache = si.use_cache == 1 and si.rcache
    if si.wcache == -1:
        si.wcache = 0 if si.use_cache == 0 else 1
    si.rcache = read_cache

    # ---------------- Msg40 hard limits (Msg40.cpp:153-158)
    si.docs_wanted = min(si.docs_wanted, MAX_DOCS_WANTED)
    si.first_result_num = min(si.first_result_num, MAX_FIRST_RESULT_NUM)
    return si


def execute_search_input(si: SearchInput, docs, *, now_ts: int | None = None,
                         **frames):
    """Msg40: run the parsed request through the result pipeline.
    ``frames`` forwards serve_results' data inputs (index, postings,
    doc_meta, anchors, url_col, lang_col, adult_col, ...).  Returns the
    visible result page [first_result_num, first_result_num +
    docs_wanted) in rank order."""
    from pyspark.sql import functions as F

    from .serve import serve_results

    query = si.compose_query(now_ts=now_ts)
    k = si.first_result_num + si.docs_wanted
    page = serve_results(
        docs, query, k=k,
        family_filter=si.family_filter,
        lang_filter=si.default_sort_lang or None,
        dedup_percent=(si.percent_similar_summary
                       if si.do_dup_content_removal else 0),
        dedup_url=si.dedup_url,
        max_per_site=2,
        do_site_clustering=si.do_site_clustering,
        highlight_summaries=si.do_query_highlighting,
        **frames)
    page = page.filter(F.col("rank") >= si.first_result_num)
    if si.docids_only:
        return page.select("doc_id", "rank")
    return page
