"""Outlink harvesting from interleaved text+media spans (F22/F23/F24).

Mirrors the reference's link extraction:

- tags harvested (``Linkdb.cpp:3643-3665``): ``<a href>``, ``<link
  href>``, ``<area href>``, ``<enclosure href>``, ``<weblog url>``, and
  the TEXT-CONTENT forms ``<link>url</link>`` (rss), ``<loc>url</loc>``
  (sitemap.xml), ``<UrlFrom>``, ``<feedburner:origlink>`` — not
  self-closing, url as the immediately following text node, CDATA
  wrappers stripped (``Linkdb.cpp:3698-3721``); ``<img src>`` spans
  arrive as ``media_ref`` spans in the interleaved docs table
  (``Images.cpp:160-178``)
- ``javascript:`` hrefs recover the popup url from the ``onclick``
  attribute's first ``'/``-quoted token (``Linkdb.cpp:3740-3769``)
- ``rel=nofollow`` links skipped (``Linkdb.cpp:4247-4249``)
- self-links skipped (``XmlDoc.cpp:15258-15264`` same-uh48 check)
- host must be >2 chars, scheme http(s) (``XmlDoc.cpp:15270-15291``)
- frontier exclusion is the EXACT reference gate (``XmlDoc.cpp:
  15293-15303``): versioned bad-extension table + script extension +
  CDN/shortener domains + oembed paths (``functions.urlgates``) — note
  .xml IS spiderable (``hasXmlExtension`` is commented out in the
  reference), which is what lets harvested sitemap/rss URLs crawl
- relative hrefs resolve against the page URL (``Url::set`` with base),
  or against the document's ``<base href>`` when one is present with a
  valid absolute URL (``XmlDoc::getBaseUrl``, XmlDoc.cpp:16137-16165,
  including the invalid-``<base href="/">`` fixup)

The extractor is a pure function over one document's span array so it runs
identically in the Python oracle and inside the Spark ``mapInPandas`` UDF.
Span order is preserved: outlinks are emitted in (span offset, position in
span) order, and per-page dedup keeps the FIRST occurrence
(``XmlDoc.cpp:15179-15272`` hash-table first-wins).
"""

from __future__ import annotations

import html
import re

from .urlgates import is_url_unwanted
from .urlnorm import ParsedUrl, normalize_url

# link-carrying tags (Linkdb.cpp:3651-3665); attribute quoting with
# ' or " or bare
_LINK_TAG_RE = re.compile(
    r"<(a|area|link|loc|enclosure|weblog|urlfrom|feedburner:origlink)"
    r"(?=[\s/>])([^>]*)>",
    re.IGNORECASE | re.DOTALL,
)
_HREF_RE = re.compile(
    r"""\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
# <weblog url=...> uses the url attribute (Linkdb.cpp:3663)
_URL_ATTR_RE = re.compile(
    r"""\burl\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
_ONCLICK_RE = re.compile(
    r"""\bonclick\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
_REL_NOFOLLOW_RE = re.compile(
    r"""\brel\s*=\s*("[^"]*nofollow[^"]*"|'[^']*nofollow[^']*'|nofollow)""",
    re.IGNORECASE,
)

# tags whose url may be the tag's TEXT content (Linkdb.cpp:3698-3703)
_TEXT_CONTENT_TAGS = frozenset(
    {"link", "loc", "urlfrom", "feedburner:origlink"})


def _text_content_url(text: str, m: re.Match, tag: str) -> str:
    """Linkdb.cpp:3698-3721 — ``<link>url</link>`` / ``<loc>url</loc>``:
    the open tag must not be self-closing, the url is the immediately
    following text node, the matching back tag must come next; a
    ``<![CDATA[...]]>`` wrapper is stripped."""
    if m.group(2).rstrip().endswith("/"):        # <loc/> self-closing
        return ""
    rest = text[m.end():]
    cm = re.match(
        rf"\s*<!\[CDATA\[(.*?)\]\]>\s*</{re.escape(tag)}\s*>",
        rest, re.IGNORECASE | re.DOTALL)
    if cm:
        return cm.group(1).strip()               # CDATA is literal text
    tm = re.match(rf"([^<]*)</{re.escape(tag)}\s*>", rest, re.IGNORECASE)
    if tm:
        return html.unescape(tm.group(1)).strip()
    return ""


def _onclick_url(attrs: str) -> str:
    """Linkdb.cpp:3740-3769 — a ``javascript:`` href usually passes the
    real url to a popup: recover the first ``'``-quoted token starting
    with ``/`` from the onclick attribute."""
    m = _ONCLICK_RE.search(attrs)
    if not m:
        return ""
    oc = m.group(2) or m.group(3) or m.group(4) or ""
    i = oc.find("'/")
    if i < 0:
        return ""
    j = oc.find("'", i + 1)
    return oc[i + 1: j if j >= 0 else len(oc)]


def resolve_href(href: str, base: ParsedUrl) -> str | None:
    """Resolve an href against the page URL, reference-style (Url::set with
    baseUrl): absolute / scheme-relative / root-relative / relative."""
    h = href.strip()
    if not h or h.startswith(("javascript:", "mailto:", "data:", "tel:")):
        return None
    if "://" in h[:10]:
        return h
    if h.startswith("//"):
        return f"{base.scheme}:{h}"
    if h.startswith("/"):
        return f"{base.scheme}://{base.host}{h}"
    if h.startswith("#"):
        return None  # same-page fragment
    # relative: against base path directory
    basedir = base.path[: base.path.rfind("/") + 1] or "/"
    return f"{base.scheme}://{base.host}{basedir}{h}"


_CANONICAL = dict(strip_params=True, strip_common_file=True)

_BASE_TAG_RE = re.compile(r"<base\b([^>]*)>", re.IGNORECASE | re.DOTALL)


def _document_base(ordered_spans: list, page: ParsedUrl) -> ParsedUrl:
    """XmlDoc::getBaseUrl (XmlDoc.cpp:16137-16165): the resolve base is
    the page URL unless the document carries a ``<base href>`` tag — the
    FIRST base tag with a non-empty href decides; if its value has no
    valid host/domain (e.g. ``<base href="/">``, which real pages emit)
    the page URL stands (the reference's explicit invalid-base fixup)."""
    for span in ordered_spans:
        if _get(span, "kind") == "media_ref":
            continue
        text = _get(span, "text") or ""
        for m in _BASE_TAG_RE.finditer(text):
            hm = _HREF_RE.search(m.group(1))
            if not hm:
                continue
            href = html.unescape(
                hm.group(2) or hm.group(3) or hm.group(4) or "").strip()
            if not href:
                continue
            p = normalize_url(href, **_CANONICAL)
            if p is not None and p.host and p.domain:
                return p
            return page      # first non-empty base decides, even invalid
    return page


def extract_outlinks(
    page_url: str,
    spans: list,
    harvest_links: bool = True,
) -> list[dict]:
    """Harvest outlinks from one document's spans in span order.

    ``spans`` rows are dicts/Rows with kind/text/media_ref/offset.  Returns a
    list of dicts: url_raw, url_norm, host, domain, tld, path_cgi, is_www,
    is_media, uh48-ready fields left to the caller.  Media refs are returned
    with is_media=True (excluded from the frontier by the caller, like
    XmlDoc.cpp:15293-15303).
    """
    base = normalize_url(page_url, **_CANONICAL)
    if base is None or not harvest_links:
        return []
    seen: set[str] = set()
    out: list[dict] = []
    ordered = sorted(spans, key=lambda s: _get(s, "offset"))
    # hrefs resolve against the DOCUMENT base (<base href>, if any);
    # self-link detection and parent_domain stay on the page URL
    link_base = _document_base(ordered, base)

    def _emit(raw: str, is_media: bool) -> None:
        resolved = resolve_href(raw, link_base)
        if resolved is None:
            return
        p = normalize_url(resolved, **_CANONICAL)
        if p is None:
            return
        if len(p.host) <= 2:            # XmlDoc.cpp:15270
            return
        if p.scheme not in ("http", "https"):
            return
        if p.url == base.url:           # self-link
            return
        if p.url in seen:               # first wins (XmlDoc.cpp:15179)
            return
        seen.add(p.url)
        out.append({
            "url_raw": raw,
            "url_norm": p.url,
            "host": p.host,
            "domain": p.domain,
            "tld": p.tld,
            "path_cgi": p.path_with_cgi,
            "is_www": p.host.startswith("www."),
            # the exact XmlDoc.cpp:15293-15303 frontier gate (versioned
            # extension table, script ext, CDN domains, oembed paths) —
            # .xml/.rss stay spiderable like the reference
            "is_media": is_media or is_url_unwanted(p.host, p.domain,
                                                    p.path),
            "parent_domain": base.domain,   # feeds siteNumInlinks (sniTable)
        })

    for span in ordered:
        kind = _get(span, "kind")
        if kind == "media_ref":
            ref = _get(span, "media_ref")
            if ref:
                _emit(ref, True)
            continue
        text = _get(span, "text") or ""
        for m in _LINK_TAG_RE.finditer(text):
            tag = m.group(1).lower()
            attrs = m.group(2)
            if _REL_NOFOLLOW_RE.search(attrs):
                continue
            attr_re = _URL_ATTR_RE if tag == "weblog" else _HREF_RE
            hm = attr_re.search(attrs)
            # HTML attribute values carry entities (&amp; &#47; ...) that
            # must decode BEFORE URL resolution — the reference decodes in
            # the parser (Entities.cpp:1-60 + entities.json, Xml.cpp); a
            # raw href="a?x=1&amp;y=2" otherwise resolves to a wrong URL.
            # html.unescape implements the same HTML5 named+numeric table.
            href = html.unescape(
                hm.group(2) or hm.group(3) or hm.group(4) or "").strip() \
                if hm else ""
            if not href and tag in _TEXT_CONTENT_TAGS:
                # rss <link>url</link> / sitemap <loc>url</loc> form
                href = _text_content_url(text, m, tag)
            if not href:
                continue
            if href.lower().startswith("javascript:"):
                href = _onclick_url(attrs)
                if not href:
                    continue
            _emit(href, False)
    return out


def _get(span, key):
    if isinstance(span, dict):
        return span.get(key)
    return getattr(span, key)
