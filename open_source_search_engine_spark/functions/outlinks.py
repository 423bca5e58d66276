"""Outlink harvesting from interleaved text+media spans (F22/F23/F24).

Mirrors the reference's link extraction:

- tags harvested: ``<a href>``, ``<link href>``, ``<area href>``
  (``Linkdb.cpp:3643-3654``); ``<img src>`` spans arrive as ``media_ref``
  spans in the interleaved docs table (``Images.cpp:160-178``)
- ``rel=nofollow`` links skipped (``Linkdb.cpp:4247-4249``)
- self-links skipped (``XmlDoc.cpp:15258-15264`` same-uh48 check)
- host must be >2 chars, scheme http(s) (``XmlDoc.cpp:15270-15291``)
- media / script / style / json extensions are never spidered
  (``XmlDoc.cpp:15293-15303``) — media refs feed thumbnails only
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

from .urlnorm import ParsedUrl, normalize_url

# href="..." inside <a ...>, <link ...>, <area ...>; attribute quoting with
# ' or " or bare
_LINK_TAG_RE = re.compile(
    r"<(a|link|area)\b([^>]*)>", re.IGNORECASE | re.DOTALL
)
_HREF_RE = re.compile(
    r"""\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
_REL_NOFOLLOW_RE = re.compile(
    r"""\brel\s*=\s*("[^"]*nofollow[^"]*"|'[^']*nofollow[^']*'|nofollow)""",
    re.IGNORECASE,
)

# extension blacklist (XmlDoc.cpp:15293-15303 + Url.cpp media list) — these
# are excluded from the frontier exactly like the reference excludes media
BAD_EXTENSIONS = frozenset(
    """gif jpg jpeg png bmp ico tif tiff webp svg
       mpg mpeg avi mov mp3 mp4 m4a m4v wav wmv flv mkv ogg webm
       css js json xml rss pdf ps doc xls ppt zip gz tgz bz2 rar 7z
       exe dmg iso bin swf""".split()
)


def _has_bad_extension(path: str) -> bool:
    dot = path.rfind(".")
    slash = path.rfind("/")
    if dot <= slash:
        return False
    return path[dot + 1:].lower() in BAD_EXTENSIONS


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
            "is_media": is_media or _has_bad_extension(p.path),
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
            attrs = m.group(2)
            if _REL_NOFOLLOW_RE.search(attrs):
                continue
            hm = _HREF_RE.search(attrs)
            if not hm:
                continue
            href = hm.group(2) or hm.group(3) or hm.group(4) or ""
            # HTML attribute values carry entities (&amp; &#47; ...) that
            # must decode BEFORE URL resolution — the reference decodes in
            # the parser (Entities.cpp:1-60 + entities.json, Xml.cpp); a
            # raw href="a?x=1&amp;y=2" otherwise resolves to a wrong URL.
            # html.unescape implements the same HTML5 named+numeric table.
            _emit(html.unescape(href), False)
    return out


def _get(span, key):
    if isinstance(span, dict):
        return span.get(key)
    return getattr(span, key)
