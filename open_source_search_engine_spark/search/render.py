"""Result-feed serialization — PageResults.cpp's JSON/XML output
formats (the &format=json / &format=xml API a reference user consumes).

Envelope keys and order follow PageResults.cpp:896-1160
(currentTimeUTC, responseTimeMS, hits, moreResultsFollow, spell,
queryInfo{fullQuery, queryLanguageAbbr}, results) and the per-result
printer printResult (PageResults.cpp:1968-2950: title, sum, url,
hopCount, size, sizeInBytes, docId, docScore, cacheAvailable, isAdult,
site, language, langAbbr).

This is deliberately DRIVER-side: the reference serializes in Msg40
after the gather, over one bounded result page (<= k rows) — constant
work regardless of corpus size, so a ``collect()`` here is the correct
plan shape, not a scale hazard.  The distributed part (rank, join-back,
titles, summaries, post-filters) is ``serve.serve_results``.
"""

from __future__ import annotations

import json
from urllib.parse import urlparse
from xml.sax.saxutils import escape


def _site_of(url: str) -> str:
    try:
        return urlparse(url).netloc if url else ""
    except Exception:
        return ""


def _result_dict(row) -> dict:
    """One printResult record, reference key order."""
    get = (row.get if isinstance(row, dict)
           else lambda k, d=None: getattr(row, k, d))
    url = get("url", "") or ""
    text = get("_text", None) or get("text", "") or ""
    size = len(text.encode("utf-8"))
    lang = get("lang", None) or "xx"
    out = {
        "title": get("title", "") or "",
        "sum": get("summary", "") or "",
        "url": url,
        "size": f"{max(size, 1) / 1024.0:4.0f}k",
        "sizeInBytes": size,
        "docId": int(get("doc_id", 0) or 0),
        "docScore": float(get("score", 0) or 0),
        "isAdult": bool(get("is_adult", False)),
        "site": _site_of(url),
        "language": lang,
        "langAbbr": lang,
    }
    return out


def render_results_json(rows, query: str, *, hits: int | None = None,
                        took_ms: int = 0, current_time_utc: int = 0,
                        more_follow: bool = False,
                        spell: str | None = None, qlang: str = "en",
                        indent: int | None = None) -> str:
    """The &format=json feed.  ``rows``: the collected (bounded) result
    page from ``serve_results`` — Rows or dicts, rank order."""
    rows = list(rows)
    env: dict = {
        "currentTimeUTC": int(current_time_utc),
        "responseTimeMS": int(took_ms),
        "hits": int(hits if hits is not None else len(rows)),
        "moreResultsFollow": 1 if more_follow else 0,
    }
    if spell:
        env["spell"] = spell
    env["queryInfo"] = {
        "fullQuery": query,
        "queryLanguageAbbr": qlang,
    }
    env["results"] = [_result_dict(r) for r in rows]
    return json.dumps(env, indent=indent, ensure_ascii=False)


def render_results_xml(rows, query: str, *, hits: int | None = None,
                       took_ms: int = 0, current_time_utc: int = 0,
                       more_follow: bool = False) -> str:
    """The &format=xml feed (PageResults.cpp:896 '<?xml version=...'
    + per-result <result> blocks with CDATA text fields)."""
    rows = list(rows)
    parts = ['<?xml version="1.0" encoding="UTF-8" ?>', "<response>"]
    parts.append(f"\t<currentTimeUTC>{int(current_time_utc)}"
                 "</currentTimeUTC>")
    parts.append(f"\t<responseTimeMS>{int(took_ms)}</responseTimeMS>")
    n = int(hits if hits is not None else len(rows))
    parts.append(f"\t<hits>{n}</hits>")
    parts.append(f"\t<moreResultsFollow>{1 if more_follow else 0}"
                 "</moreResultsFollow>")
    parts.append(f"\t<query><![CDATA[{query}]]></query>")
    for r in rows:
        d = _result_dict(r)
        parts.append("\t<result>")
        parts.append(f"\t\t<title><![CDATA[{d['title']}]]></title>")
        parts.append(f"\t\t<sum><![CDATA[{d['sum']}]]></sum>")
        parts.append(f"\t\t<url><![CDATA[{d['url']}]]></url>")
        parts.append(f"\t\t<size>{escape(d['size'])}</size>")
        parts.append(f"\t\t<sizeInBytes>{d['sizeInBytes']}"
                     "</sizeInBytes>")
        parts.append(f"\t\t<docId>{d['docId']}</docId>")
        parts.append(f"\t\t<docScore>{d['docScore']}</docScore>")
        parts.append(f"\t\t<isAdult>{int(d['isAdult'])}</isAdult>")
        parts.append(f"\t\t<site><![CDATA[{d['site']}]]></site>")
        parts.append(f"\t\t<language>{escape(d['language'])}"
                     "</language>")
        parts.append("\t</result>")
    parts.append("</response>")
    return "\n".join(parts)


def serve_results_json(docs, query: str, k: int = 10, fmt: str = "json",
                       **serve_kwargs) -> str:
    """One call: the whole Msg40 flow (serve.serve_results) + the feed
    serializer — what a reference user gets from /search?q=...&format=
    json."""
    from .serve import serve_results
    page = serve_results(docs, query, k=k, **serve_kwargs)
    rows = sorted(page.collect(), key=lambda r: r.rank)
    if fmt == "xml":
        return render_results_xml(rows, query)
    return render_results_json(rows, query)
