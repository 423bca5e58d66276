"""isPermalink — the exact URL-only form of Linkdb.cpp:4734-5159.

The reference computes ``ksr.m_isUrlPermalinkFormat`` for every harvested
outlink with ``::isPermalink(NULL, &url, CT_HTML, NULL, isRSSExt)``
(XmlDoc.cpp:15394-15396) — the Links*/LinkInfo* arms are NULL on that
call, which removes the self-link/outlink voting passes and leaves a pure
function of the URL.  This module transcribes that pure function.

Control flow, in reference order (line refs into Linkdb.cpp):

1. rss-ext links are never permalinks (:4751)
2. site roots are never permalinks (:4757, Url::isRoot = path "/" and
   no query)
3. feedproxy.* hosts and feeds.feedburner.com/~ URLs always are
   (:4774-4783 — the second compare reads 22 bytes from the host
   pointer, spanning into the path, so it means host ==
   "feeds.feedburner.com" AND path starts "/~")
4. digit scan over path+query: 3+ consecutive digits qualify; a
   /yyyy/mm/ run inside the PATH with 1990<=y<=2050, 1<=m<=31 sets
   STRONGPERM (:4810-4851)
5. 2+ hyphens/underscores within one path component qualify (:4852-4865)
6. a ?p=<digit> query qualifies and is STRONGPERM (:4867-4872)
7. none of 4-6 -> not a permalink (:4882-4887)
8. ?m=<n> with 199000<n<205000 -> not a permalink (:4901-4909)
9. the index/tag/category/forum/... needle ladder -> not a permalink
   (:4963-5075); the cat=/tag=/tags= needles scan the WHOLE url and
   require a non-alpha char before the needle; "forum" scans the whole
   url (so forum.example.com fails), "thread"/"topic" scan the path
10. trailing-form checks after stripping a trailing "index.html" and
    "/": /trackback, an archive date /dddd/dd with 1990<y<=2015 and
    0<m<=12, a trailing /20xx with atoi(last2)<50, /19xx with
    atoi(last2)>90 -> not a permalink (:5076-5138).  The atoi calls
    return 0 on non-digits — "/20th" really is rejected by the
    reference; preserved.
11. otherwise it IS a permalink (:5155)
"""

from __future__ import annotations

from .urlnorm import ParsedUrl


def _is_digit(c: str) -> bool:
    return "0" <= c <= "9"


def _is_alpha(c: str) -> bool:
    return ("a" <= c <= "z") or ("A" <= c <= "Z")


def _atoi(s: str) -> int:
    """C atoi: leading digits (no sign needed here), 0 if none."""
    i = 0
    while i < len(s) and _is_digit(s[i]):
        i += 1
    return int(s[:i]) if i else 0


def _needle_with_nonalpha_before(url: str, needle: str) -> bool:
    """gb_strcasestr(url, needle) with pos > start and !is_alpha(prev)
    (Linkdb.cpp:5008-5026).  Only the FIRST occurrence is tested, like
    the reference."""
    pos = url.lower().find(needle)
    return pos > 0 and not _is_alpha(url[pos - 1])


def is_permalink_format(u: ParsedUrl, is_rss_ext: bool) -> bool:
    """::isPermalink(NULL, &url, CT_HTML, NULL, isRSSExt) — Linkdb.cpp:4734."""
    if is_rss_ext:
        return False
    # Url::isRoot (Url.cpp:1496-1503)
    if u.path == "/" and not u.query:
        return False
    if u.host.startswith("feedproxy."):
        return True
    if u.host == "feeds.feedburner.com" and u.path.startswith("/~"):
        return True

    path = u.path
    lpath = path.lower()
    full = path + ("?" + u.query if u.query else "")
    plen = len(path)

    # -- digit scan over path AND cgi (Linkdb.cpp:4810-4851); the
    # digitsInCgi flag the C code also tracks only gates the
    # Links-outlink voting passes, which are NULL on this form
    dcount = 0
    strong = False
    for i, ch in enumerate(full):
        if not _is_digit(ch):
            dcount = 0
            continue
        # strong-permalink /yyyy/mm/ must sit inside the PATH (pend)
        if (i + 9 < plen and i > 0 and full[i - 1] == "/"
                and full[i:i + 4].isdigit() and full[i + 4] == "/"
                and full[i + 5:i + 7].isdigit() and full[i + 7] == "/"):
            y = _atoi(full[i:])
            m = _atoi(full[i + 5:])
            if 1990 <= y <= 2050 and 1 <= m <= 31:
                strong = True
        dcount += 1
        if dcount == 3:
            break

    # -- 2+ hyphens/underscores in a single path component (:4852-4865)
    hcount = 0
    for ch in path:
        if ch == "/":
            hcount = 0
            continue
        if ch not in "_-":
            continue
        hcount += 1
        if hcount == 2:
            break

    # -- ?p=<digit> (:4867-4872)
    q = u.query
    hasp = len(q) >= 3 and q[0] == "p" and q[1] == "=" and _is_digit(q[2])
    if hasp:
        strong = True

    if not hasp and dcount < 3 and hcount < 2:
        return False

    # -- ?m=<yyyymm> archive cgi (:4901-4909)
    if len(q) >= 3 and q[0] == "m" and q[1] == "=" and _is_digit(q[2]):
        n = _atoi(q[2:])
        if 199000 < n < 205000:
            return False

    # -- needle ladder (:4963-5075)
    if (("/archive" in lpath or _path_depth(u) == 0)
            and "/index." in lpath and not u.query):
        return False
    if "/tag/" in lpath:
        return False
    if "/category" in lpath:
        return False
    if "/cat_" in lpath:
        return False
    if "/cat/" in lpath:
        return False
    if "/comment.html" in lpath:
        return False
    if "/comments/" in lpath:
        return False
    if _needle_with_nonalpha_before(u.url, "cat="):
        return False
    if _needle_with_nonalpha_before(u.url, "tag="):
        return False
    if _needle_with_nonalpha_before(u.url, "tags="):
        return False
    if "forum" in u.url.lower():
        return False
    if "thread" in lpath:
        return False
    if "topic" in lpath and "/topics/" not in lpath:
        return False
    if "/default." in lpath:
        return False
    if "/profile." in lpath:
        return False
    if "/archives." in lpath:
        return False
    if "_archive." in lpath:
        return False
    if "/search." in lpath:
        return False
    if "/search/" in lpath:
        return False

    # -- trailing forms (:5076-5138)
    p = path
    if len(p) > 10 and p.endswith("index.html"):
        p = p[:-10]
    if p.endswith("/"):
        p = p[:-1]
    if len(p) >= 10 and p[-10:].lower() == "/trackback":
        return False
    if (len(p) >= 8 and _is_digit(p[-1]) and _is_digit(p[-2])
            and p[-3] == "/" and p[-7:-3].isdigit()
            and p[-8] == "/"):
        year = _atoi(p[-7:])
        month = _atoi(p[-2:])
        if 1990 < year <= 2015 and 0 < month <= 12:
            return False
    if len(p) >= 5 and p[-5] == "/" and p[-4] == "2" and p[-3] == "0":
        if _atoi(p[-2:]) < 50:
            return False
    if len(p) >= 5 and p[-5] == "/" and p[-4] == "1" and p[-3] == "9":
        if _atoi(p[-2:]) > 90:
            return False

    return True


def _path_depth(u: ParsedUrl) -> int:
    """Url::getPathDepth(false) (Url.cpp:1440-1448): '/' count from
    path[1] through the END OF THE URL (query included)."""
    s = u.path[1:] + ("?" + u.query if u.query else "")
    return s.count("/")


def is_rss_ext(path: str) -> bool:
    """XmlDoc.cpp:15341-15351: extension rss/xml/atom."""
    from .urlgates import url_extension
    return url_extension(path).lower() in ("rss", "xml", "atom")
