"""Site definition (SiteGetter.cpp) — which URL prefix is "the site".

The reference's effective algorithm (SiteGetter.cpp:90-620):

1. **Recognized user-area prefixes** (``setRecognizedSite``,
   SiteGetter.cpp:449-545): paths starting ``/~``, ``/users/``,
   ``/user/``, ``/members/``, ``/membres/``, ``/member/``, ``/membre/``,
   ``/member.php?u=`` — the site is ``host + prefix + username + '/'``
   where the username runs to the next ``/`` or ``?`` and must contain
   at least one alnum char.
2. **Popular homesteads** (SiteGetter.cpp:549-560): hosts containing
   ``vimeo.com``, ``www.myspace.com``, ``twitter.com``,
   ``www.facebook.com`` — the site is host + the first path component.
3. Otherwise the site is the **hostname** (``setSite``,
   SiteGetter.cpp:401-446).
4. In every branch a bare registered domain gets a ``www.`` prefix
   (``m_hasSubdomain`` check), and a site that doesn't already end in
   ``/`` or ``=`` gets a trailing ``/``.

Note the fork's ``setSite`` ignores ``m_sitePathDepth`` — the Msg0
bushiness vote (>=100 indexed pages under a prefix, SiteGetter.cpp:
236-344) feeds only the tagdb ``sitepathdepth`` tag, never the site
string, so we do not model it.

The site key feeds the F28 ``sitepages`` quota (SpiderColl.cpp
m_siteHash32 counting) so a ``/~user/`` area counts as its own site.

Spark shape: one pure function for tests/UDF use plus a vectorized
pandas batch for index-time use; zero shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# SiteGetter.cpp:478-489 (order matters: longest first so /members/
# beats /member/)
_USER_PREFIXES = ("/member.php?u=", "/members/", "/membres/", "/member/",
                  "/membre/", "/users/", "/user/", "/~")

# SiteGetter.cpp:552-557
_HOMESTEAD_SUBSTR = ("vimeo.com", "www.myspace.com", "twitter.com",
                     "www.facebook.com")

_ALNUM = re.compile(r"[A-Za-z0-9]")


def _split(url: str) -> tuple[str, str] | None:
    m = re.match(r"[a-zA-Z0-9+.-]+://([^/]*)(/.*)?$", url)
    if not m:
        return None
    return m.group(1), m.group(2) or ""


def _has_subdomain(host: str, domain: str | None) -> bool:
    """Url.cpp hasSubdomain: the host carries a label beyond the
    registered domain.  When the caller can't supply the registered
    domain we fall back to 'two labels = bare domain'."""
    if domain:
        return host != domain
    return host.count(".") > 1


def _www(host: str, domain: str | None) -> str:
    return host if _has_subdomain(host, domain) else "www." + host


def get_site(url: str, domain: str | None = None) -> str:
    """The site string for a normalized URL (scheme dropped, like the
    reference's m_site buffer)."""
    parts = _split(url)
    if parts is None:
        return url
    host, path = parts
    base = _www(host, domain)

    # 1. recognized user-area prefixes
    for pref in _USER_PREFIXES:
        if path.lower().startswith(pref):
            rest = path[len(pref):]
            j = 0
            username = False
            while j < len(rest) and rest[j] not in "/?":
                if _ALNUM.match(rest[j]):
                    username = True
                j += 1
            if username:
                site = base + path[:len(pref)] + rest[:j]
                if not site.endswith(("/", "=")):
                    site += "/"
                return site
            break   # prefix matched but no username: fall through

    # 2. popular homesteads: first path component
    if any(s in host for s in _HOMESTEAD_SUBSTR):
        if path in ("", "/"):
            return base
        j = path.find("/", 1)
        comp = path[1:j] if j > 0 else path[1:]
        if comp:
            site = base + "/" + comp
            if not site.endswith(("/", "=")):
                site += "/"
            return site

    # 3. plain hostname
    return base


def get_site_batch(urls, domains=None) -> np.ndarray:
    """Vectorized-enough batch form for pandas UDF plumbing."""
    urls = pd.Series(urls).astype(str)
    if domains is None:
        return np.array([get_site(u) for u in urls], dtype=object)
    domains = pd.Series(domains)
    return np.array([get_site(u, None if d is None or d != d else str(d))
                     for u, d in zip(urls, domains)], dtype=object)


def site_expr(url_col, host_col, domain_col):
    """Pure-Catalyst form of :func:`get_site` for the hot candidate
    path (no UDF): used by the F28 sitepages quota key.  Property-tested
    equal to the Python form."""
    from pyspark.sql import functions as F

    path = F.regexp_replace(url_col, r"^[a-zA-Z0-9+.-]+://[^/]*", "")
    base = F.when(host_col == domain_col,
                  F.concat(F.lit("www."), host_col)).otherwise(host_col)
    pref_re = (r"(?i)^(/~|/users/|/user/|/members/|/membres/|/member/"
               r"|/membre/|/member\.php\?u=)([^/?]*)")
    pref = F.regexp_extract(path, pref_re, 1)
    uname = F.regexp_extract(path, pref_re, 2)
    user_ok = (pref != F.lit("")) & uname.rlike("[A-Za-z0-9]")
    user_site = F.concat(base, F.substring(path, 1, F.length(pref)
                                           + F.length(uname)))
    home = host_col.rlike(r"vimeo\.com|www\.myspace\.com|twitter\.com"
                          r"|www\.facebook\.com")
    comp = F.regexp_extract(path, r"^/([^/]+)", 1)
    home_site = F.concat(base, F.lit("/"), comp)

    def slashed(raw):
        # storeIt's trailing-/ fix applies only to the path-carrying
        # branches; a plain hostname site has no trailing slash
        # (SiteGetter.cpp:526-536 vs setSite)
        return F.when(raw.rlike("[/=]$"), raw) \
                .otherwise(F.concat(raw, F.lit("/")))

    return (F.when(user_ok, slashed(user_site))
            .when(home & (comp != F.lit("")), slashed(home_site))
            .otherwise(base))
