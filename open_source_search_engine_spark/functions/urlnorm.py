"""Gigablast URL normalization (``Url::set``, ``Url.cpp:794-1380``) in Python.

Behavioral contract (each step cites the reference):

1.  truncate input to 1014 bytes (``MAX_URL_LEN-10``, ``Url.cpp:806-809``)
2.  strip leading chars that are not alnum / '-' / '/' (``Url.cpp:813-818``)
3.  stop at first whitespace; on the first non-ASCII byte, punycode-encode
    the non-ASCII host labels (``xn--`` prefix) and continue
    (``Url.cpp:822-1008``)
4.  collapse leading ``http://http://`` repeats (``Url.cpp:1012-1016``)
5.  record+drop ``#fragment`` unless ``#!`` hash-bang (``Url.cpp:1019-1039``)
6.  optional session-id / tracking-param strip (v122 token list,
    ``Url.cpp:141-360``)
7.  optional trailing ``/index.html``-class filename strip
    (``Url.cpp:1070-1113``)
8.  ``\\`` -> ``/`` (``Url.cpp:1117-1124``)
9.  scheme parse; lowercased; ``http://`` prepended when missing; ``//host``
    (scheme-relative) accepted (``Url.cpp:1127-1162``)
10. host = [alnum.-_]*, lowercased, trailing dots dropped (``Url.cpp:1165-1175``)
11. optional ``www.`` insertion when host==domain (``Url.cpp:1220-1231``)
12. default port dropped (80/http, 443/https, 21/ftp) (``Url.cpp:1232-1250``)
13. path: ``//`` dedup, ``/./`` and ``/../`` resolution, ``;?``->``?``
    (``Url.cpp:1264-1320``); path ends at ``?`` or ``#`` (not ``#!``)
14. query kept verbatim except ``&&`` dedup (``Url.cpp:1325-1343``)
15. no path -> ``/`` appended (``Url.cpp:1263-1270``)

The default flag profile matches the spider path (``Url.h:65-75``:
addWWW=False, stripParams=False); the pipeline's canonical profile enables
strip_params + strip_common_file so that session-id aliases collapse to one
uh48, which is what the URL-seen set needs.
"""

from __future__ import annotations

from dataclasses import dataclass

MAX_URL_LEN = 1024  # Url.h:9

_WSPACE = set(" \t\n\r\v\f")

# v122 session/tracking parameter list, in reference match order
# (Url.cpp:184-263).  Entries are (token, token_len_to_skip, case_sensitive,
# needs_hex_check) — needs_hex_check mirrors the isSessionId() guard
# (Url.cpp:141-160).
_PARAM_TOKENS: list[tuple[str, bool, bool]] = [
    ("PHPSESSID=", False, False),
    ("SID=", True, False),
    ("osCsid=", True, True),
    ("XTCsid=", True, True),
    ("osCsid/", True, True),
    ("sid=", True, True),
    ("jsessionid=", False, False),
    ("vbsessid=", False, False),
    ("asesessid=", False, False),
    ("nlsessid=", False, False),
    ("psession=", False, False),
    ("session_id=", False, False),
    ("sessionid=", False, False),
    ("sessid=", False, False),
    ("session=", False, False),
    ("session/", False, False),
    ("POSTNUKESID=", False, False),
    ("auth_sess=", False, False),
    ("mysid=", False, False),
    ("oscsid=", False, False),
    ("cg_sess=", False, False),
    ("galileoSession", False, False),
    ("sess=", False, False),
    (".php?s=", True, False),  # special: needs 32 hex chars (Url.cpp:339-357)
    ("SES=", True, False),
    ("elq=", False, False),
    ("elqat=", False, False),
    ("elqaid=", False, False),
    ("elq_mid=", False, False),
    ("elqTrackId=", False, False),
    ("utm_term=", False, False),
    ("utm_hp_ref=", False, False),
    ("utm_source=", False, False),
    ("utm_medium=", False, False),
    ("utm_content=", False, False),
    ("utm_campaign=", False, False),
    ("pk_kwd=", False, False),
    ("pk_source=", False, False),
    ("pk_medium=", False, False),
    ("pk_campaign=", False, False),
    ("trk=", False, False),
    ("promoid=", False, False),
    ("promCode=", False, False),
    ("promoCode=", False, False),
    ("partnerref=", False, False),
]

# trailing common filenames, longest-first exactly as the reference ladder
# (Url.cpp:1070-1113); stripped to keep the trailing '/'
_COMMON_FILES = [
    "default.xhtml", "default.html", "default.ascx", "default.ashx",
    "default.asmx", "default.xhtm", "default.aspx", "default.htm",
    "default.php", "default.asp", "index.xhtml", "index.html",
    "index.aspx", "index.xhtm", "default.pl", "default.cs", "index.htm",
    "index.php", "index.asp", "main.html", "main.aspx", "index.pl",
    "main.htm", "main.php", "main.pl",
]

# domain/TLD split lives in domains.py — the exact Domains.cpp ladder
# with the reference's full two-label suffix table.
from .domains import get_domain, get_domain_of_ip, get_tld


def _is_alnum(c: str) -> bool:
    return ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9")


def _is_session_id(v: str) -> bool:
    """isSessionId (Url.cpp:141-160): >=12 chars of [0-9a-f] with >=1 hex
    letter."""
    count = 0
    non_num = 0
    for ch in v:
        if "0" <= ch <= "9":
            count += 1
            continue
        non_num += 1
        if "a" <= ch <= "f":
            count += 1
            continue
        return False
    return non_num > 0 and count >= 12


def _strip_params_v122(s: str) -> str:
    """stripParametersv122 (Url.cpp:162-360): removes at most ONE matched
    session/tracking parameter per call, exactly like the reference (the
    UrlTest StripParamsV122 vectors pin this down — e.g. only ``utm_term`` is
    removed from the urchin.com URL even though ``utm_source`` etc. are also
    present)."""
    # only look in the part at/after the first '?' or ';'
    qpos = len(s)
    for i, ch in enumerate(s):
        if ch in "?;":
            qpos = i
            break
    if qpos >= len(s):
        return s
    region = s[qpos:]
    low = region.lower()

    found = -1
    tok_len = 0
    for tok, case_sensitive, hex_check in _PARAM_TOKENS:
        if tok == ".php?s=":
            # .php?s=<32 hex> form (Url.cpp:339-357); searched from p-4 so
            # the ".php" sits just before the '?' region start
            idx = s.find(".php?s=", max(0, qpos - 4))
            if idx >= 0:
                val = s[idx + 7:]
                i = 0
                while i < len(val) and (val[i].isdigit() or "a" <= val[i] <= "f"):
                    i += 1
                if i >= 32:
                    found = idx + 5  # points at "s="
                    tok_len = 2
                    break
            continue
        if case_sensitive:
            idx = region.find(tok)
        else:
            idx = low.find(tok.lower())
        if idx < 0:
            continue
        if hex_check:
            tail = region[idx + len(tok):]
            end = 0
            while end < len(tail) and tail[end] not in "&?;":
                end += 1
            if not _is_session_id(tail[:end]):
                continue
        found = qpos + idx
        tok_len = len(tok)
        break

    if found < 0:
        return s

    # must not have an alnum char before it (Url.cpp:303-306)
    if found > 0 and _is_alnum(s[found - 1]):
        return s

    a = found
    b = a + tok_len
    # back up to ? & / or ; (Url.cpp:311-313)
    while a > 0 and s[a - 1] not in "?&/;":
        a -= 1
    if a < len(s) and s[a] == "?":
        a += 1
    if a > 0 and s[a - 1] == ";":
        a -= 1
    # advance b to & ? ; or end (Url.cpp:322-323)
    while b < len(s) and s[b] not in "&?;":
        b += 1
    # value must be >=5 chars (Url.cpp:326-328)
    if b - (found + tok_len) < 5:
        return s
    if b < len(s) and s[b] in "&;":
        b += 1
    out = s[:a] + s[b:]
    while out and out[-1] in "?&;":
        out = out[:-1]
    return out


def _is_hex(v: str) -> bool:
    return bool(v) and all(c in "0123456789abcdefABCDEF" for c in v)


def _is_alnum_str(v: str) -> bool:
    return bool(v) and all(_is_alnum(c) for c in v)


# v123 path-segment session families (Url.cpp:368-407 urlParser rules):
# name → (case_sensitive, value validators).  A /name/value/ path pair is
# removed when the value passes a validator; a trailing /name/ with empty
# value is removed too (Validator allow_empty).
_V123_PATH_FAMILIES: list[tuple[str, bool, tuple]] = [
    ("osCsid", False, ((32, 32, _is_hex), (26, 26, _is_alnum_str))),
    ("osCAdminID", False, ((32, 32, _is_hex), (26, 26, _is_alnum_str))),
    ("XTCsid", True, ((26, 52, _is_alnum_str),)),
]


def _strip_v123_path_family(s: str) -> str:
    """Path-segment and repeated-query session-id stripping for the
    osCommerce/XT-commerce families (Url.cpp:330-407 stripParameters via
    UrlParser; validators from UrlComponent::Validator args).  Runs before
    the v122 single-shot query strip; unlike v122 it removes ALL query
    occurrences (the nailcosmetics regression case)."""
    # --- query side: remove every name=value occurrence -------------------
    for name, case_sensitive, _ in _V123_PATH_FAMILIES:
        probe = s if case_sensitive else s.lower()
        token = (name if case_sensitive else name.lower()) + "="
        while True:
            idx = probe.find(token)
            while idx > 0 and probe[idx - 1] not in "?&;":
                idx = probe.find(token, idx + 1)
            if idx < 0:
                break
            end = idx + len(token)
            while end < len(s) and s[end] not in "&?;#":
                end += 1
            a = idx
            if a > 0 and s[a - 1] in "&;":
                a -= 1
            elif end < len(s) and s[end] in "&;":
                end += 1
            s = s[:a] + s[end:]
            while s and s[-1] in "?&;":
                s = s[:-1]
            probe = s if case_sensitive else s.lower()
    # --- path side: /name/value/ pairs ------------------------------------
    qpos = len(s)
    for i, ch in enumerate(s):
        if ch in "?#":
            qpos = i
            break
    path, tail = s[:qpos], s[qpos:]
    segs = path.split("/")
    out: list[str] = []
    i = 0
    # skip scheme://host region: first 3 split parts for absolute urls
    skip = 3 if "://" in path[:10] else 1
    while i < len(segs):
        seg = segs[i]
        matched = False
        if i >= skip:
            for name, case_sensitive, validators in _V123_PATH_FAMILIES:
                if (seg == name if case_sensitive
                        else seg.lower() == name.lower()):
                    nxt = segs[i + 1] if i + 1 < len(segs) else None
                    if nxt is not None and nxt != "":
                        if any(lo <= len(nxt) <= hi and fn(nxt)
                               for lo, hi, fn in validators):
                            i += 2        # drop name + value
                            matched = True
                    elif nxt == "" and i + 2 == len(segs):
                        i += 1            # trailing /name/ with empty value
                        matched = True
                    elif nxt is None:
                        i += 1            # /name at very end
                        matched = True
                    break
        if matched:
            continue
        out.append(seg)
        i += 1
    return "/".join(out) + tail


def _punycode_host(t: str) -> str:
    """Encode non-ASCII host labels as ``xn--<punycode>`` (Url.cpp:840-1006).
    ASCII labels pass through; the path/query is carried unchanged."""
    p = 0
    if t.startswith("http://"):
        p = 7
    elif t.startswith("https://"):
        p = 8
    slash = t.find("/", p)
    hostport = t[p:] if slash < 0 else t[p:slash]
    rest = "" if slash < 0 else t[slash:]
    labels = []
    for label in hostport.split("."):
        if label.isascii():
            labels.append(label)
        else:
            try:
                labels.append("xn--" + label.lower().encode("punycode").decode("ascii"))
            except UnicodeError:
                labels.append(label.encode("utf-8", "ignore").decode("ascii", "ignore"))
    return t[:p] + ".".join(labels) + rest


@dataclass
class ParsedUrl:
    url: str          # full normalized url
    scheme: str
    host: str
    port: int         # 0 when default
    domain: str       # registered domain ('' when host is an IP or no tld)
    tld: str
    path: str         # always starts with '/', includes no query
    query: str        # without '?', '' if none
    is_ip: bool

    @property
    def path_with_cgi(self) -> str:
        """Path plus '?query' — what robots rules match against
        (Url.h:158-166, Robots.cpp:324-361)."""
        return self.path + ("?" + self.query if self.query else "")


def normalize_url(
    raw: str,
    add_www: bool = False,
    strip_params: bool = False,
    strip_common_file: bool = False,
) -> ParsedUrl | None:
    """Port-faithful Url::set.  Returns None for unusable input (empty after
    junk stripping), mirroring the reference's zero-length reset."""
    if raw is None:
        return None
    t = raw[: MAX_URL_LEN - 10]

    # strip leading junk (Url.cpp:813-818)
    start = 0
    n = len(t)
    while start < n and not (_is_alnum(t[start]) or t[start] in "-/"):
        start += 1
    t = t[start:]
    if not t:
        return None

    # stop at whitespace; punycode on non-ascii (Url.cpp:822-1008)
    cut = len(t)
    non_ascii = -1
    for i, ch in enumerate(t):
        if ch in _WSPACE:
            cut = i
            break
        if ord(ch) > 127:
            non_ascii = i
            cut = i
            break
    if non_ascii != -1:
        t = _punycode_host(t)
        # if non-ascii survives outside the host (path/query), cut there —
        # the reference's re-set() would stop at it identically
        for i, ch in enumerate(t):
            if ord(ch) > 127 or ch in _WSPACE:
                t = t[:i]
                break
    else:
        t = t[:cut]
    if not t:
        return None

    # collapse http://http:// (Url.cpp:1012-1016)
    low = t.lower()
    while len(t) > 14 and low.startswith("http://http://"):
        t = t[7:]
        low = low[7:]

    # drop #fragment unless #! (Url.cpp:1019-1039)
    for i, ch in enumerate(t):
        if ch == "#" and not (i + 1 < len(t) and t[i + 1] == "!"):
            t = t[:i]
            break
    if not t:
        return None

    s = t
    if strip_params:
        s = _strip_v123_path_family(s)
        s = _strip_params_v122(s)

    if strip_common_file:
        low = s.lower()
        for fname in _COMMON_FILES:
            suffix = "/" + fname
            if low.endswith(suffix) and len(s) > len(suffix):
                s = s[: len(s) - len(fname)]  # keep the '/'
                break

    s = s.replace("\\", "/")

    # scheme (Url.cpp:1127-1162)
    i = 0
    while i < len(s) and (_is_alnum(s[i]) or s[i] == "-"):
        i += 1
    if i + 2 < len(s) and s[i] == ":" and s[i + 1] == "/" and s[i + 2] == "/":
        scheme = s[:i].lower()
        rest = s[i + 3:]
    elif i + 2 < len(s) and s[i] == ":" and s[i + 1] == "/" and _is_alnum(s[i + 2]):
        scheme = s[:i].lower()  # single-slash mistake: 'http:/x' -> fixed
        rest = s[i + 2:]
    else:
        scheme = "http"
        rest = s[2:] if s.startswith("//") else s

    # host (Url.cpp:1165-1180)
    j = 0
    while j < len(rest) and (_is_alnum(rest[j]) or rest[j] in ".-_"):
        j += 1
    host = rest[:j].lower()
    after = rest[j:]
    while host.endswith("."):
        host = host[:-1]
    if not host:
        return None

    is_ip = _looks_like_ip(host)

    # domain / tld (Url.cpp:1191-1216): IPs get the C-block as domain and
    # no tld; otherwise the Domains.cpp getTLD/getDomain ladder, with the
    # tld only counted when it is a proper suffix (m_tld > m_host).
    domain, tld = "", ""
    if is_ip:
        domain = get_domain_of_ip(host) or ""
    else:
        t = get_tld(host)
        if t is not None and len(t) < len(host):
            tld = t
            domain = get_domain(host, t) or ""

    # addWWW when the host IS the registered domain and contains a period
    # (Url.cpp:1219-1230 — pointer equality m_host == m_domain + strchr)
    if add_www and not is_ip and host == domain and "." in host:
        host = "www." + host
        # domain/tld unchanged

    # port (Url.cpp:1232-1261)
    def_port = {"http": 80, "https": 443, "ftp": 21}.get(scheme, 80)
    port = 0
    if after.startswith(":"):
        k = 1
        while k < len(after) and after[k] != "/":
            k += 1
        try:
            p = int(after[1:k] or "0")
        except ValueError:
            p = 0
        if p != def_port:
            port = p
        after = after[k:]

    # path (Url.cpp:1264-1343)
    if not after.startswith("/"):
        path, query = "/", ""
    else:
        # path ends at '?' or '#' (not '#!')
        j = 0
        while j < len(after) and after[j] != "?":
            if after[j] == "#" and not (j + 1 < len(after) and after[j + 1] == "!"):
                break
            j += 1
        rawpath = after[:j]
        tail = after[j:]
        out: list[str] = []
        k = 0
        while k < len(rawpath):
            ch = rawpath[k]
            if ch == "/" and out and out[-1] == "/" and (len(out) < 2 or out[-2] != ":"):
                k += 1
                continue
            if ch == "." and out and out[-1] == "/" and (k + 1 == len(rawpath) or rawpath[k + 1] == "/"):
                k += 1
                continue
            if ch == "." and k + 1 < len(rawpath) and rawpath[k + 1] == "." and out and out[-1] == "/":
                # pop to previous '/'
                if len(out) > 1:
                    out.pop()
                while out and out[-1] != "/":
                    out.pop()
                k += 2
                while k < len(rawpath) and rawpath[k] != "/":
                    k += 1
                continue
            nxt = rawpath[k + 1] if k + 1 < len(rawpath) else (tail[0] if tail else "")
            if ch == ";" and nxt == "?":
                k += 1
                continue
            out.append(ch)
            k += 1
        path = "".join(out) or "/"
        query = ""
        if tail.startswith("?"):
            q = tail[1:]
            # dedup && (Url.cpp:1329-1337)
            qa: list[str] = []
            for idx, ch in enumerate(q):
                if ch == "&" and idx > 0 and q[idx - 1] == "&":
                    continue
                qa.append(ch)
            query = "".join(qa)

    port_str = f":{port}" if port else ""
    full = f"{scheme}://{host}{port_str}{path}" + (f"?{query}" if query else "")
    return ParsedUrl(
        url=full, scheme=scheme, host=host, port=port, domain=domain,
        tld=tld, path=path, query=query, is_ip=is_ip,
    )


def _looks_like_ip(host: str) -> bool:
    parts = host.split(".")
    if len(parts) != 4:
        return False
    for p in parts:
        if not p.isdigit() or not (0 <= int(p) <= 255):
            return False
    return True


def domain_of_host(host: str) -> str:
    """Registered domain of a bare hostname (Url.cpp:1191-1216 split,
    Domains.cpp ladder).  IPs yield their C-block (getDomainOfIp);
    TLD-only and TLD-less hosts yield '' — matches ParsedUrl.domain for
    the same host."""
    host = host.lower().rstrip(".")
    if not host:
        return ""
    if _looks_like_ip(host):
        return get_domain_of_ip(host) or ""
    t = get_tld(host)
    if t is None or len(t) >= len(host):
        return ""
    return get_domain(host, t) or ""


# ---------------------------------------------------------------------------
# batch API (what the pandas_udf calls)
# ---------------------------------------------------------------------------

_CANONICAL_FLAGS = dict(add_www=False, strip_params=True, strip_common_file=True)


def normalize_batch(urls, **flags) -> dict[str, list]:
    """Normalize a batch of raw URLs -> column dict.  Used inside the
    frontier-ingest pandas_udf; returns plain lists for Arrow conversion."""
    opts = {**_CANONICAL_FLAGS, **flags}
    cols: dict[str, list] = {
        "url_norm": [], "scheme": [], "host": [], "domain": [], "tld": [],
        "path": [], "query": [], "is_ip": [],
    }
    for raw in urls:
        p = normalize_url(raw, **opts)
        if p is None:
            for key in cols:
                cols[key].append(None)
            continue
        cols["url_norm"].append(p.url)
        cols["scheme"].append(p.scheme)
        cols["host"].append(p.host)
        cols["domain"].append(p.domain)
        cols["tld"].append(p.tld)
        cols["path"].append(p.path)
        cols["query"].append(p.query)
        cols["is_ip"].append(p.is_ip)
    return cols
