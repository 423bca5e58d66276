"""Frontier URL gates — the exact Url.cpp unwanted-for-indexing ladder.

The reference refuses to create spiderdb entries for media/CDN/share-button
URLs at outlink-harvest time (XmlDoc.cpp:15293-15303):

    url.hasNonIndexableExtension(TITLEREC_CURRENT_VERSION) ||
    url.hasScriptExtension() ||
    url.hasJsonExtension() ||        // dead code, see below
    url.isDomainUnwantedForIndexing() ||
    url.isPathUnwantedForIndexing()

This module transcribes each predicate exactly:

- ``has_non_indexable_extension`` — the versioned bad-extension table
  (Url.cpp:1574-1744 s_badExtensions + Url.cpp:1747-1824).  Entries from
  the legacy list carry version 50, the v73 additions (wmv/wma/ogg) 73,
  the v122 batch 122; an extension blocks only when its version <= the
  titlerec version (Url.cpp:1815 ``badVersion > version -> false``).
  Two reference quirks preserved: the legacy loop ``do {...} while
  (strcmp(s_badExtensions[i],"zip")!=0)`` stops BEFORE adding "zip"
  (Url.cpp:1752-1762), so .zip is never blocked; and xls/pptx/xlsx are
  commented out of the v122 batch.
- ``has_script_extension`` — only "js" (Url.cpp:2174-2199).
- ``has_json_extension`` — ALWAYS False: the reference guards with
  ``m_elen >= 4 -> return false`` and then switches on ``case 4``
  (Url.cpp:2146-2171), so the json arm is unreachable.  Kept as a
  documented constant so the call site mirrors XmlDoc.cpp:15293.
- ``is_domain_unwanted`` — the hardcoded CDN/shortener/share-button
  ladder (Url.cpp:1827-2036), keyed on registered domain with the exact
  host/path sub-conditions.
- ``is_path_unwanted`` — the oembed/wordpress-infrastructure path list
  (Url.cpp:2039-2103) with the reference's length guards intact (a path
  exactly equal to "/oembed?" fails the ``plen > 8`` guard and passes).
- ``is_tld_privacore_blacklisted`` — getPrivacoreBlacklistedTLD
  (Linkdb.cpp... Domains.cpp:99-101) — only consulted when the
  collection runs in privacore mode (XmlDoc.cpp:15304-15310), off by
  default here like ``is_privacore`` defaults.

``url_extension`` mirrors Url.cpp:1347-1351: the trailing alnum run of
the path, valid only when preceded by '.'.
"""

from __future__ import annotations

TITLEREC_CURRENT_VERSION = 123  # TitleRecVersion.h:15

# Url.cpp:1574-1744 — the legacy table. The init loop adds entries until
# it SEES "zip" (do/while on the NEXT element), so "zip" itself is never
# inserted; we therefore list it here but give it version 0 (= never bad)
# to keep the transcription literal.
_LEGACY_BAD_EXTENSIONS = (
    "ai", "aif", "aifc", "aiff", "asc", "au", "avi", "bcpio", "bin",
    "bmp", "bz2", "ccad", "cdf", "cpio", "cpt", "css", "dcr", "dir",
    "dms", "drw", "dvi", "dwg", "dxf", "dxr", "eps", "etx", "exe", "ez",
    "f90", "fli", "gif", "gtar", "gz", "hdf", "hh", "hqx", "ice", "ief",
    "iges", "igs", "ips", "ipx", "jpe", "jpeg", "jpg", "kar", "latex",
    "lha", "lsp", "lzh", "man", "me", "mesh", "mid", "midi", "mif",
    "mime", "mov", "movie", "mp2", "mp3", "mpe", "mpeg", "mpg", "mpga",
    "ms", "msh", "nc", "oda", "pbm", "pdb", "pgm", "pgn", "png", "pnm",
    "pot", "ppm", "pps", "ppz", "pre", "prt", "qt", "ra", "ram", "ras",
    "rgb", "rm", "roff", "rpm", "deb", "rtf", "rtx", "scm", "set",
    "sgm", "sgml", "shar", "silo", "sit", "skd", "skm", "skp", "skt",
    "smi", "smil", "snd", "sol", "spl", "src", "step", "stl", "stp",
    "sv4cpio", "sv4crc", "swf", "tar", "tcl", "tex", "texi", "texinfo",
    "tif", "tiff", "tr", "tsi", "tsp", "tsv", "unv", "ustar", "vcd",
    "vda", "viv", "vivo", "vrml", "wav", "wrl", "xbm", "xlc", "xll",
    "xlm", "xlw", "xpm", "xwd", "xyz",
)

BAD_EXT_VERSION: dict[str, int] = {e: 50 for e in _LEGACY_BAD_EXTENSIONS}
BAD_EXT_VERSION.update({"wmv": 73, "wma": 73, "ogg": 73})  # Url.cpp:1766
BAD_EXT_VERSION.update({                                   # Url.cpp:1775-1800
    "7z": 122, "lz": 122, "xz": 122, "apk": 122, "com": 122, "dll": 122,
    "dmg": 122, "flv": 122, "gpx": 122, "ico": 122, "iso": 122,
    "kmz": 122, "mp4": 122, "rar": 122, "svg": 122, "vcf": 122,
    "lzma": 122, "thmx": 122, "zipx": 122, "zsync": 122, "torrent": 122,
    "manifest": 122,
})

PRIVACORE_BLACKLISTED_TLDS = frozenset(
    "bn,cn,id,in,hk,jp,kh,kr,lk,mm,my,ph,pk,pw,ru,sg,th,tw,ua,vn".split(","))


def _is_alnum_a(c: str) -> bool:
    return ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9")


def url_extension(path: str) -> str:
    """Url.cpp:1347-1351: trailing alnum run of the path, '' unless the
    char before the run is '.'."""
    elen = 0
    plen = len(path)
    while elen < plen and _is_alnum_a(path[plen - 1 - elen]):
        elen += 1
    if elen >= plen or path[plen - 1 - elen] != ".":
        return ""
    return path[plen - elen:]


def has_non_indexable_extension(
        path: str, version: int = TITLEREC_CURRENT_VERSION) -> bool:
    """Url::hasNonIndexableExtension (Url.cpp:1747-1824)."""
    ext = url_extension(path)
    if not ext:
        return False
    bad_version = BAD_EXT_VERSION.get(ext.lower(), 0)
    return bad_version != 0 and bad_version <= version


def has_script_extension(path: str) -> bool:
    """Url::hasScriptExtension (Url.cpp:2174-2199): only 'js'."""
    return url_extension(path).lower() == "js"


def has_json_extension(path: str) -> bool:
    """Url::hasJsonExtension (Url.cpp:2146-2171): the guard rejects
    m_elen >= 4 before the case-4 'json' compare — always False."""
    return False


def is_domain_unwanted(host: str, domain: str, path: str) -> bool:
    """Url::isDomainUnwantedForIndexing (Url.cpp:1827-2036)."""
    if not domain:
        return True
    dlen = len(domain)
    if dlen == 4:
        return domain == "t.co"
    if dlen == 5:
        return domain in ("ow.ly", "tr.im")
    if dlen == 6:
        return domain in ("bit.ly", "goo.gl")
    if dlen == 8:
        if domain == "yimg.com":
            return True
        if domain == "imdb.com" and "/imdb/embed?" in path:
            return True
        return False
    if dlen == 9:
        return domain in ("ytimg.com", "atdmt.com")
    if dlen == 10:
        if domain == "tinyurl.cc":
            return True
        if domain == "tumblr.com" and path.startswith("/share"):
            return True
        if domain == "google.com":
            if host.startswith("plus.") and path.startswith("/share?"):
                return True
            if host.startswith("accounts."):
                return True
        return False
    if dlen == 11:
        if domain in ("tinyurl.com", "gstatic.com"):
            return True
        if (domain == "archive.org" and host.startswith("web.")
                and len(path) > 5 and path.startswith("/web/")):
            return True
        if domain == "twitter.com":
            if host.startswith("search."):
                return True
            if path.startswith("/share?"):
                return True
            if path.startswith(("/search?", "/intent/")):
                return True
        return False
    if dlen == 12:
        if domain in ("akamaihd.net", "vimeocdn.com"):
            return True
        if domain == "facebook.com" and path.startswith("/sharer/"):
            return True
        if domain == "linkedin.com" and path.startswith("/shareArticle"):
            return True
        return False
    if dlen == 13:
        if domain in ("akamaized.net", "disquscdn.com"):
            return True
        if domain == "pinterest.com" and path.startswith("/pin/create/"):
            return True
        return False
    if dlen == 14:
        return domain in ("googleapis.com", "netdna-cdn.com",
                          "cloudfront.net")
    if dlen == 15:
        if domain == "doubleclick.net" and host != domain:
            # subdomain present: only www. passes (Url.cpp:2010-2023)
            return host != "www." + domain
        return False
    if dlen == 16:
        return domain == "staticflickr.com"
    return False


def is_path_unwanted(path: str) -> bool:
    """Url::isPathUnwantedForIndexing (Url.cpp:2039-2103), with the
    reference's strict length guards (plen > N before an N+1-byte or
    N-byte compare) kept bit-exact."""
    plen = len(path)
    if plen <= 0:
        return False
    if plen > 8 and (path.startswith("/oembed?") or
                     path.startswith("/oembed/") or
                     path.startswith("/wp-json")):
        return True
    if plen > 9 and path.startswith("/wp-admin/"):
        return True
    if plen > 10 and (path.startswith("/xmlrpc.php") or
                      path.startswith("/wp-content") or
                      path.startswith("/wp-uploads")):
        return True
    if plen > 11 and path.startswith("/wp-includes"):
        return True
    if plen > 12 and path.startswith("/wp-login.php"):
        return True
    return False


def is_tld_privacore_blacklisted(tld: str) -> bool:
    """Url::isTLDInPrivacoreBlacklist (Url.cpp:2105-2115): 2-char TLDs
    only (m_tldLen > 2 -> false; the std::string(m_tld, 2) take means a
    1-char tld never matches either)."""
    if not tld or len(tld) > 2:
        return False
    return tld in PRIVACORE_BLACKLISTED_TLDS


def is_url_unwanted(host: str, domain: str, path: str,
                    version: int = TITLEREC_CURRENT_VERSION,
                    is_privacore: bool = False,
                    tld: str = "") -> bool:
    """The composite XmlDoc.cpp:15293-15310 frontier refusal (the
    hasXmlExtension arm is commented out in the reference — xml and rss
    feeds ARE spidered)."""
    if (has_non_indexable_extension(path, version)
            or has_script_extension(path)
            or has_json_extension(path)
            or is_domain_unwanted(host, domain, path)
            or is_path_unwanted(path)):
        return True
    if is_privacore and is_tld_privacore_blacklisted(tld):
        return True
    return False
