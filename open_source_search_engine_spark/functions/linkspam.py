"""Link-spam detection: the ``isLinkSpam()`` vote-suppression ladder.

Re-expresses ``linkspam.cpp`` (reference: linkspam.cpp:622-1175) — the
function Gigablast runs per (linker page, linkee URL) at link-info time to
decide whether an inlink may vote in the link graph (Linkdb.cpp:1388-1452
``m_isLinkSpam``; XmlDoc.cpp:17136 passes ``maxDocLen=150000``).  A spam
vote still *exists* in linkdb but is excluded from ``siteNumInlinks`` /
``m_goodInlinks`` aggregation.

The ladder, in reference order (first hit wins, note = reason string):

1.  same-host linker/linkee → never spam         (linkspam.cpp:640-648)
2.  ``.info`` / ``.biz`` TLD → spam              (linkspam.cpp:650-659)
3.  doc longer than 150 000 bytes → spam         (linkspam.cpp:663-667)
4.  "guestbook" in hostname (subdomain part <30 chars) → spam   (:669-680)
5.  CGI URL (has a query string) → spam          (linkspam.cpp:683)
6.  path-substring ladder (guest/cgi/gbook/board/…) → spam      (:692-741)
7.  stats-page <title> phrases ("web statistics for" …) → spam  (:751-778)
8.  content needles (s_needles1) with comment-section position
    semantics: a needle flagged ``is_section`` only counts when it
    occurs BEFORE the link's position in the page — a link above the
    comment section may vote (matches2.h:14-16, matches2.cpp:330-340);
    "open.thumbshots.org" needs 5 occurrences (:819-825)
9.  outlink-buffer needles (s_needles2: linksmanager, searchfeed…)(:827-852)
10. <form method=… action=*comment*|*/MT/*|*/mt/*> (minus
    ``/mt/mt-search``) → "post page"             (linkspam.cpp:864-908)
11. <textarea> + submit <input> (only when no section needle was seen
    after the link — ``hadPreMatch``) → "textarea tag"          (:910-913)
12. ``.edu`` / ``.gov`` linker → never spam (for the remaining rules only
    — needle/path hits above still fire)         (linkspam.cpp:918-919)
13. porn hostname (``Url::isSpam``, Url.cpp:1463-1556: adult needle in a
    host piece + speller word-split fails to find a clean reading) → spam
14. link-chain detection (no plain text around the link, ad tables,
    SERP ellipses) for linkers with <1000 site inlinks       (:1008-1175)

Everything is a pure function over one document's span array (the
interleaved text+media doc model), so the same kernel runs in the pytest
oracle and inside the Spark ``mapInPandas`` operator
(``graph/spamvotes.py``).  The URL-level subset (steps 2, 4, 5, 6) also
exists as a pure-Catalyst column expression for the SQL-oracle catalog
entry (``url_spam_note_col``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..training.adult import DEFAULT_NEEDLES as _ADULT_WEIGHTS
from .urlnorm import ParsedUrl, normalize_url

# Url::isSpam consults Lang.cpp's isAdult substring table
# (Lang.cpp:125-250), which is wider than AdultCheck's weighted needles —
# a representative subset, plus the positive AdultCheck words.
_ADULT_HOST_NEEDLES: frozenset[str] = frozenset(
    {n for n, w in _ADULT_WEIGHTS if w > 0} | {
        "upskirt", "downblouse", "shemale", "spank", "dildo", "bdsm",
        "voyeur", "fisting", "vibrator", "orgy", "orgasm", "masturbat",
        "stripper", "lolita", "softcore", "whore", "slut", "tits",
        "lesbian", "swinger", "bondage", "incest", "pedophil", "horny",
        "anal",   # the montanalinux case Url.cpp:1514-1517 documents
    })

MAX_DOC_LEN = 150_000          # XmlDoc.cpp:17143 hard-coded MAXDOCLEN
LINK_CHAIN_SNI_MAX = 1000      # linkspam.cpp:970 siteNumInlinks gate

# ---------------------------------------------------------------- tables
# linkspam.cpp:319-360 / 692-741 — first match wins, note names the hit.
# Matched case-insensitively against the URL path (no query; isCgi fired
# already).
PATH_NEEDLES: tuple[tuple[str, str], ...] = (
    ("guest", "path has guest"),
    ("cgi", "path has cgi"),
    ("gast", "path has gast"),
    ("gaest", "path has gaest"),
    ("gbook", "path has gbook"),
    ("akobook", "path has akobook"),
    ("/gb", "path has /gb"),
    ("msg", "path has msg"),
    ("messag", "path has messag"),
    ("board", "path has board"),
    ("coment", "path has coment"),
    ("comment", "path has comment"),
    ("linktrader", "path has linktrader"),
    ("tradelinks", "path has tradelinks"),
    ("trade-links", "path has trade-links"),
    ("linkexchange", "path has linkexchange"),
    ("link-exchange", "path has link-exchange"),
    ("reciprocal-link", "path has reciprocal-link"),
    ("reciprocallink", "path has reciprocallink"),
    ("/trackbacks/", "path has /trackbacks/"),
)

# linkspam.cpp:766-775 — <title> normalized to lowercase alnum, then
# substring-checked.
STATS_TITLE_PHRASES: tuple[str, ...] = (
    "webstatisticsfor", "webserverstatisticsfor", "usagestatisticsfor",
    "siteusageby", "surfstatsloganal", "webstarterhelpstats",
    "sitestatistics",
)

# s_needles1 (linkspam.cpp:24-237): (needle, need_count, is_section).
# is_section=1 → comment-section indicator, only counts BEFORE the link.
NEEDLES1: tuple[tuple[str, int, bool], ...] = (
    ("open.thumbshots.org", 5, False),
    ("[trackback", 1, True),
    ('class="comtext', 1, True),
    ('class="comment', 1, True),
    ('class="coment', 1, True),
    ('class="trackback', 1, True),
    ('class="ping', 1, True),
    ('class="followup', 1, True),
    ('class="response', 1, True),
    ('class="posted', 1, True),
    ('id="posted', 1, True),
    ('name="posted', 1, True),
    ('class="shoutbox', 1, True),
    ('id="comment', 1, True),
    ('id="coment', 1, True),
    ('id="trackback', 1, True),
    ('id="ping', 1, True),
    ('id="followup', 1, True),
    ('id="response', 1, True),
    ('name="comment', 1, True),
    ('name="coment', 1, True),
    ('name="trackback', 1, True),
    ('name="ping', 1, True),
    ('name="followup', 1, True),
    ('name="response', 1, True),
    ('div class="editsection', 1, True),
    ("action=edit", 1, True),
    ("anonymous user", 1, True),
    ("anonymer user", 1, True),
    ("date posted", 1, True),
    ("post your notice", 1, True),
    ("edit this page", 1, True),
    ("edit<a]br", 1, True),
    (">edit</a", 1, True),
    ("reply with quote", 1, False),
    (">post a reply", 1, False),
    ("post reply", 1, False),
    ("submit post", 1, False),
    (">post message", 1, False),
    (">post a comment", 1, False),
    (">leave a comment", 1, False),
    (">post comments", 1, False),
    ("comments: <", 1, True),
    ("comments:<", 1, True),
    ("reacties:", 1, True),
    ("comentarios:", 1, True),
    ("comentários:", 1, True),
    (">message:", 1, False),
    (">mensagem:", 1, False),
    (">faca seu comentario", 1, False),
    (">faça seu comentário", 1, False),
    (">kommentar hinzuf", 1, False),
    ("rate this link", 1, False),
    ("link submit", 1, False),
    ("links directory", 1, False),
    (">add my comment", 1, False),
    (">your comment", 1, False),
    ("your comment<", 1, False),
    (">comment by", 1, True),
    (">scrivi un commento", 1, False),
    (">scrivi il tuo commento", 1, False),
    ("add comment", 1, False),
    ("trackbacks for the art", 1, True),
    ("these trackbacks have been re", 1, True),
    ("trackback pings", 1, True),
    ("read the rest of this com", 1, True),
    ("das war die meinung von", 1, True),
    ("resource partner", 1, False),
    ("partner link", 1, False),
    ("partner site", 1, False),
    ("sign the guestbook", 1, False),
    ("2002 natali ardianto", 1, False),
    ("guestbook</title", 1, False),
    ("gastenboek</title", 1, False),
    ("search our links", 1, False),
    ("find all words option", 1, False),
    ("link you want to share", 1, False),
    ("link trader", 1, False),
    ("link exchange", 1, False),
    ("link partner", 1, False),
    ("link xchange", 1, False),
    ("link swap", 1, False),
    ("links trader", 1, False),
    ("links exchange", 1, False),
    ("links partner", 1, False),
    ("links xchange", 1, False),
    ("links swap", 1, False),
    ("list your site", 1, False),
    ("add your web site", 1, False),
    ("add your website", 1, False),
    ("add your site", 1, False),
    ("add your link", 1, False),
    ("add your url", 1, False),
    ("add site", 1, False),
    ("have your link", 1, False),
    ("add a web site", 1, False),
    ("add a website", 1, False),
    ("add a site", 1, False),
    ("add a link", 1, False),
    ("add a url", 1, False),
    ("adding your web site", 1, False),
    ("adding your website", 1, False),
    ("adding your site", 1, False),
    ("adding your link", 1, False),
    ("adding your url", 1, False),
    ("adding a web site", 1, False),
    ("adding a website", 1, False),
    ("adding a site", 1, False),
    ("adding a link", 1, False),
    ("adding a url", 1, False),
    ("add url", 1, False),
    ("add resource", 1, False),
    ("add link", 1, False),
    ("add free link", 1, False),
    ("addlink", 1, False),
    ("suggest a site", 1, False),
    ("swap links", 1, False),
    ("considered for addition", 1, False),
    ("we are not affiliated", 1, False),
    ("have a site to add", 1, False),
    ("submit your web site", 1, False),
    ("submit your website", 1, False),
    ("submit your site", 1, False),
    ("submit your link", 1, False),
    ("submit your url", 1, False),
    ("submit a web site", 1, False),
    ("submit a website", 1, False),
    ("submit a site", 1, False),
    ("submit a link", 1, False),
    ("submit link", 1, False),
    ("submit a url", 1, False),
    ("submit your article", 1, False),
    ("submit articles", 1, False),
    ("submit an article", 1, False),
    ("for any feedback contact", 1, False),
    ("for any feedback mail", 1, False),
    ("for any feedback email", 1, False),
    ("other articles that might", 1, False),
    ("is a freelance", 1, False),
    ("author is an amateur", 1, False),
    ("article source", 1, False),
    ("word count:", 1, False),
    ("for additional information on", 1, True),
    ("for more information on", 1, True),
    ("for further assistance visit", 1, True),
    ("article submitted on", 1, False),
    ("please rate this", 1, False),
    ("rate the article", 1, False),
    ("add rating", 1, False),
    ("trade text link", 1, False),
    ("trade link", 1, False),
    ("exchange link", 1, False),
    ("exchanging link", 1, False),
    ("reciprocal link", 1, False),
    (">sponsors<", 1, False),
    (">sponsor<", 1, False),
    (">sponsored<", 1, False),
    (">submit site<", 1, False),
    (": sponsor", 1, False),
    ("/sponsor/", 1, False),
    ("*sponsors*", 1, False),
    (">payperpost", 1, False),
    ("sponsored post", 1, False),
    ("sponsored flag", 1, False),
    ("sponsoredflag", 1, False),
    ("sponsored listing", 1, True),
    ("sponsored link", 1, True),
    ("post is sponsor", 1, False),
    ("paid post", 1, False),
    ("powered by", 1, False),
    ("suggest your website", 1, False),
    ("advertisement:", 1, True),
)

# s_needles2 (linkspam.cpp:238-252): checked against the concatenated
# outlink URL buffer, not the page text.
NEEDLES2: tuple[str, ...] = (
    "cyber-robotics.com", "cyberspacehq.com", "links4trade.com",
    "searchfeed.com", "marketnex.com", "partnersignup",
    "publisher-network", "linksmanager", "changinglinks",
)

# Url.cpp:1474-1476 / linkspam.cpp:918-919 — these TLDs are exempt from
# the adult-host and link-chain rules (but NOT from the needle ladder).
_EXEMPT_TLDS = ("edu", "gov")


# ------------------------------------------------------------ URL rules
def url_spam_note(p: ParsedUrl, content_len: int = 0,
                  max_doc_len: int = MAX_DOC_LEN) -> str | None:
    """Steps 2-6: the page-URL ladder (linkspam.cpp:650-741).  Returns
    the note of the first matching rule, or None."""
    if p.tld == "info":
        return ".info tld"
    if p.tld == "biz":
        return ".biz tld"
    if content_len > max_doc_len:
        return "doc too big"
    # "guestbook" in the subdomain part of the hostname (host minus the
    # registered domain), only when that prefix is <30 chars (:669-680)
    sub = p.host[: len(p.host) - len(p.domain)] if p.domain else ""
    if 0 < len(sub) < 30 and "guestbook" in sub:
        return "guestbook in hostname"
    if p.query:
        return "path is cgi"
    path = p.path.lower()
    if len(path) > 1:
        for needle, note in PATH_NEEDLES:
            if needle in path:
                return note
    return None


def url_spam_note_col(url: Column | str) -> Column:
    """Pure-Catalyst twin of :func:`url_spam_note` over an already-
    normalized URL column (scheme://host/path?query) — the production
    column expression for bulk frontier-side vote pre-filtering, and the
    cross-engine SQL-oracle surface.  Content-length is not a column
    concern, so the 'doc too big' rung is not part of this expression."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(u, r"^[a-z]+://([^/:?]+)", 1)
    # registered domain = last two labels (the fixture TLD space is flat;
    # the Python kernel owns the full public-suffix logic)
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    sub = F.substring(host, F.lit(1),
                      (F.length(host) - F.length(domain)).cast("int"))
    tld = F.regexp_extract(host, r"\.([^.]+)$", 1)
    path = F.lower(F.regexp_extract(u, r"^[a-z]+://[^/]+(/[^?]*)", 1))
    note = F.when(tld == "info", F.lit(".info tld")) \
            .when(tld == "biz", F.lit(".biz tld")) \
            .when((F.length(sub) > 0) & (F.length(sub) < 30)
                  & sub.contains("guestbook"),
                  F.lit("guestbook in hostname")) \
            .when(u.contains("?"), F.lit("path is cgi"))
    for needle, rule_note in PATH_NEEDLES:
        note = note.when((F.length(path) > 1) & path.contains(needle),
                         F.lit(rule_note))
    return note


# --------------------------------------------------------- porn hostname
def host_is_porn(p: ParsedUrl, dict_words: frozenset = frozenset()
                 ) -> bool:
    """Url::isSpam (Url.cpp:1463-1556): adult needle anywhere in a
    dot/hyphen piece of the hostname (TLD stripped) — unless the speller
    can split some piece into clean dictionary words (the montanalinux
    fixup).  edu/gov/4-hyphen rules included."""
    from ..search.speller import can_split_words
    if not p.domain:
        return False
    if p.tld[:3] in _EXEMPT_TLDS:
        return False
    s = p.host[: len(p.host) - len(p.tld) - 1] if p.tld else p.host
    if len(s) > 30 and s.count("-") >= 4:
        return True
    found_clean = False
    flagged = False
    for piece in re.split(r"[.-]", s):
        if not piece:
            continue
        if not any(n in piece for n in _ADULT_HOST_NEEDLES):
            continue
        flagged = True
        ok, is_porn, _ = can_split_words(piece, dict_words)
        if ok and is_porn:
            return True
        if ok:
            found_clean = True
    return flagged and not found_clean


# ------------------------------------------------------------ node model
# Lightweight Xml-node scan over the concatenated span text: tags and the
# text between them, with absolute char offsets (Xml.cpp node walk).
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>])*)>")
_HREF_ATTR_RE = re.compile(
    r"""\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE)
_ATTR_RE = re.compile(
    r"""([a-zA-Z][a-zA-Z0-9-]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""")
_ALPHA_RE = re.compile(r"[^\W\d_]")        # has_alpha_utf8


@dataclass
class Node:
    offset: int
    name: str                  # tag name lowercased, or "#text"
    is_back: bool
    attrs: str                 # raw attribute string ('' for text)
    text: str                  # text content ('' for tags)

    def attr(self, name: str) -> str | None:
        for m in _ATTR_RE.finditer(self.attrs):
            if m.group(1).lower() == name:
                return m.group(3) or m.group(4) or m.group(5) or ""
        return None


def scan_nodes(content: str) -> list[Node]:
    nodes: list[Node] = []
    pos = 0
    for m in _TAG_RE.finditer(content):
        if m.start() > pos:
            nodes.append(Node(pos, "#text", False, "",
                              content[pos:m.start()]))
        nodes.append(Node(m.start(), m.group(2).lower(),
                          m.group(1) == "/", m.group(3) or "", ""))
        pos = m.end()
    if pos < len(content):
        nodes.append(Node(pos, "#text", False, "", content[pos:]))
    return nodes


# ------------------------------------------------------- page-level scan
@dataclass
class PageScan:
    """Everything isLinkSpam derives from the page once, shared across
    all of the page's outlinks."""
    content: str
    content_lower: str
    nodes: list[Node]
    # positions per NEEDLES1 index (offsets into content_lower)
    needle1_pos: list[list[int]] = field(default_factory=list)
    title_note: str | None = None
    form_note: str | None = None
    needle2_note: str | None = None
    has_textarea_any: bool = False
    has_submit_any: bool = False


_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title", re.IGNORECASE | re.DOTALL)


def _title_stats_note(content: str) -> str | None:
    m = _TITLE_RE.search(content)
    if not m:
        return None
    norm = "".join(c.lower() for c in m.group(1) if c.isalnum())[:250]
    for phrase in STATS_TITLE_PHRASES:
        if phrase in norm:
            return "stats page"
    return None


def _form_post_note(nodes: list[Node]) -> str | None:
    """linkspam.cpp:864-908 — a <form> with a method AND an action whose
    value contains 'comment', '/MT/' or '/mt/' (unless '/mt/mt-search')."""
    for n in nodes:
        if n.name != "form" or n.is_back:
            continue
        if n.attr("method") is None:
            continue
        action = n.attr("action")
        if not action:
            continue
        hit = ("comment" in action or "/MT/" in action or "/mt/" in action)
        if hit and "/mt/mt-search" in action:
            hit = False
        if hit:
            return "post page"
    return None


def _needle_positions(haystack_lower: str,
                      needles: tuple) -> list[list[int]]:
    out = []
    for entry in needles:
        needle = entry[0] if isinstance(entry, tuple) else entry
        positions, start = [], 0
        while True:
            i = haystack_lower.find(needle, start)
            if i < 0:
                break
            positions.append(i)
            start = i + 1
        out.append(positions)
    return out


def scan_page(page_url: str, spans: list) -> PageScan:
    """One pass over the document shared by every outlink's verdict."""
    from .outlinks import _get
    ordered = sorted(spans, key=lambda s: _get(s, "offset"))
    content = "".join((_get(s, "text") or "") for s in ordered
                      if _get(s, "kind") != "media_ref")
    low = content.lower()
    nodes = scan_nodes(content)
    ps = PageScan(content=content, content_lower=low, nodes=nodes)
    ps.needle1_pos = _needle_positions(low, NEEDLES1)
    ps.title_note = _title_stats_note(content)
    ps.form_note = _form_post_note(nodes)
    for n in nodes:
        if n.is_back:
            continue
        if n.name == "textarea":
            ps.has_textarea_any = True
        elif n.name == "input" and "submit" in n.attrs.lower():
            ps.has_submit_any = True
    return ps


def _needle1_note(ps: PageScan, link_pos: int | None
                  ) -> tuple[str | None, bool]:
    """Evaluate s_needles1 counts for one link position.  Returns
    (note, had_pre_match): section-needle matches AFTER the link are
    skipped but flagged (matches2.cpp:330-340)."""
    had_pre = False
    for i, (needle, need, is_section) in enumerate(NEEDLES1):
        count = 0
        for pos in ps.needle1_pos[i]:
            if link_pos is not None and is_section and pos > link_pos:
                had_pre = True
                continue
            count += 1
        if count >= need:
            return needle, had_pre
    return None, had_pre


# ----------------------------------------------------------- link chains
def _is_link_chain(ps: PageScan, node_idx: int, linker: ParsedUrl,
                   linkee: ParsedUrl) -> tuple[bool, str | None]:
    """isLinkChain (linkspam.cpp:1093-1175): no plain text on either side
    of the link (within 1500/1580 chars and 90/95 nodes, stopping at
    <title>/<table>), ad tables, and SERP-ellipsis detection."""
    if linkee.domain and linkee.domain == linker.domain:
        return False, None
    nodes = ps.nodes
    link_pos = nodes[node_idx].offset
    left_text = right_text = False
    table_left = table_right = False

    # backward scan (linkspam.cpp:1016-1090)
    in_link = False
    for i in range(node_idx - 1, -1, -1):
        n = nodes[i]
        if link_pos - n.offset >= 1500 or node_idx - i >= 90:
            break
        if n.name == "title":
            break
        if n.name == "table":
            if not n.is_back:
                table_left = True
            break
        if not in_link and n.name == "#text":
            if "..." in n.text:
                return True, "search result right"
            if not left_text and _ALPHA_RE.search(n.text):
                left_text = True
            continue
        if n.name != "a":
            continue
        if n.is_back:
            in_link = True
            continue
        in_link = False
        href = n.attr("href")
        if href:
            u = normalize_url(href, strip_params=True,
                              strip_common_file=True)
            # different-domain neighbor ends the scan; same-domain links
            # keep it alive so ad tables with repeated links are found
            if u is None or u.domain != linkee.domain:
                break

    # forward scan (linkspam.cpp:1092-1160); we start inside our own <a>
    in_link = True
    for i in range(node_idx + 1, len(nodes)):
        n = nodes[i]
        if n.offset - link_pos >= 1580 or i - node_idx >= 95:
            break
        if n.name == "title":
            break
        if n.name == "table":
            if n.is_back:
                table_right = True
            break
        if not in_link and n.name == "#text":
            if "..." in n.text:
                return True, "search result right"
            if not right_text and _ALPHA_RE.search(n.text):
                right_text = True
            continue
        if n.name != "a":
            continue
        if n.is_back:
            in_link = False
            continue
        in_link = True
        href = n.attr("href")
        if href:
            u = normalize_url(href, strip_params=True,
                              strip_common_file=True)
            if u is None or u.domain != linkee.domain:
                break

    if table_left and table_right:
        return True, "ad table"
    if left_text and right_text:
        return False, None
    if not left_text and right_text:
        return True, "link chain left"
    if not right_text and left_text:
        return True, "link chain right"
    return True, "link chain middle"


def _link_chain_note(ps: PageScan, node_idx: int, linker: ParsedUrl,
                     linkee: ParsedUrl,
                     link_nodes: list[tuple[int, str]]) -> str | None:
    """The outer re-check loop (linkspam.cpp:995-1080): after a clean
    verdict at our node, any LATER link that is exactly the linkee's
    scheme://host root re-enters the chain check; the first chained
    occurrence condemns the vote."""
    chained, note = _is_link_chain(ps, node_idx, linker, linkee)
    if chained:
        return note
    root = f"{linkee.scheme}://{linkee.host}"
    for idx, url in link_nodes:
        if idx <= node_idx:
            continue
        # linkLen > uulen is skipped in the reference (:1071) — only the
        # bare root URL re-enters
        if url.rstrip("/") == root:
            chained, note = _is_link_chain(ps, idx, linker, linkee)
            if chained:
                return note
    return None


# ------------------------------------------------------------ main entry
def link_spam_votes(page_url: str, spans: list,
                    site_num_inlinks: int = 0,
                    max_doc_len: int = MAX_DOC_LEN,
                    dict_words: frozenset = frozenset()) -> list[dict]:
    """Per-outlink vote verdicts for one linker page.

    Returns one dict per harvested link-tag outlink (in document order):
    ``{url_norm, linkee_host, is_spam, note}``.  Mirrors
    XmlDoc.cpp:17136's per-linkee isLinkSpam call over every outlink the
    page casts."""
    linker = normalize_url(page_url, strip_params=True,
                           strip_common_file=True)
    if linker is None:
        return []
    ps = scan_page(page_url, spans)

    # collect link nodes in document order with resolved targets
    from .outlinks import _document_base, resolve_href, _get
    import html as _html
    ordered = sorted(spans, key=lambda s: _get(s, "offset"))
    base = _document_base(ordered, linker)
    link_nodes: list[tuple[int, str]] = []   # (node_idx, resolved url)
    for idx, n in enumerate(ps.nodes):
        if n.name not in ("a", "link", "area") or n.is_back:
            continue
        hm = _HREF_ATTR_RE.search(n.attrs)
        if not hm:
            continue
        href = _html.unescape(hm.group(2) or hm.group(3) or hm.group(4)
                              or "").strip()
        resolved = resolve_href(href, base)
        if resolved is None:
            continue
        link_nodes.append((idx, resolved))

    # page-level rungs shared by every link (steps 2-11)
    page_note = url_spam_note(linker, len(ps.content), max_doc_len)
    if page_note is None:
        page_note = ps.title_note
    exempt_tld = linker.tld[:3] in _EXEMPT_TLDS
    porn_host = (not exempt_tld) and host_is_porn(linker, dict_words)
    sni_gated = site_num_inlinks < LINK_CHAIN_SNI_MAX
    linkbuf = "".join(u for _, u in link_nodes).lower()
    needle2_note = next((n for n in NEEDLES2 if n in linkbuf), None)

    out: list[dict] = []
    for node_idx, url in link_nodes:
        linkee = normalize_url(url, strip_params=True,
                               strip_common_file=True)
        if linkee is None:
            continue
        row = {"url_norm": linkee.url, "linkee_host": linkee.host,
               "is_spam": False, "note": None}
        out.append(row)
        # 1. same-host linker/linkee never spam (linkspam.cpp:640-648)
        if linkee.host == linker.host:
            continue
        if page_note is not None:
            row.update(is_spam=True, note=page_note)
            continue
        # 8. content needles with per-link section gating
        link_pos = ps.nodes[node_idx].offset
        n1_note, had_pre = _needle1_note(ps, link_pos)
        if n1_note is not None:
            row.update(is_spam=True, note=n1_note)
            continue
        # 9. outlink-buffer needles
        if needle2_note is not None:
            row.update(is_spam=True, note=needle2_note)
            continue
        # 10. comment-post form
        if ps.form_note is not None:
            row.update(is_spam=True, note=ps.form_note)
            continue
        # 11. textarea+submit — only when no section needle was skipped
        # after our link (hadPreMatch gate, linkspam.cpp:873-886)
        if not had_pre and ps.has_textarea_any and ps.has_submit_any:
            row.update(is_spam=True, note="textarea tag")
            continue
        # 12. edu/gov exempt from the remaining rungs
        if exempt_tld:
            continue
        # 13. porn hostname
        if porn_host:
            row.update(is_spam=True, note="linker is porn")
            continue
        # 14. link chains
        if sni_gated:
            chain = _link_chain_note(ps, node_idx, linker, linkee,
                                     link_nodes)
            if chain is not None:
                row.update(is_spam=True, note=chain)
    return out
