"""Deterministic synthetic crawl corpus (FIXTURES.md schemas).

Everything derives from one integer seed via ``random.Random`` — no wall
clock, no external data.  The generator produces plain-Python row lists so
the single-process oracle consumes them directly, plus writers to parquet
(pyarrow) for the Spark pipeline.

Shape requirements (FIXTURES.md):
- interleaved text+media spans, 2-8 per doc, strictly increasing offsets
- >=10% of docs with zero outlinks
- one mega-host family owning ~30% of the URL universe (skew path)
- robots corpus: none / disallow-all / crawl-delay-30 / crawl-delay-0.5 /
  UA-specific group / wildcard+anchor rules
- normalization-trap seeds (uppercase scheme/host, :80, #fragment vs #!,
  double scheme, session-id params)
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass, field

from .functions.ghash import hash32_bytes
from .functions.urlnorm import normalize_url

BASE_TIME_S = 1_700_000_000  # fixed epoch base for added_time


def _domain_ip(domain: str) -> int:
    """Deterministic firstIp for a registered domain — all its subdomains
    share it (reference 'firstip' tag semantics, Spider.h:142-152)."""
    h = int(hash32_bytes([domain.encode()])[0])
    return 0x0A000000 + (h % 0x00FFFFFF)


ROBOTS_SHAPES = [
    # (name, robots_txt) — shapes per FIXTURES.md §2
    ("none", ""),
    ("allow_all", "User-agent: *\nDisallow:\n"),
    ("disallow_all", "User-agent: *\nDisallow: /\n"),
    ("crawl_delay_30", "User-agent: *\nCrawl-delay: 30\nDisallow: /private/\n"),
    ("crawl_delay_half", "User-agent: *\nCrawl-delay: 0.5\n"),
    (
        "ua_specific",
        "User-agent: *\nDisallow: /\nCrawl-delay: 10\n\n"
        "User-agent: GigablastOpenSource\nDisallow: /blocked/\nCrawl-delay: 2\n",
    ),
    (
        "wildcard_anchor",
        "User-agent: *\nDisallow: /dir3/*\nDisallow: /*.cgi$\n"
        "Allow: /dir3/open/\n",
    ),
    (
        "precedence",
        "User-agent: *\nAllow: /dir1/deep/\nDisallow: /dir1/\n",
    ),
]


@dataclass
class Corpus:
    seed: int
    urls: list[str]                      # normalized URL universe
    docs: list[dict]                     # {doc_id, spans:[{kind,text,media_ref,offset}]}
    hosts: list[dict]                    # {host, first_ip, robots_txt}
    seeds: list[dict]                    # {url, added_time}
    existing: set[str] = field(default_factory=set)   # URLs that 200
    tmp_error: set[str] = field(default_factory=set)  # URLs that tmp-fail
    throttled: set[str] = field(default_factory=set)  # URLs whose server
                                         # answers 503 (ban indicator,
                                         # Msg13.cpp ipWasBanned) — marks
                                         # the IP "twitchy"
    injects: list[dict] = field(default_factory=list) # {url, added_time}:
                                         # pages reachable ONLY by injection
                                         # (PageInject.cpp analogue)
    redirects: dict[str, str] = field(default_factory=dict)  # url -> target
                                         # (301 followed with hopCount
                                         # unchanged, XmlDoc.cpp:15371-15385)
    content_key: dict[str, str] = field(default_factory=dict)  # url ->
                                         # canonical url whose spans it
                                         # mirrors (exact-content identity
                                         # for EDOCDUP); absent = unique


def generate_corpus(
    seed: int = 42,
    n_domains: int = 12,
    n_urls: int = 600,
    docs_share: float = 0.85,
    mega_share: float = 0.30,
) -> Corpus:
    rng = random.Random(seed)

    # --- domain universe -------------------------------------------------
    plain = [f"a{i}.example" for i in range(max(1, n_domains - 2))]
    domains = ["mega.example", "shop.co.uk", "twodelay.example", *plain]
    robots_by_domain: dict[str, str] = {}
    for i, d in enumerate(domains):
        robots_by_domain[d] = ROBOTS_SHAPES[i % len(ROBOTS_SHAPES)][1]
    # make the mega host benign (it must actually crawl to exercise skew)
    robots_by_domain["mega.example"] = "User-agent: *\nCrawl-delay: 0.25\n"

    # F20 fixture: two hosts of ONE domain advertising different
    # Crawl-delays — first-write-wins (SpiderColl.cpp:699-732) keeps the
    # first-fetched host's delay; a max()-style aggregate diverges here
    robots_by_host = {
        "www.twodelay.example": "User-agent: *\nCrawl-delay: 1\n",
        "alt.twodelay.example": "User-agent: *\nCrawl-delay: 5\n",
    }

    # hosts: www.<dom> for all; mega gets extra subdomains sharing its ip
    hosts: list[dict] = []
    host_of_domain: dict[str, list[str]] = {}
    for d in domains:
        hs = [f"www.{d}"]
        if d == "mega.example":
            hs += [f"sub{j}.mega.example" for j in range(4)]
        if d == "twodelay.example":
            hs += ["alt.twodelay.example"]
        host_of_domain[d] = hs
        ip = _domain_ip(d)
        # tagdb tags (Tagdb.cpp; consulted by tag: rule atoms): the mega
        # domain is an 'authority' site, the shop a 'commerce' site
        tags = (["authority"] if d == "mega.example"
                else ["commerce"] if d == "shop.co.uk" else [])
        for h in hs:
            hosts.append({"host": h, "first_ip": ip,
                          "robots_txt": robots_by_host.get(
                              h, robots_by_domain[d]),
                          "tags": tags,
                          "robots_txt_after": None,
                          "robots_change_at_s": None})

    # F19 fixture: one domain REWRITES its robots.txt 12 h into the crawl
    # (new Crawl-delay + a fresh Disallow).  The crawler only sees it at
    # the next 24 h TTL refresh (Msg13.cpp:477-484) — crawls whose clock
    # never crosses the TTL are unaffected.
    for h in hosts:
        if h["host"] == "www.a1.example":
            h["robots_txt_after"] = ("User-agent: *\nCrawl-delay: 4\n"
                                     "Disallow: /dir3/\n")
            h["robots_change_at_s"] = BASE_TIME_S + 12 * 3600

    # --- URL universe ----------------------------------------------------
    n_mega = int(n_urls * mega_share)
    urls: list[str] = []
    mega_hosts = host_of_domain["mega.example"]
    for k in range(n_mega):
        h = mega_hosts[k % len(mega_hosts)]
        urls.append(f"http://{h}/dir{k % 7}/p{k}.html")
    other_domains = [d for d in domains if d != "mega.example"]
    for k in range(n_urls - n_mega):
        d = other_domains[k % len(other_domains)]
        # twodelay rotates across its two hosts so both get fetched and
        # expose the F20 first-write-wins semantics
        hs = host_of_domain[d]
        h = hs[(k // len(other_domains)) % len(hs)] \
            if d == "twodelay.example" else hs[0]
        if k % 11 == 0:
            urls.append(f"http://{h}/p{k}.html?id={k}&x=1")
        elif k % 13 == 0:
            urls.append(f"http://{h}/dir3/p{k}.html")   # robots-blocked on some
        elif k % 17 == 0:
            urls.append(f"http://{h}/dir1/p{k}.html")   # precedence shape
        else:
            urls.append(f"http://{h}/dir{k % 5}/p{k}.html")
    # roots
    roots = [f"http://{host_of_domain[d][0]}/" for d in domains]
    urls = roots + urls
    # all universe URLs are already normal-form; verify in debug runs
    urls = [u for u in urls if normalize_url(u) is not None]

    # --- page existence & fetch outcomes ---------------------------------
    existing: set[str] = set(roots)
    tmp_error: set[str] = set()
    redirect_srcs: list[str] = []
    for u in urls:
        if u in existing:
            continue
        r = rng.random()
        if r < docs_share:
            existing.add(u)
        elif r < docs_share + 0.05:
            tmp_error.add(u)           # retryable fetch errors
        elif r < docs_share + 0.08:
            redirect_srcs.append(u)    # 301s to a real page (hop unchanged)
    if not redirect_srcs:
        # guarantee coverage on tiny corpora: promote two deterministic
        # missing URLs so every fixture exercises the redirect path
        redirect_srcs = [u for u in urls if u not in existing
                         and u not in tmp_error][:2]
    redirects: dict[str, str] = {}
    ex_sorted = sorted(existing)
    for u in redirect_srcs:
        redirects[u] = rng.choice(ex_sorted)
    # a deterministic (rng-stream-free) slice of the retryable errors is
    # "throttled": the server answers 503 — a ban indicator
    # (Msg13.cpp:990-1008) that marks its IP twitchy.  Carved out of the
    # already-drawn tmp_error set so every other outcome is unchanged.
    throttled = {u for u in tmp_error if zlib.crc32(u.encode()) % 3 == 0}
    tmp_error -= throttled

    # --- docs with interleaved spans -------------------------------------
    docs: list[dict] = []
    url_list = list(urls)
    for u in sorted(existing):
        n_spans = rng.randint(2, 8)
        zero_links = rng.random() < 0.12
        spans = []
        for off in range(n_spans):
            if off % 2 == 1 and rng.random() < 0.5:
                # media span
                tgt = rng.choice(url_list)
                ref = tgt.rsplit(".", 1)[0] + f"_{off}.jpg"
                spans.append({"kind": "media_ref", "text": None,
                              "media_ref": ref, "offset": off})
                continue
            frags = []
            if not zero_links:
                for _ in range(rng.randint(0, 4)):
                    tgt = rng.choice(url_list)
                    style = rng.random()
                    if style < 0.15:
                        # relative form of a same-host link
                        pu = normalize_url(u)
                        tu = normalize_url(tgt)
                        if pu and tu and pu.host == tu.host:
                            href = tu.path_with_cgi
                        else:
                            href = tgt
                    elif style < 0.25:
                        href = tgt + "#section2"          # fragment trap
                    elif style < 0.30:
                        href = tgt.replace("http://", "HTTP://", 1)
                    else:
                        href = tgt
                    if "&" in href and rng.random() < 0.5:
                        # real HTML writes &amp; inside attribute values —
                        # extraction must entity-decode (Entities.cpp)
                        href = href.replace("&", "&amp;")
                    rel = ' rel="nofollow"' if rng.random() < 0.08 else ""
                    tag = rng.choice(["a", "a", "a", "link", "area"])
                    frags.append(f'<{tag} href="{href}"{rel}>x</{tag}>')
            filler = " ".join(rng.choice(["lorem", "ipsum", "data", "web",
                                          "page", "crawl"])
                              for _ in range(rng.randint(3, 12)))
            # deterministic (rng-stream-free) <base href> coverage:
            # ~1/12 of pages carry a valid base that retargets their
            # relative links (XmlDoc::getBaseUrl), another ~1/12 carry
            # the invalid <base href="/"> real pages emit (fallback path)
            base_extra = ""
            if not zero_links and off == 0:
                c = zlib.crc32(u.encode())
                pu = normalize_url(u)
                if c % 12 == 5 and pu:
                    base_extra = (
                        f'<base href="http://{pu.host}/basedir/">'
                        f'<a href="deep{c % 7}.html">b</a> ')
                elif c % 12 == 7:
                    base_extra = (f'<base href="/">'
                                  f'<a href="near{c % 5}.html">b</a> ')
            spans.append({"kind": "text",
                          "text": base_extra + filler + " "
                          + " ".join(frags),
                          "media_ref": None, "offset": off})
        docs.append({"doc_id": u, "spans": spans})

    # --- sitemap.xml coverage (rng-stream-free, like the <base href>
    # fixture): two deterministic domains publish a real sitemap whose
    # <loc> entries point at existing pages (one wrapped in CDATA), and
    # the domain root links to it with <link href=...>.  Exercises the
    # Linkdb.cpp:3651-3721 TAG_LOC/text-content harvest path and the
    # fact that .xml outlinks are spiderable (XmlDoc.cpp:15297's
    # commented-out hasXmlExtension) end to end.
    docs_by_id = {d["doc_id"]: d for d in docs}
    sm_domains = sorted(d for d in domains
                        if zlib.crc32(d.encode()) % 3 == 1)[:2]
    if not sm_domains:
        sm_domains = [domains[0]]
    for d in sm_domains:
        h = host_of_domain[d][0]
        sm_url = f"http://{h}/sitemap.xml"
        targets = sorted(u for u in existing
                         if u.startswith(f"http://{h}/"))[:5]
        locs = []
        for i, tu in enumerate(targets):
            if i == 0:
                locs.append(f"<loc><![CDATA[{tu}]]></loc>")
            else:
                locs.append(f"<loc>{tu}</loc>")
        docs.append({"doc_id": sm_url,
                     "spans": [{"kind": "text", "text": "".join(locs),
                                "media_ref": None, "offset": 0}]})
        existing.add(sm_url)
        urls.append(sm_url)
        root_doc = docs_by_id.get(f"http://{h}/")
        if root_doc is not None:
            root_doc["spans"].append(
                {"kind": "text", "text": f'<link href="{sm_url}">',
                 "media_ref": None,
                 "offset": len(root_doc["spans"])})

    # --- seeds (with normalization traps, FIXTURES §3) --------------------
    seeds: list[dict] = []
    t = BASE_TIME_S
    for d in domains:
        seeds.append({"url": f"http://www.{d}/", "added_time": t})
    # traps: all normalize to existing roots
    seeds += [
        {"url": "HTTP://WWW.MEGA.EXAMPLE:80/", "added_time": t},
        {"url": "http://http://www.a0.example/", "added_time": t},
        {"url": "http://www.a1.example/#fragment", "added_time": t},
        {"url": "  http://www.a2.example/./sub/../", "added_time": t},
        {"url": "http://www.a3.example/?PHPSESSID=abcdef123456789", "added_time": t},
    ]

    # --- injected pages (PageInject analogue): real content pages on known
    # hosts that NO page links to — only the injection path can crawl them
    injects: list[dict] = []
    for j in range(4):
        d = other_domains[j % len(other_domains)]
        u = f"http://{host_of_domain[d][0]}/injected/only{j}.html"
        injects.append({"url": u, "added_time": t})
        existing.add(u)
        spans = [{"kind": "text",
                  "text": f"injected page {j} content "
                          f'<a href="{rng.choice(urls)}">x</a>',
                  "media_ref": None, "offset": 0}]
        docs.append({"doc_id": u, "spans": spans})
        urls.append(u)

    return Corpus(seed=seed, urls=urls, docs=docs, hosts=hosts, seeds=seeds,
                  existing=existing, tmp_error=tmp_error, injects=injects,
                  redirects=redirects, throttled=throttled)


def add_mirror(corpus: Corpus, canonical: str, mirror: str) -> None:
    """EDOCDUP fixture surgery: make ``mirror`` an exact-content copy of
    ``canonical`` — identical spans AND a shared content identity
    (``content_key``), so the dup check (XmlDoc::getIsDup) keys on a
    declared identity that genuinely corresponds to identical bytes.
    Both must be existing pages; volatile URLs are refused because their
    content hash versions with the clock and could never stay a
    byte-identical mirror."""
    from .config import VOLATILE_MOD
    from .functions.ghash import uh48 as _uh48_of
    docs_by_id = {d["doc_id"]: d for d in corpus.docs}
    if canonical not in corpus.existing or mirror not in corpus.existing:
        raise ValueError("mirror pair must both be existing pages")
    if any(_uh48_of(u) % VOLATILE_MOD == 0 for u in (canonical, mirror)):
        raise ValueError("volatile pages cannot be mirrored")
    docs_by_id[mirror]["spans"] = [
        dict(sp) for sp in docs_by_id[canonical]["spans"]]
    corpus.content_key[mirror] = canonical


# the exact tag hasNoIndexMetaTag looks for (XmlDoc.cpp:11067-11084:
# getMetaContent("noindex") first char '1')
NOINDEX_META = "<meta name=noindex content=1>"


def add_noindex(corpus: Corpus, url: str) -> None:
    """Meta-noindex fixture surgery (XmlDoc.cpp:13240-13267): plant
    ``<meta name=noindex content=1>`` into the page — the reference then
    turns off posdb/titledb/linkdb for the doc but STILL adds the
    spider requests for its outlinks."""
    docs_by_id = {d["doc_id"]: d for d in corpus.docs}
    if url not in corpus.existing:
        raise ValueError("noindex page must be an existing page")
    spans = docs_by_id[url]["spans"]
    for sp in spans:
        if sp["kind"] == "text":
            sp["text"] = NOINDEX_META + " " + (sp["text"] or "")
            return
    raise ValueError("page has no text span")   # off=0 is always text


# ---------------------------------------------------------------------------
# parquet writers (pyarrow — usable without a SparkSession)
# ---------------------------------------------------------------------------

def write_parquet(corpus: Corpus, out_dir: str) -> None:
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    span_t = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ])
    docs_t = pa.schema([("doc_id", pa.string()),
                        ("spans", pa.list_(span_t))])
    pq.write_table(
        pa.Table.from_pylist(corpus.docs, schema=docs_t),
        os.path.join(out_dir, "docs.parquet"))
    pq.write_table(
        pa.Table.from_pylist(corpus.hosts, schema=pa.schema(
            [("host", pa.string()), ("first_ip", pa.int64()),
             ("robots_txt", pa.string()),
             ("tags", pa.list_(pa.string())),
             ("robots_txt_after", pa.string()),
             ("robots_change_at_s", pa.int64())])),
        os.path.join(out_dir, "hosts.parquet"))
    pq.write_table(
        pa.Table.from_pylist(corpus.seeds, schema=pa.schema(
            [("url", pa.string()), ("added_time", pa.int64())])),
        os.path.join(out_dir, "seeds.parquet"))
    pq.write_table(
        pa.Table.from_pylist(corpus.injects, schema=pa.schema(
            [("url", pa.string()), ("added_time", pa.int64())])),
        os.path.join(out_dir, "injects.parquet"))
    pq.write_table(
        pa.Table.from_pylist(
            [{"url": u,
              "outcome": ("ok" if u in corpus.existing
                          else "tmp" if u in corpus.tmp_error
                          else "throttled" if u in corpus.throttled
                          else "redirect" if u in corpus.redirects
                          else "missing"),
              "redirect_to": corpus.redirects.get(u),
              "content_key": corpus.content_key.get(u, u)}
             for u in corpus.urls],
            schema=pa.schema([("url", pa.string()), ("outcome", pa.string()),
                              ("redirect_to", pa.string()),
                              ("content_key", pa.string())])),
        os.path.join(out_dir, "outcomes.parquet"))
