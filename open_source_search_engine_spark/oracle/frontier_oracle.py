"""Single-process reference-faithful crawl oracle.

Implements the spider scheduling semantics (F5-F16, F20-F25) with plain
dicts, producing the golden ``crawl_order`` / ``url_seen`` / ``host_final``
outputs (FIXTURES.md §6) that the Spark pipeline must match exactly.

Parity is defined at the **round boundary** (SURVEY.md §7 "hard parts"):
the reference's logical winner order — priority desc, hopCount asc,
eligible-time asc, uh48 asc per IP (``Spider.cpp:991-1013``,
``SpiderColl.cpp:3185-3232``) — with politeness-respecting ``fetch_at``
spacing within an IP (``SpiderColl.cpp:4112-4126``, ``Msg13.cpp:2069-2072``).
Physical-race orderings (512 KB list boundaries, winner-cache TTLs, 50 ms
timer interleaving) are NOT part of the spec.

Semantics summary (each rule mirrored in ``pipeline/crawl.py`` /
``pipeline/filters.py``):

- request supplant on same uh48 keeps min hopCount, then min discoveryTime,
  then min parent uh48 (``SpiderColl.cpp:3125-3164``, merge keep-rule
  ``Spider.cpp:3883-3922``)
- only the latest reply per uh48 survives (``Spider.cpp:664-667``)
- eligible time = max(addedTime, ipLastDownloadEnd + sameIpWait[ufn],
  ipLastDownloadEnd + min(crawlDelay(dom), 60s), lastSpideredTime +
  spiderFreq[ufn]) (``SpiderColl.cpp:4083-4180``)
- crawl-delay learned from replies, first write per domain wins
  (``SpiderColl.cpp:699-732``); politeness spacing inside a wave uses
  max(sameIpWait, robots crawl-delay) like the hammer queue
  (``Msg13.cpp:2069-2107``)
- per-IP top-K winners, K = spiderIpMaxSpiders of the IP's best candidate
  (``SpiderLoop.cpp:1015-1072``), bounded by MAX_WINNER_NODES
- global wave cap MAX_SPIDERS (``SpiderLoop.h:30``), best-first
- robots-disallowed URLs never enter a wave; force-deleted rules filter
  their URLs out every round (annihilation fixpoint)
- empty wave + future-eligible candidates → clock jumps to the min future
  time (waiting-tree re-time, ``SpiderColl.cpp:3447-3487``); empty wave and
  nothing within the horizon → crawl complete (``SpiderLoop.cpp:2107-2136``)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..config import (AUTO_BACKOFF_DELAY_MS, BANNED_HTTP_STATUSES,
                      ERR_DOC_DUP, HORIZON_MS, ROBOTS_TTL_S, VERSION_MIX,
                      VERSION_PERIOD_S, VOLATILE_MOD, CrawlConfig,
                      TMP_ERROR_CODES, site_rank_of)
from ..corpus import Corpus, _domain_ip
from ..functions.ghash import hash32_bytes, uh48 as uh48_of
from ..functions.outlinks import extract_outlinks
from ..functions.robots import parse_robots
from ..functions.urlfilters import eval_atoms, parse_expression
from ..functions.urlnorm import domain_of_host, normalize_url

ERR_TMP = 32769          # retryable (in TMP_ERROR_CODES)
ERR_NOT_FOUND = 32780    # permanent


@dataclass
class OracleResult:
    crawl_order: list[dict] = field(default_factory=list)
    url_seen: list[dict] = field(default_factory=list)
    host_final: list[dict] = field(default_factory=list)
    rounds: int = 0
    replies: dict[int, dict] = field(default_factory=dict)  # final latest
                                    # reply per uh48 (spiderdb state)


def _h32(s: str) -> int:
    return int(hash32_bytes([s.encode()])[0])


def run_oracle(corpus: Corpus, cfg: CrawlConfig | None = None) -> OracleResult:
    cfg = cfg or CrawlConfig()
    rules = cfg.url_filters
    parsed_rules = [parse_expression(r.expression) for r in rules]

    host_ip = {h["host"]: h["first_ip"] for h in corpus.hosts}

    # F19: the robots CACHE — bodies effective at the last compile clock;
    # a host's (robots_txt_after, robots_change_at_s) rewrite is only seen
    # when the crawl clock crosses the 24 h TTL (Msg13.cpp:477-484)
    def _effective_robots(now_s: int) -> dict[str, str]:
        cur: dict[str, str] = {}
        for h in corpus.hosts:
            txt = h["robots_txt"] or ""
            after = h.get("robots_txt_after")
            at = h.get("robots_change_at_s")
            if after is not None and at is not None and at <= now_s:
                txt = after
            cur[h["host"]] = txt
        return cur

    host_robots = _effective_robots(cfg.wave_start_ms // 1000)
    robots_cached_at_ms: int | None = None
    host_tags = {h["host"]: tuple(h.get("tags") or ()) for h in corpus.hosts}
    # domains whose tagdb site carries 'authority' — feeds
    # hasauthorityinlink (Spider.cpp m_hasAuthorityInlink via Linkdb+Tagdb)
    auth_domains = {domain_of_host(h["host"]) for h in corpus.hosts
                    if "authority" in (h.get("tags") or ())} - {""}
    # seed site list → registered-domain table (Spider.cpp:1631-1750
    # updateSiteListBuf / m_siteListDomTable); empty list matches all
    site_list_domains: set[str] = set()
    for s in corpus.seeds:
        p = normalize_url(s["url"], strip_params=True,
                          strip_common_file=True)
        if p is not None and p.domain:
            site_list_domains.add(p.domain)
    robots_cache: dict[str, object] = {}

    def robots_of(host: str):
        txt = host_robots.get(host, "")
        c = robots_cache.get(txt)
        if c is None:
            c = parse_robots(txt, cfg.user_agent)
            robots_cache[txt] = c
        return c

    docs_by_url = {d["doc_id"]: d for d in corpus.docs}

    # --- state ------------------------------------------------------------
    requests: dict[int, dict] = {}     # uh48 -> best request
    replies: dict[int, dict] = {}      # uh48 -> latest reply
    ip_last_end: dict[int, int] = {}   # firstIp -> last download end ms
    ip_delay_used: dict[int, int] = {} # firstIp -> last politeness delay ms
    cd_table: dict[str, int] = {}      # domain -> crawl delay ms (first wins)
    twitchy_ips: set[int] = set()      # IPs with a ban-indicating reply
                                       # (Msg13.cpp twitchyTable); consumed
                                       # at NEXT round's fetch spacing —
                                       # the batch round is the commit unit
    first_seen: dict[int, tuple[str, int]] = {}
    inlink_cblocks: dict[int, set] = {}  # uh48 -> parent-IP /24 blocks (F29)
    auth_inlink: set[int] = set()        # uh48s linked from authority sites

    def add_request(url_norm: str, hop: int, added_s: int, disc_s: int,
                    parent: int | None, is_add_url: bool, round_no: int,
                    parent_domain: str | None = None,
                    is_injecting: bool = False) -> None:
        p = normalize_url(url_norm)   # already normal; re-parse for fields
        if p is None:
            return
        u = uh48_of(p.url)
        ip = host_ip.get(p.host)
        if ip is None:
            ip = _domain_ip(p.domain or p.host)
        if hop == 0 or p.path_with_cgi == "/":
            hop = 0  # site roots are hop 0 (XmlDoc.cpp:15371-15385)
        if u not in first_seen:
            first_seen[u] = (p.url, round_no)
        if parent_domain:
            # F29: distinct linking-parent /24 C-blocks per target
            # (SpiderColl.cpp:2701-2742; parent ip via the firstip map)
            inlink_cblocks.setdefault(u, set()).add(
                _domain_ip(parent_domain) >> 8)
            if parent_domain in auth_domains:
                auth_inlink.add(u)
        cur = requests.get(u)
        cand = {
            "uh48": u, "url": p.url, "host": p.host, "domain": p.domain,
            "tld": p.tld, "path_cgi": p.path_with_cgi, "first_ip": ip,
            "hop_count": min(hop, 65535), "added_time": added_s,
            "discovery_time": disc_s,
            "parent_uh48": parent if parent is not None else -1,
            "parent_domain": parent_domain,
            "is_add_url": is_add_url, "is_injecting": is_injecting,
            "is_www": p.host.startswith("www."),
        }
        if cur is None:
            requests[u] = cand
            return
        # supplant keep-rule: min hop, then min discovery, then min parent
        key_new = (cand["hop_count"], cand["discovery_time"], cand["parent_uh48"])
        key_old = (cur["hop_count"], cur["discovery_time"], cur["parent_uh48"])
        if key_new < key_old:
            requests[u] = cand

    # --- seed ingest (round 0 frontier) -----------------------------------
    for s in corpus.seeds:
        p = normalize_url(s["url"], strip_params=True, strip_common_file=True)
        if p is None:
            continue
        add_request(p.url, 0, s["added_time"], s["added_time"], None,
                    is_add_url=True, round_no=0)
    # injection ingest (PageInject.cpp analogue: content-supplied pages,
    # m_isInjecting=1, hop 0 — Spider.cpp:4286-4360 add-url vs inject flags)
    for s in corpus.injects:
        p = normalize_url(s["url"], strip_params=True, strip_common_file=True)
        if p is None:
            continue
        add_request(p.url, 0, s["added_time"], s["added_time"], None,
                    is_add_url=False, round_no=0, is_injecting=True)

    out = OracleResult()
    wave_start = cfg.wave_start_ms

    for round_no in range(cfg.max_rounds):
        now_s = wave_start // 1000
        # F19 TTL refresh — mirrors CrawlRunner._maybe_refresh_robots
        if robots_cached_at_ms is None:
            robots_cached_at_ms = wave_start
        elif wave_start - robots_cached_at_ms > ROBOTS_TTL_S * 1000:
            host_robots = _effective_robots(now_s)
            robots_cached_at_ms = wave_start
        # sniTable (SpiderColl.cpp:580-610): distinct external linking
        # domains per host over the deduped frontier, capped 255
        site_inlinks: dict[str, set] = {}
        for req in requests.values():
            pd_ = req.get("parent_domain")
            if pd_ and pd_ != req["domain"]:
                site_inlinks.setdefault(req["host"], set()).add(pd_)
        # F28 quota counts: distinct indexed uh48 per SITE (SiteGetter
        # definition) / domain (SpiderColl.cpp:2754-2798 m_siteHash32)
        from ..functions.sitegetter import get_site
        site_pages: dict[str, int] = {}
        domain_pages: dict[str, int] = {}
        for u, rep in replies.items():
            req = requests.get(u)
            if rep["is_indexed"] and req is not None:
                sk = get_site(req["url"], req["domain"])
                site_pages[sk] = site_pages.get(sk, 0) + 1
                domain_pages[req["domain"]] = \
                    domain_pages.get(req["domain"], 0) + 1
        # --- candidate evaluation (F8/F9/F10) -----------------------------
        eligible: list[dict] = []
        min_future: int | None = None
        for u, req in requests.items():
            rep = replies.get(u)
            ctx = dict(req)
            ctx["now_s"] = now_s
            ctx["discovery_time_s"] = req["discovery_time"]
            ctx["site_num_inlinks"] = min(
                len(site_inlinks.get(req["host"], ())), 255)
            ctx["page_num_inlinks"] = min(len(inlink_cblocks.get(u, ())), 20)
            ctx["site_pages"] = site_pages.get(
                get_site(req["url"], req["domain"]), 0)
            ctx["domain_pages"] = domain_pages.get(req["domain"], 0)
            ctx["site_tags"] = host_tags.get(req["host"], ())
            ctx["has_authority_inlink"] = u in auth_inlink
            ctx["in_site_list"] = (not site_list_domains
                                   or req["domain"] in site_list_domains)
            if rep is not None:
                ctx.update(has_reply=True, err_code=rep["err_code"],
                           err_count=rep["err_count"],
                           http_status=rep["http_status"],
                           is_indexed=rep["is_indexed"],
                           percent_changed_per_day=rep.get(
                               "percent_changed_per_day", 0),
                           last_spider_time_s=rep["spidered_time"])
            else:
                ctx.update(has_reply=False, err_code=0, err_count=0,
                           http_status=0, is_indexed=False,
                           last_spider_time_s=0)
            ufn = -1
            for i, atoms in enumerate(parsed_rules):
                if eval_atoms(atoms, ctx):
                    ufn = i
                    break
            if ufn < 0 or rules[ufn].force_delete:
                continue
            rule = rules[ufn]
            rb = robots_of(req["host"])
            if not rb.is_allowed(req["path_cgi"]):
                continue
            last_end = ip_last_end.get(req["first_ip"], 0)
            elig = req["added_time"] * 1000
            elig = max(elig, last_end + rule.spider_ip_wait_ms)
            cd = cd_table.get(req["domain"])
            if cd is not None and cd >= 0:
                elig = max(elig, last_end + min(cd, cfg.crawl_delay_cap_ms))
            if rep is not None:
                elig = max(elig, rep["spidered_time"] * 1000
                           + int(rule.spider_freq_days * 86_400_000))
            if elig > wave_start:
                if min_future is None or elig < min_future:
                    min_future = elig
                continue
            cand = dict(req)
            cand.update(ufn=ufn, priority=rule.priority, eligible_ms=elig,
                        ip_wait_ms=rule.spider_ip_wait_ms,
                        ip_max=rule.spider_ip_max_spiders,
                        max_per_rule=rule.max_spiders_per_rule,
                        harvest=rule.harvest_links,
                        site_rank=site_rank_of(ctx["site_num_inlinks"]))
            eligible.append(cand)

        if not eligible:
            if min_future is not None and min_future - wave_start <= HORIZON_MS:
                wave_start = max(min_future,
                                 wave_start + cfg.round_interval_ms)
                continue
            break

        # --- per-IP winners (F11) + global cap (F14) ----------------------
        order_key = lambda c: (-c["priority"], c["hop_count"],
                               c["eligible_ms"], c["uh48"])
        by_ip: dict[int, list[dict]] = {}
        for c in eligible:
            by_ip.setdefault(c["first_ip"], []).append(c)
        selected: list[dict] = []
        for ip, cands in by_ip.items():
            cands.sort(key=order_key)
            cands = cands[: cfg.max_winner_nodes]
            k = cands[0]["ip_max"]
            selected.extend(cands[:k])
        selected.sort(key=order_key)
        # per-rule launch budget (maxSpidersPerRule, SpiderLoop.cpp:683-731)
        rule_used: dict[int, int] = {}
        capped: list[dict] = []
        for c in selected:
            used = rule_used.get(c["ufn"], 0)
            if used >= c["max_per_rule"]:
                continue
            rule_used[c["ufn"]] = used + 1
            capped.append(c)
        wave = capped[: cfg.max_spiders_global]

        # --- fetch_at assignment (F16 hammer-queue analogue) --------------
        per_ip_rank: dict[int, int] = {}
        per_ip_delay: dict[int, int] = {}
        for c in wave:
            ip = c["first_ip"]
            if ip not in per_ip_delay:
                sel_ip = [x for x in wave if x["first_ip"] == ip]
                rb_delay = max(
                    (robots_of(x["host"]).crawl_delay_ms() for x in sel_ip),
                    default=-1)
                rb_delay = min(max(rb_delay, 0), cfg.crawl_delay_cap_ms)
                per_ip_delay[ip] = max(
                    max(x["ip_wait_ms"] for x in sel_ip), rb_delay)
                # twitchy auto-backoff (Msg13.cpp:2030-2038): fetch-time
                # floor of AUTOCRAWLDELAY for IPs flagged in prior rounds
                if cfg.auto_backoff and ip in twitchy_ips:
                    per_ip_delay[ip] = max(per_ip_delay[ip],
                                           AUTO_BACKOFF_DELAY_MS)
            delay = per_ip_delay[ip]
            rank = per_ip_rank.get(ip, 0)
            per_ip_rank[ip] = rank + 1
            base = max(wave_start, ip_last_end.get(ip, 0) + delay)
            c["fetch_at_ms"] = base + rank * delay

        for seq, c in enumerate(wave):
            out.crawl_order.append({
                "round": round_no, "seq_in_round": seq, "uh48": c["uh48"],
                "url_norm": c["url"], "first_ip": c["first_ip"],
                "priority": c["priority"], "hop_count": c["hop_count"],
                "fetch_at_ms": c["fetch_at_ms"],
            })

        # --- simulated fetch → replies + outlinks (F22-F25) ---------------
        # index snapshot for the EDOCDUP check (XmlDoc::getIsDup): the
        # committed index is the PRIOR rounds' — same-round fetches don't
        # see each other (the batch commit unit, like pipeline/crawl.py)
        dup_index: dict[int, list[tuple[int, int]]] = {}
        if cfg.deduping_enabled:
            for u_, rep_ in replies.items():
                if rep_.get("is_indexed"):
                    dup_index.setdefault(rep_["content_hash32"], []) \
                        .append((u_, rep_["site_rank"]))
        max_end = wave_start
        round_cd: dict[str, tuple[tuple[int, int], int]] = {}
        for c in wave:
            end_ms = c["fetch_at_ms"] + cfg.fetch_duration_ms
            max_end = max(max_end, end_ms)
            sp_s = end_ms // 1000
            url = c["url"]
            prev = replies.get(c["uh48"])
            prev_errs = prev["err_count"] if prev else 0
            rb = robots_of(c["host"])
            if url in docs_by_url:
                doc = docs_by_url[url]
                # volatile pages advance their content hash with the
                # version clock (change-rate model, pipeline/crawl.py);
                # mirror pages hash to their canonical's content_key
                # (exact-content identity; pools exclude volatile URLs)
                if c["uh48"] % VOLATILE_MOD == 0:
                    h32 = (_h32(url) ^ ((sp_s // VERSION_PERIOD_S)
                                        * VERSION_MIX)) & 0xFFFFFFFF
                else:
                    h32 = _h32(corpus.content_key.get(url, url))
                # EDOCDUP (XmlDoc.cpp:5042-5136): another indexed docid
                # with the same exact-content hash and site rank >= ours
                # was here first; root URLs never discarded
                is_dup = (
                    cfg.deduping_enabled
                    and not re.match(r"^https?://[^/]+/$", url)
                    and any(u_ != c["uh48"] and sr >= c["site_rank"]
                            for u_, sr in dup_index.get(h32, ())))
                if is_dup:
                    reply = {"err_code": ERR_DOC_DUP,
                             "err_count": prev_errs + 1,
                             "http_status": 200, "is_indexed": False,
                             "spidered_time": sp_s,
                             "download_end_ms": end_ms,
                             "content_hash32": h32,
                             "percent_changed_per_day": 0,
                             "crawl_delay_ms": rb.crawl_delay_ms()}
                    doc = None   # links of a dup are not harvested
                changed = (prev is not None and prev["content_hash32"] != 0
                           and h32 != prev["content_hash32"])
                ppcd = (min(100, (100 * 86400)
                            // max(sp_s - prev["spidered_time"], 1))
                        if changed else 0)
                if not is_dup:
                    # meta noindex (XmlDoc.cpp:13240-13267): fetched and
                    # links harvested, but never indexed
                    has_noindex = any(
                        sp["kind"] == "text" and sp["text"]
                        and "<meta name=noindex content=1>" in sp["text"]
                        for sp in docs_by_url[url]["spans"])
                    reply = {"err_code": 0, "err_count": 0,
                             "http_status": 200,
                             "is_indexed": not has_noindex,
                             "spidered_time": sp_s,
                             "download_end_ms": end_ms,
                             "content_hash32": h32,
                             "percent_changed_per_day": ppcd,
                             "crawl_delay_ms": rb.crawl_delay_ms()}
                if c["harvest"] and doc is not None:
                    for link in extract_outlinks(url, doc["spans"]):
                        if link["is_media"]:
                            continue
                        add_request(link["url_norm"],
                                    c["hop_count"] + 1, sp_s, sp_s,
                                    c["uh48"], False, round_no + 1,
                                    parent_domain=link["parent_domain"])
            elif url in corpus.redirects:
                # redirect followed with hopCount UNCHANGED
                # (XmlDoc.cpp:15371-15385; Msg13 download path follows);
                # the source is not indexed, the target joins the frontier
                reply = {"err_code": 0, "err_count": 0,
                         "http_status": 301, "is_indexed": False,
                         "spidered_time": sp_s, "download_end_ms": end_ms,
                         "content_hash32": 0, "percent_changed_per_day": 0,
                         "crawl_delay_ms": rb.crawl_delay_ms()}
                tgt = normalize_url(corpus.redirects[url],
                                    strip_params=True,
                                    strip_common_file=True)
                if tgt is not None:
                    add_request(tgt.url, c["hop_count"],
                                sp_s, sp_s, c["uh48"], False, round_no + 1,
                                parent_domain=None)
            elif url in corpus.tmp_error:
                reply = {"err_code": ERR_TMP, "err_count": prev_errs + 1,
                         "http_status": 0, "is_indexed": False,
                         "spidered_time": sp_s, "download_end_ms": end_ms,
                         "content_hash32": 0, "percent_changed_per_day": 0,
                         "crawl_delay_ms": rb.crawl_delay_ms()}
            elif url in corpus.throttled:
                # 503 = ban indicator (Msg13.cpp ipWasBanned): retryable
                # tmp error AND the IP joins the twitchy table below
                reply = {"err_code": ERR_TMP, "err_count": prev_errs + 1,
                         "http_status": 503, "is_indexed": False,
                         "spidered_time": sp_s, "download_end_ms": end_ms,
                         "content_hash32": 0, "percent_changed_per_day": 0,
                         "crawl_delay_ms": rb.crawl_delay_ms()}
            else:
                reply = {"err_code": ERR_NOT_FOUND,
                         "err_count": prev_errs + 1, "http_status": 404,
                         "is_indexed": False, "spidered_time": sp_s,
                         "download_end_ms": end_ms, "content_hash32": 0,
                         "percent_changed_per_day": 0,
                         "crawl_delay_ms": rb.crawl_delay_ms()}
            reply["site_rank"] = c["site_rank"]
            replies[c["uh48"]] = reply
            ip = c["first_ip"]
            if reply["http_status"] in BANNED_HTTP_STATUSES:
                twitchy_ips.add(ip)
            ip_last_end[ip] = max(ip_last_end.get(ip, 0),
                                  reply["download_end_ms"])
            ip_delay_used[ip] = per_ip_delay[ip]
            # crawl-delay propagation (F20): first write per domain wins
            # (SpiderColl.cpp:699-732) — "first" = earliest download end
            # (the reply-arrival order), uh48 tie-break; a batch round's
            # writes resolve to the round's earliest reply per domain
            if reply["crawl_delay_ms"] >= 0 and c["domain"] not in cd_table:
                key = (reply["download_end_ms"], c["uh48"])
                cur = round_cd.get(c["domain"])
                if cur is None or key < cur[0]:
                    round_cd[c["domain"]] = (key, reply["crawl_delay_ms"])
        for dom, (_, cdv) in round_cd.items():
            cd_table[dom] = cdv

        out.rounds = round_no + 1
        wave_start = max(wave_start + 1, max_end,
                         wave_start + cfg.round_interval_ms)

    out.url_seen = [
        {"uh48": u, "url_norm": v[0], "first_seen_round": v[1]}
        for u, v in sorted(first_seen.items())
    ]
    out.host_final = [
        {"first_ip": ip, "last_download_end_ms": end,
         "crawl_delay_ms": ip_delay_used.get(ip, -1)}
        for ip, end in sorted(ip_last_end.items())
    ]
    out.replies = replies
    return out
