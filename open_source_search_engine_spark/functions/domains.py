"""Domain / TLD split — the exact Domains.cpp ladder.

Reference: Domains.cpp:53-97 (getTLD / getDomain), Domains.cpp:9-22
(getDomainOfIp), Domains.cpp:105-1899 (isTLD + the s_tlds table).

The reference's isTLD accepts ANY period-free alnum/hyphen label as a
TLD (Domains.cpp:115 ``pcount == 0 -> true``), so only the table's
DOTTED entries carry information: a two-label suffix is a TLD iff it
is listed.  Entries with two periods ("lkd.co.im", "plc.co.im") are
dead in the reference too (Domains.cpp:116 ``pcount >= 2 -> false``)
and are omitted.  getTLD tries the one-label suffix, then the
two-label suffix, longest valid wins (Domains.cpp:63-97).
"""

from __future__ import annotations

# the 440 two-label suffixes of Domains.cpp s_tlds (lowercased)
DOTTED_TLDS = frozenset((
    "ab.ca", "ac.ae", "ac.at", "ac.cn", "ac.cr", "ac.cy", "ac.fj", "ac.gg",
    "ac.id", "ac.il", "ac.im", "ac.in", "ac.je", "ac.jp", "ac.kr", "ac.nz",
    "ac.pa", "ac.th", "ac.ug", "ac.uk", "ac.yu", "ac.za", "ad.jp", "ah.cn",
    "alderney.gg", "alt.za", "art.br", "art.do", "arts.co", "arts.ve",
    "asn.au", "asn.lv", "bbs.tr", "bc.ca", "bib.ve", "bj.cn", "co.ae",
    "co.ao", "co.at", "co.ck", "co.cr", "co.gg", "co.hu", "co.id", "co.il",
    "co.im", "co.in", "co.je", "co.jp", "co.kr", "co.nz", "co.sv", "co.th",
    "co.ug", "co.uk", "co.ve", "co.vi", "co.yu", "co.za", "com.ar", "com.au",
    "com.az", "com.bb", "com.bm", "com.br", "com.bs", "com.cn", "com.co",
    "com.cu", "com.cy", "com.do", "com.ec", "com.eg", "com.fj", "com.ge",
    "com.gu", "com.hk", "com.jo", "com.kh", "com.la", "com.lb", "com.lc",
    "com.lv", "com.ly", "com.mm", "com.mo", "com.mt", "com.mx", "com.my",
    "com.na", "com.nc", "com.ni", "com.np", "com.pa", "com.pe", "com.ph",
    "com.pl", "com.py", "com.ru", "com.sg", "com.sh", "com.sy", "com.tn",
    "com.tr", "com.tw", "com.ua", "com.uy", "com.ve", "conf.au", "conf.lv",
    "cq.cn", "csiro.au", "ed.cr", "edu.ar", "edu.bm", "edu.cn", "edu.co",
    "edu.do", "edu.ec", "edu.eg", "edu.ge", "edu.gu", "edu.jo", "edu.lc",
    "edu.lv", "edu.mm", "edu.mo", "edu.my", "edu.pa", "edu.py", "edu.sg",
    "edu.sh", "edu.tr", "edu.tw", "edu.uy", "edu.ve", "edu.yu", "edu.za",
    "edunet.tn", "ens.tn", "ernet.in", "esp.br", "etc.br", "eun.eg", "fi.cr",
    "fin.ec", "fin.tn", "firm.co", "firm.ve", "g12.br", "gd.cn", "gen.nz",
    "go.cr", "go.id", "go.kr", "go.th", "go.ug", "gob.pa", "gov.ae",
    "gov.ar", "gov.au", "gov.bm", "gov.br", "gov.cn", "gov.co", "gov.cy",
    "gov.do", "gov.ec", "gov.eg", "gov.fj", "gov.ge", "gov.gg", "gov.gu",
    "gov.il", "gov.im", "gov.in", "gov.je", "gov.jo", "gov.jp", "gov.lb",
    "gov.lc", "gov.lv", "gov.mm", "gov.mo", "gov.my", "gov.sg", "gov.sh",
    "gov.tn", "gov.tr", "gov.ua", "gov.uk", "gov.ve", "gov.za", "gove.tw",
    "govt.nz", "gs.cn", "guernsey.gg", "gx.cn", "gz.cn", "hb.cn", "he.cn",
    "hi.cn", "hk.cn", "hl.cn", "hn.cn", "id.au", "id.fj", "id.lv", "ind.br",
    "ind.gg", "ind.je", "ind.tn", "inf.br", "info.au", "info.co", "info.hu",
    "info.tn", "info.ve", "int.co", "int.ve", "intl.tn", "jersey.je",
    "jl.cn", "js.cn", "k12.ec", "k12.il", "k12.tr", "ln.cn", "ltd.gg",
    "ltd.je", "ltd.uk", "mb.ca", "med.ec", "mil.br", "mil.co", "mil.do",
    "mil.ec", "mil.ge", "mil.gu", "mil.id", "mil.lb", "mil.lv", "mil.ph",
    "mil.sh", "mil.tr", "mil.ve", "mil.za", "mo.cn", "mod.uk", "muni.il",
    "nat.tn", "nb.ca", "net.ar", "net.au", "net.az", "net.bb", "net.bm",
    "net.br", "net.bs", "net.cn", "net.cu", "net.cy", "net.do", "net.ec",
    "net.eg", "net.ge", "net.gg", "net.gu", "net.hk", "net.id", "net.il",
    "net.im", "net.in", "net.je", "net.jo", "net.jp", "net.kh", "net.la",
    "net.lb", "net.lc", "net.lv", "net.ly", "net.mm", "net.mo", "net.mt",
    "net.mx", "net.my", "net.na", "net.nc", "net.np", "net.nz", "net.pa",
    "net.pe", "net.ph", "net.pl", "net.py", "net.ru", "net.sg", "net.sh",
    "net.sy", "net.th", "net.tn", "net.tr", "net.tw", "net.ua", "net.uk",
    "net.uy", "net.ve", "net.vi", "net.za", "nf.ca", "ngo.ph", "ngo.za",
    "nhs.uk", "nic.im", "nic.in", "nm.cn", "nm.kr", "nom.co", "nom.ve",
    "nom.za", "ns.ca", "nsk.su", "nt.ca", "nui.hu", "nx.cn", "on.ca",
    "or.cr", "or.id", "or.kr", "or.th", "or.ug", "org.ae", "org.ar",
    "org.au", "org.az", "org.bb", "org.bm", "org.br", "org.bs", "org.cn",
    "org.co", "org.cu", "org.cy", "org.do", "org.ec", "org.eg", "org.fj",
    "org.ge", "org.gg", "org.gu", "org.hk", "org.hu", "org.il", "org.im",
    "org.je", "org.jp", "org.kh", "org.la", "org.lb", "org.lc", "org.lv",
    "org.ly", "org.mm", "org.mo", "org.mt", "org.mx", "org.my", "org.na",
    "org.nc", "org.nz", "org.pa", "org.pe", "org.ph", "org.pl", "org.py",
    "org.ru", "org.sg", "org.sh", "org.sy", "org.tn", "org.tr", "org.tw",
    "org.uk", "org.uy", "org.ve", "org.vi", "org.yu", "org.za", "ort.np",
    "oz.au", "pe.ca", "plc.uk", "police.uk", "priv.hu", "psi.br", "pvt.ge",
    "qc.ca", "qh.cn", "re.kr", "rec.br", "rec.co", "rec.ve", "res.in",
    "rnrt.tn", "rns.tn", "rnu.tn", "sa.cr", "sark.gg", "sc.cn", "sch.gg",
    "sch.je", "sch.uk", "school.fj", "school.za", "sci.eg", "sh.cn", "sk.ca",
    "sld.pa", "sn.cn", "store.co", "store.ve", "sx.cn", "tec.ve",
    "telememo.au", "tj.cn", "tm.hu", "tm.za", "tmp.br", "tourism.tn",
    "tw.cn", "web.co", "web.do", "web.ve", "web.za", "xj.cn", "xz.cn",
    "yk.ca", "yn.cn", "zj.cn",
))


def _is_alnum_a(c: str) -> bool:
    return ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9")


def is_tld(s: str) -> bool:
    """isTLD (Domains.cpp:105-120): alnum/hyphen labels only; no period
    -> always a TLD; one period -> table lookup; more -> never."""
    pcount = 0
    for ch in s:
        if ch == ".":
            pcount += 1
            continue
        if not _is_alnum_a(ch) and ch != "-":
            return False
    if pcount == 0:
        return bool(s)
    if pcount >= 2:
        return False
    return s.lower() in DOTTED_TLDS


def get_tld(host: str) -> str | None:
    """getTLD (Domains.cpp:53-97): longest valid suffix of <= 2 labels.
    Returns the TLD substring (which may be the whole host) or None."""
    if not host:
        return None
    parts = host.split(".")
    tld = None
    if is_tld(parts[-1]):
        tld = parts[-1]
    if len(parts) >= 2:
        two = parts[-2] + "." + parts[-1]
        if is_tld(two):
            tld = two
    return tld


def get_domain(host: str, tld: str | None) -> str | None:
    """getDomain (Domains.cpp:24-51): the TLD plus exactly one more
    label; None when the host IS the tld (no label before it)."""
    if not tld:
        return None
    if len(tld) >= len(host):
        return None
    head = host[: len(host) - len(tld) - 1]  # strip ".tld"
    label = head.rsplit(".", 1)[-1]
    if not label:
        return None
    return label + "." + tld


def get_domain_of_ip(host: str) -> str | None:
    """getDomainOfIp (Domains.cpp:9-22): an IP's 'domain' is everything
    before its last period (the /24 C-block for IPv4 dotted quads)."""
    if "." not in host:
        return None
    return host.rsplit(".", 1)[0]
