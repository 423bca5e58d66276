"""Timezone-name offset table — Timezone.cpp:14-330 (tzs[]) and
getTimeZone (Timezone.cpp:334-356): HttpMime's atotime family parses
"Sun, 06 Nov 1994 08:49:37 GMT"-style dates and corrects the timegm
result by the named zone's offset (``global += tzoff``,
HttpMime.cpp:318-320 — the reference ADDS the offset; kept verbatim for
parity).  Lookups hash the leading alnum run case-insensitively
(hash64Lower, Timezone.cpp:341) — here a dict keyed by the lowercased
name.  The table is factual reference data (273 zone names, offsets in
seconds), extracted mechanically from Timezone.cpp with commented-out
entries dropped.
"""

from __future__ import annotations

# {name: offset seconds} = m_hourMod*3600 + m_minMod*60
TIMEZONES: dict[str, int] = {
    "acdt": 37800, "acst": 34200, "adt": -10800, "aedt": 39600,
    "aest": 36000, "aft": 16200, "ahdt": -32400, "ahst": -36000,
    "akdt": -28800, "akst": -32400, "amst": 14400, "amt": 14400,
    "anast": 46800, "anat": 43200, "art": -10800, "ast": -14400,
    "at": -3600, "awst": 28800, "azost": 0, "azot": -3600, "azst": 18000,
    "azt": 14400, "badt": 14400, "bat": 21600, "bdst": 7200, "bdt": 21600,
    "bet": -39600, "bnt": 28800, "bort": 28800, "bot": -14400,
    "bra": -10800, "bst": 3600, "bt": 21600, "btt": 21600, "cat": 7200,
    "cct": 28800, "cdt": -18000, "cest": 7200, "cet": 3600, "chadt": 49500,
    "chast": 45900, "chst": 36000, "ckt": -36000, "clst": -10800,
    "clt": -14400, "cot": -18000, "cst": -21600, "ct": -21600, "cut": 0,
    "cxt": 25200, "davt": 25200, "ddut": 36000, "dnt": 3600, "dst": 7200,
    "easst": -18000, "east": -21600, "eat": 10800, "ect": -18000,
    "edt": -14400, "eest": 10800, "eet": 7200, "egst": 0, "egt": -3600,
    "emt": 3600, "est": -18000, "et": -18000, "fdt": -3600, "fjst": 46800,
    "fjt": 43200, "fkst": -10800, "fkt": -14400, "fst": 7200, "fwt": 3600,
    "galt": -21600, "gamt": -32400, "gest": 18000, "get": 14400,
    "gft": -10800, "gilt": 43200, "gmt": 0, "gst": 36000, "gyt": -14400,
    "haa": -10800, "hac": -18000, "hae": -14400, "hap": -25200,
    "har": -21600, "hat": -9000, "hay": -28800, "hdt": -34200, "hfe": 7200,
    "hfh": 3600, "hkt": 28800, "hna": -14400, "hnc": -21600, "hne": -18000,
    "hnp": -28800, "hnr": -25200, "hnt": -12600, "hny": -32400,
    "hoe": 3600, "hst": -36000, "ict": 25200, "idle": 43200,
    "idlw": -43200, "idt": 10800, "iot": 18000, "irdt": 16200,
    "irkst": 32400, "irkt": 28800, "irst": 16200, "irt": 12600,
    "ist": 3600, "it": 12600, "ita": 3600, "javt": 25200, "jayt": 32400,
    "jst": 32400, "jt": 25200, "kdt": 36000, "kgst": 21600, "kgt": 18000,
    "kost": 43200, "krast": 28800, "krat": 25200, "kst": 32400,
    "lhdt": 39600, "lhst": 37800, "ligt": 36000, "lint": 50400,
    "lkt": 21600, "magst": 43200, "magt": 39600, "mal": 28800,
    "mart": -34200, "mat": 10800, "mawt": 21600, "mdt": -21600,
    "med": 7200, "medst": 7200, "mest": 7200, "mesz": 7200, "met": 3600,
    "mewt": 3600, "mex": -21600, "mht": 43200, "mmt": 23400, "mpt": 36000,
    "msd": 14400, "msk": 10800, "msks": 14400, "mst": -25200, "mt": -25200,
    "mut": 14400, "mvt": 18000, "myt": 28800, "nct": 39600, "ndt": 9000,
    "nft": 41400, "nor": 3600, "novst": 25200, "novt": 21600, "npt": 20700,
    "nrt": 43200, "nst": -12600, "nsut": 23400, "nt": -39600,
    "nut": -39600, "nzdt": 46800, "nzst": 43200, "nzt": 43200,
    "oesz": 10800, "oez": 7200, "omsst": 25200, "omst": 21600,
    "pdt": -25200, "pet": -18000, "petst": 46800, "pett": 43200,
    "pgt": 36000, "phot": 46800, "pht": 28800, "pkt": 18000, "pmdt": -7200,
    "pmt": -10800, "pnt": -30600, "pont": 39600, "pst": -28800,
    "pt": -28800, "pwt": 32400, "pyst": -10800, "pyt": -14400, "r1t": 7200,
    "r2t": 10800, "ret": 14400, "rok": 32400, "sadt": 37800, "sast": 7200,
    "sbt": 39600, "sct": 14400, "set": 3600, "sgt": 28800, "srt": -10800,
    "sst": 7200, "swt": 3600, "tft": 18000, "tha": 25200, "that": -36000,
    "tjt": 18000, "tkt": -36000, "tmt": 18000, "tot": 46800, "truk": 36000,
    "tst": 10800, "tuc": 0, "tvt": 43200, "ulast": 32400, "ulat": 28800,
    "usz1": 7200, "usz1s": 10800, "usz2": 10800, "usz2s": 14400,
    "usz3": 14400, "usz3s": 18000, "usz4": 18000, "usz4s": 21600,
    "usz5": 21600, "usz5s": 25200, "usz6": 25200, "usz6s": 28800,
    "usz7": 28800, "usz7s": 32400, "usz8": 32400, "usz8s": 36000,
    "usz9": 36000, "usz9s": 39600, "utc": 0, "utz": -10800, "uyt": -10800,
    "uz10": 39600, "uz10s": 43200, "uz11": 43200, "uz11s": 46800,
    "uz12": 46800, "uz12s": 50400, "uzt": 18000, "vet": -14400,
    "vlast": 39600, "vlat": 36000, "vtz": -7200, "vut": 39600,
    "wakt": 43200, "wast": 7200, "wat": 3600, "west": 3600, "wesz": 3600,
    "wet": 0, "wez": 0, "wft": 43200, "wgst": -7200, "wgt": -10800,
    "wib": 25200, "wit": 32400, "wita": 28800, "wst": 28800, "wtz": -3600,
    "wut": 3600, "yakst": 36000, "yakt": 32400, "yapt": 36000,
    "ydt": -28800, "yekst": 21600, "yst": -32400,
}


def get_time_zone(s: str) -> int | None:
    """getTimeZone (Timezone.cpp:334): offset seconds for the leading
    alnum run of ``s``, None when unknown (BADTIMEZONE)."""
    if not s:
        return None
    s = s.strip()
    i = 0
    while i < len(s) and s[i].isalnum():
        i += 1
    return TIMEZONES.get(s[:i].lower())
