"""Country identification — XmlDoc::getCountryId via the TLD guess.

Reference: ``XmlDoc.cpp:5715-5731`` calls
``LanguageIdentifier::guessCountryTLD`` (LanguageIdentifier.cpp:4-31):

1. if the hostname's FIRST label is two letters and maps to a country
   code, that wins (``http://de.wikipedia.org`` → Germany) — the
   ``url[9]=='.'`` byte check over the ``http://`` prefix;
2. else, a two-letter LAST label (ccTLD) decides
   (``http://a.b.fr/`` → France) — the ``*(cp-3)=='.'`` check;
3. else country 0 (Unknown).

The id is the index into ``s_countryCode`` (CountryCode.cpp:14-276,
ISO-3166 two-letter codes in the reference's exact order — the order IS
the id space, stored in titlerecs and Msg20 replies, so it must match
byte for byte).  ``get_country_id`` mirrors ``getCountryId(cc)``
(CountryCode.cpp:280-318, case-folded 2-byte lookup).

Spark shape: the id lives in one pure-Catalyst column expression
(``country_id_col``) — two regexp label extracts and a 254-entry literal
map, constant-folded into the scan projection; no UDF, no shuffle.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

# CountryCode.cpp:14-276 s_countryCode — index == country id.  zz is the
# "Unknown" slot 0 (never matched: getIndexOfAbbr's 0 means not-found).
COUNTRY_CODES: tuple[str, ...] = (
    "zz ad ae af ag ai al am an ao aq ar as at au aw az ba bb bd be bf "
    "bg bh bi bj bm bn bo br bs bt bv bw by bz ca cc cf cd cg ch ci ck "
    "cl cm cn co cr cs cu cv cx cy cz de dj dk dm do dz ec ee eg eh er "
    "es et fi fj fk fm fo fr fx ga gb gd ge gf gh gi gl gm gn gp gq gr "
    "gs gt gu gw gy hk hm hn hr ht hu id ie il in io iq ir is it jm jo "
    "jp ke kg kh ki km kn kp kr kw ky kz la lb lc li lk lr ls lt lu lv "
    "ly ma mc md mg mh mk ml mm mn mo mp mq mr ms mt mu mv mw mx my mz "
    "na nc ne nf ng ni nl no np nr nt nu nz om pa pe pf pg ph pk pl pm "
    "pn pr pt pw py qa re ro ru rw sa sb sc sd se sg sh si sj sk sl sm "
    "sn so sr st su sv sy sz tc td tf tg th tj tk tm tn to tp tr tt tv "
    "tw tz ua ug uk um us uy uz va vc ve vg vi vn vu wf ws ye yt yu za "
    "zm zr zw bl gg mf im je me ps rs tl"
).split()

COUNTRY_ID: dict[str, int] = {c: i for i, c in enumerate(COUNTRY_CODES)}


def get_country_id(cc: str | None) -> int:
    """getCountryId(cc) (CountryCode.cpp:280-318): case-folded two-letter
    lookup; 0 when unknown."""
    if not cc or len(cc) < 2:
        return 0
    return COUNTRY_ID.get(cc[:2].lower(), 0)


def get_country_abbr(country_id: int) -> str:
    """getAbbr (CountryCode.cpp:876-879): id → code, 'zz' for out of
    range."""
    if 0 <= country_id < len(COUNTRY_CODES):
        return COUNTRY_CODES[country_id]
    return COUNTRY_CODES[0]


def guess_country_tld(url: str) -> int:
    """guessCountryTLD (LanguageIdentifier.cpp:4-31) over a normalized
    http URL: 2-letter first host label wins, else 2-letter ccTLD.

    The reference reads literal byte offsets past ``http://`` (url[7..8]
    for the prefix, ``strchr(url+7, ':'|'/')`` minus 3 for the TLD); over
    normalized lowercase http URLs that is exactly "first label is two
    chars" / "last label is two chars", which is what we compute — same
    verdict for every URL the frontier produces."""
    host = url.split("://", 1)[-1].split("/", 1)[0].split(":", 1)[0]
    labels = host.split(".")
    if len(labels) >= 2 and len(labels[0]) == 2:
        cid = COUNTRY_ID.get(labels[0], 0)
        if cid:
            return cid
    if len(labels) >= 2 and len(labels[-1]) == 2:
        return COUNTRY_ID.get(labels[-1], 0)
    return 0


_CODE_MAP = None


def country_id_col(url: Column | str) -> Column:
    """Pure-Catalyst twin of :func:`guess_country_tld`: two label
    extracts + a literal map lookup, fully codegen'd — the production
    expression for stamping country ids at parse time."""
    global _CODE_MAP
    if _CODE_MAP is None:
        _CODE_MAP = F.create_map(
            *chain.from_iterable((F.lit(c), F.lit(i))
                                 for c, i in COUNTRY_ID.items() if i))
    u = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(u, r"^[a-z]+://([^/:?]+)", 1)
    first = F.regexp_extract(host, r"^([^.]{2})\.", 1)
    last = F.regexp_extract(host, r"\.([^.]{2})$", 1)
    by_prefix = _CODE_MAP[first]
    by_tld = _CODE_MAP[last]
    return (F.when((first != "") & by_prefix.isNotNull(), by_prefix)
            .when((last != "") & by_tld.isNotNull(), by_tld)
            .otherwise(F.lit(0))).cast("int")
