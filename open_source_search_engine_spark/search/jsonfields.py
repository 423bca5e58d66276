"""JSON document field indexing (Json.cpp + XmlDoc_Indexing.cpp:2805
hashJSONFields2): a JSON doc is flattened into compound dotted field
names and every field value is indexed under ``name:token`` terms.

Reference semantics mirrored here:

* compound names join the parent chain with ``.``
  ("meta.twitter.title"), skipping empty and consecutive-duplicate
  names (the array case: ``"dupname":[{"a":"b"}]`` doesn't double
  "dupname"), max 15 levels (XmlDoc_Indexing.cpp:2822-2841).
* the top-level diffbot ``html`` field is never indexed
  (XmlDoc_Indexing.cpp:2843-2846).
* ``:`` in names becomes ``.`` — ``:`` is the field-operator separator
  (XmlDoc_Indexing.cpp:2858-2860).
* the hashgroup comes from name substrings, later checks winning:
  title → TITLE, url / resolved_url → INURL, tags → INTAG,
  meta → INMETATAG, else BODY (XmlDoc_Indexing.cpp:2864-2876) — so
  "meta.title" lands INMETATAG, exactly like the reference.
* a field named ``date`` / ``estimatedDate`` has its value parsed to a
  unix time, clamped to int32 range, and indexed as that number so
  gbsortby/gbmin/gbmax work on it (XmlDoc_Indexing.cpp:2885-2911).
* only number and string leaves are indexed (JT_NUMBER/JT_STRING,
  XmlDoc_Indexing.cpp:2814-2816).

Spark shape: the flatten is a per-doc kernel in one ``mapInPandas``
pass (shuffle-free); postings aggregate once on (field, term, doc_id)
— bucketable by term exactly like the plain Posdb layout; the field
search is termlist intersection + hashgroup-weighted tf.
"""

from __future__ import annotations

import calendar
import json
import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashgroups import HASHGROUP_WEIGHTS_X10

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# deterministic atotime (HttpMime.cpp atotime1-5) subset: ISO, and the
# RFC1123/RFC850 "Sun, 06 Nov 1994 08:49:37" family (optional weekday,
# day month-name year [HH:MM:SS], timegm like the reference)
_ISO_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})[T ]?(\d{2})?:?(\d{2})?:?"
                     r"(\d{2})?")
_RFC_RE = re.compile(
    r"^(?:[A-Za-z]+,?\s+)?(\d{1,2})[ -]([A-Za-z]{3,9})\.?[ -,]+(\d{4})"
    r"(?:\s+(\d{2}):(\d{2}):(\d{2}))?")
_MONTHS = {m: i + 1 for i, m in enumerate(
    ("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep",
     "oct", "nov", "dec"))}

_INT32_MIN = -0x80000000
_INT32_MAX = 0x7FFFFFFF


def _parse_date(val: str) -> int | None:
    val = val.strip()
    m = _ISO_RE.match(val)
    if m:
        y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    else:
        m = _RFC_RE.match(val)
        if not m:
            return None
        mo = _MONTHS.get(m.group(2)[:3].lower())
        if not mo:
            return None
        d, y = int(m.group(1)), int(m.group(3))
    h = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    s = int(m.group(6) or 0)
    try:
        tt = calendar.timegm((y, mo, d, h, mi, s, 0, 0, 0))
    except Exception:
        return None
    # named-timezone correction (HttpMime.cpp:318-320: getTimeZone on
    # the token after the time, offset ADDED — kept verbatim)
    rest = val[m.end():].strip()
    if rest:
        from ..functions.timezone import get_time_zone
        tz = get_time_zone(rest)
        if tz is not None:
            tt += tz
    # clamp to int32 (XmlDoc_Indexing.cpp:2895-2903)
    return max(_INT32_MIN, min(tt, _INT32_MAX))


def _hashgroup_of(name: str) -> str:
    hg = "body"
    if "title" in name:
        hg = "title"
    if "url" in name:
        hg = "inurl"
    if "resolved_url" in name:
        hg = "inurl"
    if "tags" in name:
        hg = "intag"
    if "meta" in name:
        hg = "inmetatag"
    return hg


def _num_str(v) -> str:
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float) and v == int(v) and abs(v) < 2 ** 53:
        return str(int(v))
    return str(v)


def flatten_json(doc: str) -> list[tuple[str, str, str]]:
    """One JSON doc → [(field_name, value_string, hashgroup)]."""
    try:
        root = json.loads(doc)
    except Exception:
        return []
    out: list[tuple[str, str, str]] = []

    def walk(node, names: tuple[str, ...]):
        if isinstance(node, dict):
            for k, v in node.items():
                # empty names are skipped; the reference's
                # consecutive-dup skip is the array case, which this
                # walk already avoids (lists add no name)
                walk(v, names + (k,) if k else names)
        elif isinstance(node, list):
            for v in node:
                walk(v, names)
        elif isinstance(node, (str, int, float)) \
                and not isinstance(node, bool):
            if not names:
                return
            if len(names) == 1 and names[0] == "html":
                return   # diffbot html field never indexed
            # the name chain keeps the leaf-most 15 components
            # (XmlDoc_Indexing.cpp:2836-2840 collects leaf-up)
            name = ".".join(names[-15:]).replace(":", ".")
            val = node if isinstance(node, str) else _num_str(node)
            if name.lower() in ("date", "estimateddate"):
                tt = _parse_date(str(val))
                if tt:
                    val = str(tt)
            out.append((name, str(val), _hashgroup_of(name)))

    walk(root, ())
    return out


_POSTING_SCHEMA = ("doc_id long, field string, term string, "
                   "hashgroup string, tf long")


def build_json_postings(docs: DataFrame, json_col: str = "json",
                        id_col: str = "doc_id") -> DataFrame:
    """JSON docs → field postings (doc_id, field, term, hashgroup, tf).
    At scale write with ``write_postings_bucketed`` keyed on term."""
    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "field": [], "term": [],
                    "hashgroup": []}
            for r in pdf.itertuples(index=False):
                for name, val, hg in flatten_json(
                        getattr(r, json_col) or ""):
                    for tok in _TOKEN_RE.findall(val.lower()):
                        rows["doc_id"].append(getattr(r, id_col))
                        rows["field"].append(name)
                        rows["term"].append(tok)
                        rows["hashgroup"].append(hg)
            yield pd.DataFrame(rows)

    exploded = docs.select(id_col, json_col).mapInPandas(
        gen, "doc_id long, field string, term string, hashgroup string")
    return (exploded.groupBy("doc_id", "field", "term", "hashgroup")
            .agg(F.count("*").alias("tf")))


def search_json_field(postings: DataFrame, field: str, terms: list[str],
                      k: int = 10) -> DataFrame:
    """``field:term`` AND search over the flattened postings, ranked by
    hashgroup-weighted tf (integer-exact x10 weights, the
    s_hashGroupWeights the assigned group carries at query time)."""
    terms = [t.lower() for t in terms]
    w = F.lit(0)
    for g, wt in HASHGROUP_WEIGHTS_X10.items():
        w = F.when(F.col("hashgroup") == g, F.lit(wt)).otherwise(w)
    tl = (postings.filter((F.col("field") == field)
                          & F.col("term").isin(terms))
          .select("doc_id", "term", (F.col("tf") * w).alias("_s")))
    agg = (tl.groupBy("doc_id")
           .agg(F.count_distinct("term").alias("_n"),
                F.sum("_s").alias("score"))
           .filter(F.col("_n") == len(terms)))
    return (agg.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.col("score").cast("long").alias("score"))
            .orderBy(F.desc("score"), "doc_id")
            .limit(k))
