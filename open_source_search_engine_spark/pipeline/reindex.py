"""Query-based reindex/delete (PageReindex.cpp / Msg1c).

The reference's admin surface runs a query, collects the matching
docids, and adds one spider request per docid back into spiderdb
(PageReindex.cpp:224-426 Msg1c::reindexQuery):

- the request's "url" IS the decimal docid (``sr.m_urlIsDocId = 1``);
- ``isPageReindex=1``, ``fakeFirstIp=1``, ``hopCount=-1``;
- firstIp is synthetic: for a DELETE, ``docId & 0xffff`` ("use only 64k
  values so we don't stress doledb/waittrees"); for a REINDEX,
  ``(docId >> 6) & 0xff`` — bits 6-13 are the docid's domain hash, so
  same-domain requests land on the same shard (PageReindex.cpp:351-367);
  0 is remapped to 1 ("0 is not a legit val");
- duplicate docids collapse to one request (the dt dedup table);
- ``forceDelete`` mirrors the delete checkbox.

Spark shape: the query runs through the production Q1 executor over the
postings (full match set, not a page), then one distinct + one
projection build the request frame — no driver loop, no UDF; the
synthetic-firstIp arithmetic is two bit ops Catalyst folds into the
scan projection.  At 10^10 docids the distinct is the only shuffle and
it keys on the docid the requests are already partitioned by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reindex_requests(doc_ids: DataFrame, now: int,
                     force_delete: bool = False) -> DataFrame:
    """docid frame -> spider-request frame (PageReindex.cpp:330-400).

    Output: (uh48, url, first_ip, hop_count, added_time,
    is_page_reindex, url_is_doc_id, fake_first_ip, force_delete).
    uh48 is the docid itself — the reference hashes the decimal string
    only because its key must BE a hash (setKey comment: "this will set
    uh48 to hash64b(m_url) which is the docid")."""
    d = F.col("doc_id").cast("long")
    if force_delete:
        # deletes don't redownload, distribution can be more random
        ip = d.bitwiseAND(F.lit(0xFFFF))
    else:
        # domain-hash bits 6-13: same domain -> same shard
        ip = F.shiftright(d, 6).bitwiseAND(F.lit(0xFF))
    ip = F.when(ip == 0, F.lit(1)).otherwise(ip)
    return (doc_ids.select(d.alias("doc_id")).distinct()
            .select(
                F.col("doc_id").alias("uh48"),
                F.col("doc_id").cast("string").alias("url"),
                ip.cast("long").alias("first_ip"),
                F.lit(-1).alias("hop_count"),
                F.lit(int(now)).alias("added_time"),
                F.lit(True).alias("is_page_reindex"),
                F.lit(True).alias("url_is_doc_id"),
                F.lit(True).alias("fake_first_ip"),
                F.lit(bool(force_delete)).alias("force_delete")))


def reindex_query(postings: DataFrame, query: str, now: int,
                  force_delete: bool = False,
                  doc_meta: DataFrame | None = None,
                  links: DataFrame | None = None) -> DataFrame:
    """Msg1c::reindexQuery: run the query through the PRODUCTION parser/
    executor (full match set — the reference asks for up to 4.9M docids,
    we stream all matches) and build the spider requests."""
    from ..search.queryparse import ExecContext, _exec, _strip_sorts, \
        parse_query
    ast, _ = _strip_sorts(parse_query(query))
    ctx = ExecContext(postings=postings, doc_meta=doc_meta, links=links)
    matches = _exec(ctx, ast).select("doc_id")
    return reindex_requests(matches, now, force_delete)
