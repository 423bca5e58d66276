"""Facet tables over a result set (gbfacetstr/int/float term family).

The reference indexes field values twice: once as the exact-match
composite hash behind ``gbfieldmatch:`` (Query.cpp:1760-1825,
XmlDoc.cpp::hashFieldMatch) and once numerically "so we can do
gbfacetint:type on it" (XmlDoc_Indexing.cpp:844, hashFacet1/hashFacet2
noted at Query.cpp:1780-1795).  A facet term matches every doc carrying
the field and the serving side tallies the distinct values of the field
over the matching docs into a value->count table shown next to the
results.

Spark shape: the result set is already a (doc_id) frame; one broadcast-
friendly join against the doc-metadata dimension and one groupBy(value)
per facet field.  At 100 TB the join shuffles on doc_id only if the
result set is large — for a top-K page it is a broadcast of K rows; for
whole-corpus facets Catalyst picks the shuffle and the aggregate is a
map-side-combined count, the cheapest distributed histogram there is.
Range facets (gbfacetint:field:a-b,b-c — the reference UI's bucketed
form) fold the value through one CASE ladder before the same count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(result_docs: DataFrame, doc_meta: DataFrame,
                 fields: list[str]) -> DataFrame:
    """Value->count facet table per field over the matching docs.

    ``result_docs`` needs a doc_id column; duplicates are collapsed
    first (a doc counts once per facet no matter how it scored).
    Returns (field, value, count) ordered by field, count desc, value —
    the serving order the reference renders."""
    docs = result_docs.select("doc_id").distinct()
    parts = []
    for f in fields:
        parts.append(
            docs.join(doc_meta.select("doc_id", f), "doc_id")
            .filter(F.col(f).isNotNull())
            .select(F.lit(f).alias("field"),
                    F.col(f).cast("string").alias("value")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy("field", "value")
            .agg(F.count("*").alias("count"))
            .orderBy("field", F.desc("count"), "value"))


def facet_int_ranges(result_docs: DataFrame, doc_meta: DataFrame,
                     field: str, edges: list[int]) -> DataFrame:
    """Bucketed numeric facet (gbfacetint:field:a-b,b-c,... form):
    counts of docs whose ``field`` falls in [edges[i], edges[i+1]).

    Returns (range_lo, range_hi, count) ordered by range_lo; empty
    buckets are omitted like the reference's hash-table tally (only
    values that occur get entries)."""
    if len(edges) < 2:
        raise ValueError("need at least two bucket edges")
    docs = result_docs.select("doc_id").distinct()
    v = F.col(field).cast("long")
    expr = F.lit(None).cast("int")
    for i in range(len(edges) - 1, 0, -1):
        expr = F.when((v >= edges[i - 1]) & (v < edges[i]),
                      F.lit(i - 1)).otherwise(expr)
    lo = F.array(*[F.lit(e) for e in edges[:-1]])
    hi = F.array(*[F.lit(e) for e in edges[1:]])
    return (docs.join(doc_meta.select("doc_id", field), "doc_id")
            .filter(v.isNotNull())
            .select(expr.alias("_b"))
            .filter(F.col("_b").isNotNull())
            .groupBy("_b").agg(F.count("*").alias("count"))
            .select(F.element_at(lo, F.col("_b") + 1).cast("long")
                    .alias("range_lo"),
                    F.element_at(hi, F.col("_b") + 1).cast("long")
                    .alias("range_hi"),
                    "count")
            .orderBy("range_lo"))


def search_with_facets(postings: DataFrame, query: str,
                       doc_meta: DataFrame, facet_fields: list[str],
                       k: int = 10, **kwargs
                       ) -> tuple[DataFrame, DataFrame]:
    """Full serving shape: ranked top-K page + facet tables computed
    over the ENTIRE matching set (not just the page), like the
    reference tallies facets across all Msg3a results."""
    from .queryparse import ExecContext, _exec, _strip_sorts, parse_query
    ast, _ = _strip_sorts(parse_query(query))
    ctx = ExecContext(postings=postings, doc_meta=doc_meta, **kwargs)
    matches = _exec(ctx, ast)
    page = (matches.select(F.col("doc_id").cast("long").alias("doc_id"),
                           F.col("score_part").cast("long").alias("score"))
            .orderBy(F.desc("score"), "doc_id").limit(k))
    return page, facet_counts(matches, doc_meta, facet_fields)
