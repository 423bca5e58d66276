"""Output connectors: export the crawl's canonical outputs.

The reference dumps titlerec/spiderdb via gbdump-style tools; here the
committed state IS queryable parquet, and these writers export the three
golden outputs (FIXTURES.md §6) to parquet/CSV/JSON for downstream
consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export(df: DataFrame, path: str, fmt: str = "parquet",
           single_file: bool = False) -> None:
    if single_file:
        df = df.coalesce(1)
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unknown export format: {fmt}")


def export_crawl_outputs(runner, out_dir: str, fmt: str = "parquet") -> None:
    """Write crawl_order / url_seen / host_final under ``out_dir``."""
    import os
    export(runner.crawl_order(), os.path.join(out_dir, "crawl_order"), fmt)
    export(runner.url_seen(), os.path.join(out_dir, "url_seen"), fmt)
    export(runner.host_final(), os.path.join(out_dir, "host_final"), fmt)


def write_postings_bucketed(postings: DataFrame, table: str,
                            buckets: int = 64) -> None:
    """Persist a postings table bucketed+sorted by term — the Posdb
    shard layout (Posdb.h: keys ordered by termId so one termlist is one
    contiguous range on one shard; Hostdb routes gets by key).

    Spark form: ``bucketBy(term).sortBy(term)`` parquet.  A termlist
    read then touches ONLY the matching buckets (bucket pruning:
    'SelectedBucketsCount' in the scan) and term-keyed joins/aggregates
    over two tables bucketed the same way need NO exchange — at 100 TB
    the postings never reshuffle after the one bucketed write."""
    (postings.write.mode("overwrite")
     .bucketBy(buckets, "term").sortBy("term")
     .format("parquet")
     .saveAsTable(table))


def read_postings_bucketed(spark, table: str) -> DataFrame:
    """Read back the bucketed postings table for termlist point-scans.

    Spark's autoBucketedScan heuristic turns the bucketed layout OFF
    when a query shows no exchange to elide — but a termlist lookup's
    win is bucket PRUNING (read 1/N of the files), which needs the
    bucketed scan; pin it on (the plan then shows
    'SelectedBucketsCount: 1 out of N' for term = 'x' filters)."""
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    return spark.table(table)
