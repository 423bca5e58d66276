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


def write_training_shards(docs: DataFrame, out_dir: str,
                          shard_size: int, seed: int = 0,
                          id_col: str = "doc_id") -> DataFrame:
    """Materialize the training corpus as deterministic shuffled shards:
    shard ``i`` holds exactly the docs at shuffled positions
    ``[i*shard_size, (i+1)*shard_size)`` — the layout a data loader
    expects (fixed-size files, global order reproducible from the seed
    alone, any run/cluster size producing byte-identical shard
    membership; see ``training.shuffle``).

    Writes ``out_dir`` partitioned by shard (partition pruning gives a
    loader O(1) access to any shard) with rows pre-sorted by position,
    and returns the shard manifest (shard, n_docs, pos_min, pos_max) —
    bounded at n_docs/shard_size rows."""
    from pyspark.sql import functions as F

    from ..training.shuffle import shuffle_positions

    pos = shuffle_positions(docs, seed=seed, id_col=id_col)
    placed = (docs.join(pos.withColumnRenamed("doc_id", id_col), id_col)
              .withColumn("shard",
                          (F.col("position") / shard_size).cast("long")))
    (placed.repartition("shard")
     .sortWithinPartitions("position")
     .write.mode("overwrite").partitionBy("shard").parquet(out_dir))
    return (placed.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.min("position").alias("pos_min"),
                 F.max("position").alias("pos_max"))
            .orderBy("shard"))
