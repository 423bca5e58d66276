"""Input connectors — the reference's ingest surfaces as Spark readers.

Reference surfaces → readers here:
- add-url endpoint / seed lists (``PageAddUrl.cpp``) → ``read_seeds``:
  plain text (one URL per line, '#' comments), CSV (url[,added_time]),
  JSON lines
- injection (``PageInject.cpp``: URL + content supplied directly)
  → ``read_inject_docs``: JSONL of {doc_id, spans[...]} in the
  interleaved-span shape
- the crawl corpus itself is parquet (TESTDATA / corpus.py)

All readers enforce fixed schemas (no inference — the engine is
dynamic-schema-free like the reference's packed structs, SURVEY §1.4) and
normalize into the exact DataFrames the pipeline consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import DOCS, SEEDS

DEFAULT_ADDED_TIME = 1_700_000_000


def read_seeds(spark: SparkSession, path: str, fmt: str = "auto",
               added_time: int = DEFAULT_ADDED_TIME) -> DataFrame:
    """Seed list → DataFrame(url string, added_time long)."""
    if fmt == "auto":
        low = path.lower()
        if low.endswith((".txt", ".urls")):
            fmt = "text"
        elif low.endswith(".csv"):
            fmt = "csv"
        elif low.endswith((".json", ".jsonl", ".ndjson")):
            fmt = "json"
        elif low.endswith(".parquet"):
            fmt = "parquet"
        else:
            fmt = "text"
    if fmt == "text":
        raw = spark.read.text(path)
        return (raw.select(F.trim("value").alias("url"))
                .filter((F.length("url") > 0) & ~F.col("url").startswith("#"))
                .withColumn("added_time", F.lit(added_time).cast("long")))
    if fmt == "csv":
        schema = T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("added_time", T.LongType()),
        ])
        df = spark.read.schema(schema).option("header", "true").csv(path)
        return df.withColumn(
            "added_time",
            F.coalesce("added_time", F.lit(added_time)).cast("long"))
    if fmt == "json":
        df = spark.read.schema(SEEDS).json(path)
        return df.withColumn(
            "added_time",
            F.coalesce("added_time", F.lit(added_time)).cast("long"))
    if fmt == "parquet":
        return spark.read.parquet(path).select("url", "added_time")
    raise ValueError(f"unknown seed format: {fmt}")


def read_inject_docs(spark: SparkSession, path: str) -> DataFrame:
    """Injected documents (JSONL: {"doc_id": url, "spans": [{kind, text,
    media_ref, offset}]}) → the interleaved docs schema, span order
    validated (strictly increasing offsets)."""
    df = spark.read.schema(DOCS).json(path)
    ordered = df.withColumn(
        "spans", F.array_sort(
            "spans", lambda a, b: F.when(a["offset"] < b["offset"], -1)
            .when(a["offset"] > b["offset"], 1).otherwise(0)))
    return ordered.filter(F.col("doc_id").isNotNull()
                          & (F.size("spans") > 0))


def read_docs_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Interleaved docs table from parquet with the fixed schema."""
    return spark.read.schema(DOCS).parquet(path)
