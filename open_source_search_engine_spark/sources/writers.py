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
