"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship wave-assembly query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator catalog
(open_source_search_engine_spark/queries.py).  EVERY entry carries a
DuckDB oracle: SQL-expressible operators run equivalent ANSI SQL, and the
non-SQL kernels (tabulation hash, URL normalizer, robots grammar,
MinHash/SimHash/LSH/winnowing, ANN, summaries) are checked against
committed golden parquet (fixtures/golden/sf0.01) materialized from the
pytest-pinned kernels — see scripts/make_goldens.py.  The f9/f11/f14
frontier entries execute the PRODUCTION compiled ladder / salted top-K /
budget path, with the SQL kept as the oracle side only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from open_source_search_engine_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: F11+F14 wave assembly (per-IP winner selection + global
    budget) over the derived frontier at sf0.001."""
    return QUERIES["f14_wave_caps"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
