"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship wave-assembly query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator catalog
(open_source_search_engine_spark/queries.py) — every SQL-expressible
operator carries a DuckDB oracle; the tabulation-hash / URL-normalize /
robots / MinHash / SimHash / LSH kernels are rows-only here and pinned
exactly by the pytest reference-vector and oracle-parity suites.
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
