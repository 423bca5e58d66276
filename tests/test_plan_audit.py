"""Catalog-wide physical-plan hazard audit (scripts/plan_audit.py):
every driver-contract query's plan must be free of row-at-a-time Python
UDFs, cartesian products, and unpartitioned windows (whitelisted
exceptions carry a written justification)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from plan_audit import WHITELIST, audit_plan  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_detector_catches_global_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    df = spark.range(10).withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    assert "unpartitioned_window" in audit_plan(_plan(df))


def test_detector_accepts_partitioned_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    df = spark.range(10).withColumn(
        "rn", F.row_number().over(
            Window.partitionBy(F.col("id") % 5).orderBy("id")))
    assert audit_plan(_plan(df)) == []


def test_detector_catches_cartesian(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = (spark.range(10)
              .crossJoin(spark.range(10).selectExpr("id as b"))
              .filter("id*b>2"))
        assert "cartesian_product" in audit_plan(_plan(df))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


@pytest.mark.slow
def test_catalog_plans_are_hazard_free(spark):
    from open_source_search_engine_spark.queries import QUERIES
    sf_dir = "/root/testdata/sf0.001"
    failures = {}
    for k in sorted(QUERIES):
        hazards = [h for h in audit_plan(_plan(QUERIES[k](spark, sf_dir)))
                   if h not in WHITELIST.get(k, {})]
        if hazards:
            failures[k] = hazards
    assert failures == {}
