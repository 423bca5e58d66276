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


def test_detector_catches_label_blocked_allpairs(spark):
    """The quadratic-in-disguise shape: applyInPandas grouped ONLY by
    fixture label columns (VERDICT r3 item 2)."""
    import pandas as pd

    df = spark.createDataFrame(
        [(1, "web", "en"), (2, "web", "en")], ["doc_id", "source", "lang"])

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf[["doc_id"]]

    bad = df.groupBy("source", "lang").applyInPandas(
        _kernel, schema="doc_id long")
    assert "label_blocked_allpairs" in audit_plan(_plan(bad))
    # LSH-style block keys are fine even when a label column rides along
    ok = (df.withColumn("bucket", df.doc_id % 4)
          .groupBy("bucket").applyInPandas(_kernel, schema="doc_id long"))
    assert "label_blocked_allpairs" not in audit_plan(_plan(ok))


def test_pair_dedup_catalog_names_resolve_to_lsh_plans(spark):
    """No driver sf increase may ever select an O(n^2) pair plan: the
    PLAIN pair-dedup names must be the LSH-blocked plans (their physical
    plans group on derived band/bucket keys, not label columns)."""
    from open_source_search_engine_spark.queries import QUERIES
    sf_dir = "/root/testdata/sf0.001"
    assert (QUERIES["dedup_ngram_jaccard_pairs"]
            is QUERIES["dedup_ngram_jaccard_pairs_lsh"])
    for key in ("dedup_ngram_jaccard_pairs", "dedup_embed_cosine_pairs"):
        plan = _plan(QUERIES[key](spark, sf_dir))
        assert "label_blocked_allpairs" not in audit_plan(plan), key
    # the embed plan's quadratic kernel must be keyed on (band, bucket)
    embed_plan = _plan(QUERIES["dedup_embed_cosine_pairs"](spark, sf_dir))
    m = [g for g in embed_plan.splitlines() if "FlatMapGroupsInPandas" in g]
    assert m and "band" in m[0] and "bucket" in m[0], embed_plan


@pytest.mark.slow
def test_catalog_plans_are_hazard_free(spark, monkeypatch):
    # lazy mode: without it the dsir/semdedup entries localCheckpoint
    # eagerly and the audit would see only "Scan ExistingRDD" for them
    # (no hazard coverage upstream of the checkpoint)
    monkeypatch.setenv("OSSE_PLAN_LAZY", "1")
    from open_source_search_engine_spark.queries import QUERIES
    sf_dir = "/root/testdata/sf0.001"
    failures = {}
    for k in sorted(QUERIES):
        hazards = [h for h in audit_plan(_plan(QUERIES[k](spark, sf_dir)))
                   if h not in WHITELIST.get(k, {})]
        if hazards:
            failures[k] = hazards
    assert failures == {}


def test_plan_lazy_exposes_checkpointed_lineage(spark, monkeypatch):
    """The audit must see the REAL dsir/semdedup plans, not the
    checkpoint scan their execution default hands back."""
    from open_source_search_engine_spark.queries import QUERIES
    sf_dir = "/root/testdata/sf0.001"
    monkeypatch.setenv("OSSE_PLAN_LAZY", "1")
    # the corpus lineage (parquet scan) must be visible; a checkpointed
    # result would show ONLY a Scan ExistingRDD root.  (A bounded model
    # table — the n_buckets-row logratio relation — legitimately appears
    # as a local-relation scan inside the plan.)
    plan = _plan(QUERIES["dsir_importance_select"](spark, sf_dir))
    assert "parquet" in plan, plan
    plan = _plan(QUERIES["dedup_semantic_keepers"](spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan
