"""F14 budget sharding (scale.apply_wave_budgets): the sharded form must be
semantics-preserving at n_shards=1 and budget-correct per shard otherwise."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from open_source_search_engine_spark.pipeline.scale import (
    apply_wave_budgets, budget_shard_col, salted_topk_per_key)


def _frontier(spark, n=400, n_ips=10):
    return (spark.range(n)
            .withColumn("uh48", (F.col("id") * 2654435761) % (1 << 30))
            .withColumn("first_ip", 167772160 + F.col("id") % n_ips)
            .withColumn("priority", (100 - F.col("id") % 9).cast("int"))
            .withColumn("hop_count", (F.col("id") % 5).cast("int"))
            .withColumn("eligible_ms", F.lit(0).cast("long"))
            .withColumn("ufn", (F.col("id") % 3).cast("int"))
            .withColumn("max_per_rule", F.lit(20)))


def _order():
    return [F.desc("priority"), F.asc("hop_count"),
            F.asc("eligible_ms"), F.asc("uh48")]


def test_unsharded_matches_plain_windows(spark):
    """n_shards=1 == the pre-sharded formulation (rule window partitioned
    only by ufn, global cap on one queue) row for row."""
    sel = _frontier(spark)
    got = apply_wave_budgets(sel, _order(), global_cap=50,
                             rule_budget_col="max_per_rule").collect()
    w_rule = Window.partitionBy("ufn").orderBy(*_order())
    w_glob = Window.partitionBy(F.lit(0)).orderBy(*_order())
    ref = (sel.withColumn("rr", F.row_number().over(w_rule))
           .filter(F.col("rr") <= F.col("max_per_rule")).drop("rr")
           .withColumn("gseq", F.row_number().over(w_glob))
           .filter(F.col("gseq") <= 50)
           .withColumn("seq_in_round", F.col("gseq") - 1)
           .drop("gseq").collect())
    key = lambda r: r["seq_in_round"]
    assert sorted([r.asDict() for r in got], key=key) == \
        sorted([r.asDict() for r in ref], key=key)


def test_sharded_budgets_respected(spark):
    """n_shards=4: each scheduling shard independently enforces
    budget/n_shards for the global cap and per-rule budget, and
    seq_in_round is a dense global 0..n-1 in wave order."""
    sel = _frontier(spark, n=800, n_ips=40).cache()
    n_shards, global_cap = 4, 80
    wave = apply_wave_budgets(sel, _order(), global_cap=global_cap,
                              rule_budget_col="max_per_rule",
                              n_shards=n_shards)
    got = (wave.withColumn("shard", budget_shard_col("first_ip", n_shards))
           .collect())
    assert len(got) <= global_cap
    seqs = sorted(r["seq_in_round"] for r in got)
    assert seqs == list(range(len(got)))
    per_shard, per_shard_rule = {}, {}
    for r in got:
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + 1
        k = (r["shard"], r["ufn"])
        per_shard_rule[k] = per_shard_rule.get(k, 0) + 1
    assert all(v <= global_cap // n_shards for v in per_shard.values())
    assert all(v <= max(1, 20 // n_shards) for v in per_shard_rule.values())
    sel.unpersist()


def test_sharded_equals_unsharded_when_budgets_slack(spark):
    """With non-binding budgets the sharded plan must select exactly the
    same rows (sharding only changes WHERE budget cuts land)."""
    sel = _frontier(spark, n=120, n_ips=6).cache()
    a = apply_wave_budgets(sel, _order(), global_cap=10_000,
                           rule_budget_col=None, n_shards=1).collect()
    b = apply_wave_budgets(sel, _order(), global_cap=10_000,
                           rule_budget_col=None, n_shards=4).collect()
    key = lambda r: r["seq_in_round"]
    assert sorted([r.asDict() for r in a], key=key) == \
        sorted([r.asDict() for r in b], key=key)
    sel.unpersist()


def test_salted_topk_feeds_budgets(spark):
    """End-to-end wave shape: salted per-IP top-K then sharded budgets —
    no row exceeds its per-IP rank K."""
    sel = _frontier(spark, n=600, n_ips=12)
    topk = salted_topk_per_key(sel, "first_ip", _order(), k=5,
                               rank_name="ip_rn")
    wave = apply_wave_budgets(topk, _order(), global_cap=40, n_shards=2)
    rows = wave.collect()
    assert rows and all(r["ip_rn"] <= 5 for r in rows)


def test_rebalance_sharded(spark, tmp_path):
    """Rebalance.cpp analogue: growing the shard count moves only
    foreign rows; re-running is a no-op; every row lands on its
    spider_shard under the new count."""
    from pyspark.sql import functions as F
    from open_source_search_engine_spark.pipeline.scale import (
        rebalance_sharded, spider_shard_col)

    d = str(tmp_path / "tbl")
    base = spark.range(2000).select(
        (F.col("id") * 2654435761 % 4294967291).cast("long")
        .alias("first_ip"),
        F.col("id").alias("payload"))
    (base.withColumn("shard", spider_shard_col("first_ip", 8))
     .write.mode("overwrite").partitionBy("shard").parquet(d))

    # no-op at the same count
    r0 = rebalance_sharded(spark, d, 8)
    assert r0["foreign"] == 0 and r0["shards_touched"] == 0

    r1 = rebalance_sharded(spark, d, 32)
    assert r1["scanned"] == 2000 and r1["foreign"] > 0

    after = spark.read.parquet(d)
    assert after.count() == 2000
    bad = after.filter(
        F.col("shard") != spider_shard_col("first_ip", 32)).count()
    assert bad == 0
    assert after.select("payload").distinct().count() == 2000

    # idempotent
    r2 = rebalance_sharded(spark, d, 32)
    assert r2["foreign"] == 0
