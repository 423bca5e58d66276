"""Skew- and scale-handling primitives (north rule: explicit partitioning /
shuffle / skew handling for a 10^10-URL frontier).

The hazard: winner selection (F11) partitions by ``first_ip``, and real
frontiers have mega-hosts owning 30%+ of all URLs (the reference degrades
them via the overflow list, SpiderColl.cpp:3319-3397).  A plain Window over
``first_ip`` serializes the mega-host into one task.  Fix: **salted two-phase
top-K**, which is *exactly* equivalent to the single Window:

  phase 1: Window over (first_ip, salt) keeps top-K per salt shard
           → parallel sorts, each ≤ |ip| / S rows
  phase 2: Window over first_ip on the ≤ S·K survivors keeps top-K

The global per-IP top-K is always contained in the union of per-salt top-Ks
(any row in the global top-K is also within the top-K of its own salt
shard), so phase 2 sees every winner — identical output, bounded task size.

Also here: the overflow guard (F27) and a salted repartition helper for
writes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import OVERFLOW_REQUESTS_PER_IP


def salted_topk_per_key(df: DataFrame, key: str, order: list[Column],
                        k: int | Column,
                        salt_col: str | Column = "uh48", n_salts: int = 32,
                        rank_name: str = "ip_rn") -> DataFrame:
    """Top-k rows per ``key`` by ``order``, mega-key-safe.  Returns df with
    ``rank_name`` (1-based rank within key).  Exact — see module docstring.

    ``k`` may be an int or a Column that is CONSTANT within each key
    (e.g. a per-key cap joined in from a broadcast caps table) — the
    salted prune stays exact because every salt shard of a key prunes to
    the same k, so the union of per-salt top-ks still contains the
    per-key top-k.  ``salt_col`` may be a column name (salted as
    ``col % n_salts``) or a ready salt Column (``n_salts`` then unused).
    Shared by F11 winner selection, dkmeans' bounded per-cell training
    sample, and semdedup's oversized-cluster split sample."""
    k_col = k if isinstance(k, Column) else F.lit(k)
    salt = (salt_col if isinstance(salt_col, Column)
            else (F.col(salt_col) % n_salts).cast("int"))
    w1 = Window.partitionBy(F.col(key), salt).orderBy(*order)
    pruned = (df.withColumn("_srn", F.row_number().over(w1))
              .filter(F.col("_srn") <= k_col)
              .drop("_srn"))
    w2 = Window.partitionBy(key).orderBy(*order)
    return (pruned.withColumn(rank_name, F.row_number().over(w2))
            .filter(F.col(rank_name) <= k_col))


def spider_shard_col(ip_col: str, n_shards: int) -> Column:
    """The F4 scheduling-shard id as a Column: ``hash32h(firstIp, 0x123456)
    % n_shards`` (Hostdb.cpp:1745-1752) via the vectorized tabulation hash."""
    import pandas as pd
    from pyspark.sql import types as T

    from ..functions.ghash import spider_shard

    def _shard(ips):
        return pd.Series(spider_shard(ips.to_numpy(), n_shards),
                         dtype="int32")

    return F.pandas_udf(_shard, T.IntegerType())(F.col(ip_col))


def budget_shard_col(ip_col: str, n_shards: int) -> Column:
    """Deterministic IP→shard key for BUDGET splitting, JVM-side
    (Murmur3).  The reference semantics being mirrored are "budgets are
    enforced per scheduling shard" — WHICH shard an IP lands on is
    cluster-layout detail, so the hot path avoids the Python tabulation
    UDF (that exact hash32h mapping is the F4 catalog operator,
    ``spider_shard_col``); what matters is a deterministic, uniform,
    per-IP-stable key."""
    return F.pmod(F.hash(F.col(ip_col)), F.lit(n_shards)).cast("int")


def apply_wave_budgets(sel: DataFrame, order: list[Column], global_cap: int,
                       rule_budget_col: str | None = None,
                       n_shards: int = 1) -> DataFrame:
    """F14 launch budgets, scale-shaped.  The reference enforces the
    per-rule budget (maxSpidersPerRule) and the global MAX_SPIDERS cap per
    host-local doledb shard (Hostdb.cpp:1761-1765; SpiderLoop.cpp:683-731)
    — each scheduling shard owns its own slice of the budget.  Here:

    - ``n_shards=1``: single-queue semantics, byte-identical to the
      reference fixture (and to the pre-sharded plan).
    - ``n_shards>1``: both windows partition by ``spider_shard(first_ip)``
      (F4) and each shard gets ``budget // n_shards`` — no window ever
      sorts an unbounded single partition, which is what survives a
      10^8-IP frontier.

    Returns the budget-filtered rows with 0-based ``seq_in_round`` in
    global ``order``.  The final sequencing window is a single partition
    **by construction bounded at global_cap rows** (it runs after the
    caps), i.e. a constant-size sort like TakeOrderedAndProject."""
    if n_shards <= 1:
        shard = F.lit(0)
        rule_budget = F.col(rule_budget_col) if rule_budget_col else None
        shard_cap = global_cap
    else:
        shard = budget_shard_col("first_ip", n_shards)
        rule_budget = (F.greatest(F.lit(1),
                                  F.floor(F.col(rule_budget_col) / n_shards))
                       if rule_budget_col else None)
        shard_cap = max(1, global_cap // n_shards)
    sel = sel.withColumn("_shard", shard)
    if rule_budget is not None:
        w_rule = Window.partitionBy("_shard", "ufn").orderBy(*order)
        sel = (sel.withColumn("_rule_rn", F.row_number().over(w_rule))
               .filter(F.col("_rule_rn") <= rule_budget).drop("_rule_rn"))
    w_shard = Window.partitionBy("_shard").orderBy(*order)
    sel = (sel.withColumn("_gseq", F.row_number().over(w_shard))
           .filter(F.col("_gseq") <= shard_cap).drop("_gseq"))
    # global sequencing over the <= global_cap surviving rows: a single
    # partition, but BOUNDED by construction (it runs after the caps), so
    # Spark's "no partition defined" warning is a constant-size sort here
    # — the TakeOrderedAndProject shape, not an unbounded frontier sort.
    w_seq = Window.partitionBy(F.lit(0)).orderBy(*order)
    return (sel.withColumn("seq_in_round", F.row_number().over(w_seq) - 1)
            .drop("_shard"))


def overflow_ips(requests: DataFrame,
                 threshold: int = OVERFLOW_REQUESTS_PER_IP) -> DataFrame:
    """F27: IPs whose pending request count exceeds the overflow threshold
    (10M in the reference); new outlinks from them are dropped at ingest."""
    return (requests.groupBy("first_ip").count()
            .filter(F.col("count") > threshold)
            .select("first_ip", F.lit(True).alias("overflow")))


def drop_overflow_ingest(new_requests: DataFrame,
                         overflow: DataFrame) -> DataFrame:
    """Filter ingest against the (tiny, broadcast) overflow list — the batch
    analogue of SpiderColl.cpp:2488-2511's check."""
    return new_requests.join(F.broadcast(overflow.select("first_ip")),
                             "first_ip", "left_anti")


def repartition_by_ip_salted(df: DataFrame, n_partitions: int,
                             hot_threshold: int = 1_000_000) -> DataFrame:
    """Repartition by first_ip but shard any single IP across partitions
    with a salt — keeps writes/shuffles balanced when one IP dominates.
    Readers that need per-IP locality re-aggregate; for the frontier log
    (append-only, later window'd with salted_topk_per_key) this is free."""
    return df.repartition(n_partitions, F.col("first_ip"),
                          (F.col("uh48") % 16).cast("int"))


def rebalance_sharded(spark, table_dir: str, n_shards_new: int,
                      ip_col: str = "first_ip") -> dict:
    """Shard-count migration (Rebalance.cpp): after the cluster grows
    from N to M shards, scan a `shard=K/` partitioned table, find the
    FOREIGN rows (stored shard != ``spider_shard(ip, M)``), and move
    only those — correctly-placed rows are rewritten in place per
    affected partition, never shuffled.

    The reference scans every rdb record, compares the record's
    key-derived shard with the host's (Rebalance.cpp scan loop), and
    forwards foreign records via Msg4 before deleting them locally;
    the Spark shape is the same two phases: a shuffle-free foreign
    scan/count (the 'needsRebalance' verdict, Rebalance.cpp:
    m_needsRebalance), then one exchange of ONLY the foreign rows.

    Returns {"scanned": n, "foreign": n, "shards_touched": n}."""
    import os
    import shutil

    from pyspark.sql import functions as F

    df = spark.read.parquet(table_dir)   # shard=K partition column
    want = spider_shard_col(ip_col, n_shards_new)
    tagged = df.withColumn("_want", want)
    stats = tagged.select(
        F.count("*").alias("scanned"),
        F.sum((F.col("shard") != F.col("_want")).cast("long"))
        .alias("foreign")).collect()[0]
    if stats["foreign"] == 0:
        return {"scanned": stats["scanned"], "foreign": 0,
                "shards_touched": 0}
    # shards that lose or gain rows must be rewritten; others untouched
    touched = sorted(
        {r["shard"] for r in tagged
         .filter(F.col("shard") != F.col("_want"))
         .select("shard").distinct().collect()}
        | {r["_want"] for r in tagged
           .filter(F.col("shard") != F.col("_want"))
           .select("_want").distinct().collect()})
    out = (tagged.filter(F.col("shard").isin(touched)
                         | F.col("_want").isin(touched))
           .withColumn("shard", F.col("_want")).drop("_want"))
    tmp = table_dir.rstrip("/") + ".rebalance.tmp"
    (out.repartition(max(len(touched), 1), "shard")
        .write.mode("overwrite").partitionBy("shard").parquet(tmp))
    for s in touched:
        old = os.path.join(table_dir, f"shard={s}")
        new = os.path.join(tmp, f"shard={s}")
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(new):
            shutil.move(new, old)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"scanned": stats["scanned"], "foreign": int(stats["foreign"]),
            "shards_touched": len(touched)}
