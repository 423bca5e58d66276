"""Link-graph tier — the Linkdb analogue plus an explicit PageRank.

Reference shape: Linkdb stores one key per (linkee, linker) pair
(``Linkdb.cpp`` key layout, ``Linkdb.h:78-200``); ``Msg25`` walks a
linkee's termlist summing inlinker counts/quality into the LinkInfo the
spider and ranker read (``m_siteNumInlinks``, ``m_pageNumInlinks`` —
Spider.h request fields, fed via ``getSiteNumInlinks``).  Gigablast's
"siteRank"/quality boost is an inlink-derived score over that graph.

Spark shape:
- the link graph IS a DataFrame ``edges(src, dst)`` — one row per
  distinct link, the Linkdb key pair as columns;
- inlink aggregation (Msg25) is one ``groupBy("dst")``;
- rank propagation is the join-per-superstep Pregel pattern: each
  iteration joins ranks to edges on ``src`` (one hash exchange, AQE
  re-plans skewed hubs), floor-divides each page's rank over its
  out-degree, and sums shares by ``dst``.  At cluster scale,
  pre-partition ``edges`` by ``src`` once and every superstep reuses
  that partitioning; checkpoint ranks every few supersteps to cut
  lineage.

Integer arithmetic, deliberately: ranks are scaled BIGINTs
(``RANK_SCALE`` per node at start) and every operation is integer
multiply / floor-divide / sum.  BIGINT addition is exact and
associative, so the result is bit-identical across engines, partition
counts, and summation orders — a float PageRank is not reproducible
enough to value-hash against an oracle (and at 10^10 nodes,
non-reproducible ranking signals are an operational hazard).  Dangling
nodes (no outlinks) simply drop their mass — same convention each
iteration, both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000          # initial integer rank per node
DAMP_NUM, DAMP_DEN = 85, 100        # damping 0.85 as a ratio
BASE_SHARE = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN  # (1-d) term


def inlink_counts(edges: DataFrame) -> DataFrame:
    """Msg25 aggregation: distinct inlinkers per linkee.

    ``edges(src, dst)`` → ``(dst, n_inlinks)``; feed site-level counts by
    mapping src/dst to site ids first (the reference keeps both page- and
    site-keyed Linkdb lists)."""
    return (edges.groupBy("dst")
            .agg(F.count_distinct("src").alias("n_inlinks")))


def pagerank(edges: DataFrame, nodes: DataFrame | None = None,
             n_iter: int = 3, checkpoint_every: int = 0) -> DataFrame:
    """Integer-arithmetic PageRank over ``edges(src, dst)``.

    ``nodes``: one ``node`` column; defaults to distinct src ∪ dst.
    Returns ``(node, rank)`` — scaled BIGINTs, deterministic.

    rank_0(v)   = RANK_SCALE
    rank_i+1(v) = BASE_SHARE
                + (DAMP_NUM * Σ_{u→v} (rank_i(u) div outdeg(u))) div DAMP_DEN

    Lazy by default: a few supersteps stay one fused Catalyst plan (the
    identical edges⨝deg subtree is a ReusedExchange, no per-iteration
    job).  For deep iteration set ``checkpoint_every`` — ranks are
    localCheckpoint()ed every K supersteps to truncate lineage — and
    cache ``edges`` yourself so the scan isn't repeated."""
    edges = edges.select("src", "dst").distinct()
    if nodes is None:
        nodes = (edges.select(F.col("src").alias("node"))
                 .unionByName(edges.select(F.col("dst").alias("node")))
                 .distinct())
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # shares ride on the edge rows: one join per superstep, on src
    edges_deg = edges.join(deg, "src")
    ranks = nodes.withColumn("rank", F.lit(RANK_SCALE).cast("long"))
    last_ck = None
    for i in range(n_iter):
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("rank div deg").alias("share"))
            .groupBy("dst").agg(F.sum("share").alias("inflow")))
        ranks = (nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
                 .select(
                     "node",
                     (F.lit(BASE_SHARE)
                      + F.expr(f"{DAMP_NUM} * coalesce(inflow, 0) "
                               f"div {DAMP_DEN}"))
                     .cast("long").alias("rank")))
        if checkpoint_every and (i + 1) % checkpoint_every == 0 \
                and i + 1 < n_iter:
            from ..memutil import release_local_checkpoint
            ranks = ranks.localCheckpoint(eager=True)
            # the previous superstep's checkpoint is now fully
            # superseded — drop its blocks instead of waiting on JVM GC
            # (deep iteration otherwise accumulates one block set per K
            # supersteps); the LAST checkpoint stays alive because the
            # returned plan reads from it
            release_local_checkpoint(last_ck)
            last_ck = ranks
    return ranks
