"""Deterministic release of executor/driver block-manager memory.

Spark frees ``localCheckpoint()`` blocks only when the JVM garbage
collector happens to collect the RDD object (ContextCleaner holds weak
references) — through py4j that can lag the Python-side release by an
unbounded amount, so an iterative pipeline that checkpoints every round
(Bloom URL-seen state, PageRank supersteps, connected components)
accumulates superseded block sets until the driver heap fills.  These
helpers make the release explicit: the moment a checkpoint is
superseded, its blocks are dropped from the block manager.

A released DataFrame is UNUSABLE (a local checkpoint truncates lineage,
so the blocks cannot be recomputed) — only ever release state that has
been fully replaced by a newer, already-materialized checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame | None) -> None:
    """Drop the block-manager blocks behind a ``localCheckpoint()``-ed
    DataFrame.  No-op for ``None`` or non-checkpoint plans.  The frame
    must not be used afterwards."""
    if df is None:
        return
    try:
        # the analyzed plan of a checkpointed Dataset is a LogicalRDD
        # wrapping the materialized RDD; unpersist frees its blocks
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        # not a LogicalRDD (not a checkpoint) or session already gone —
        # nothing to free
        pass


def safe_unpersist(df: DataFrame | None) -> None:
    """Unpersist a ``.cache()``/``.persist()``-ed DataFrame, ignoring a
    stopped session.  Unlike a checkpoint release this is always safe:
    the frame stays usable and simply recomputes if referenced again."""
    if df is None:
        return
    try:
        df.unpersist()
    except Exception:
        pass
