"""Gap-based sessionization over the events stream — batch and stateful-
streaming forms of the same semantics.

- ``sessionize_batch``: the classic windowed form (lag → gap flag →
  running session counter → per-session aggregate).  Pure Catalyst,
  ANSI-portable (oracle-checked in queries.py).
- ``sessionize_stream``: the same semantics as a custom stateful operator
  via ``applyInPandasWithState`` (per-user state = open session
  accumulator; processing-time timeout closes idle sessions) — the
  pattern the brief calls out for operators Structured Streaming lacks
  natively.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

GAP_S = 1800  # 30 min session gap


def sessionize_batch(events: DataFrame, gap_s: int = GAP_S) -> DataFrame:
    """events(user_id, ts, value) → one row per session."""
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = (
        events
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (F.col("prev_ts").isNull()
             | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
                > gap_s)).cast("int"))
        .withColumn("session_idx",
                    F.sum("new_session").over(
                        w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (flagged.groupBy("user_id", "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end")))


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_idx", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("session_idx", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("last_ts", T.DoubleType()),
])


def _session_state_fn(key: Tuple[Any, ...], batches: Iterator[pd.DataFrame],
                      state) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState kernel: fold each user's micro-batch events
    into the open session; emit closed sessions."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            idx, n, sv, _ = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": user_id, "session_idx": idx,
                                 "n_events": n, "sum_value": round(sv, 4)}])
        return
    if state.exists:
        idx, n, sv, last = state.get
    else:
        idx, n, sv, last = 0, 0, 0.0, None
    closed = []
    rows = pd.concat(list(batches)).sort_values("ts")
    for _, r in rows.iterrows():
        ts = r["ts"].timestamp()
        if last is not None and ts - last > GAP_S:
            closed.append({"user_id": user_id, "session_idx": idx,
                           "n_events": n, "sum_value": round(sv, 4)})
            idx, n, sv = idx + 1, 0, 0.0
        n += 1
        sv += float(r["value"])
        last = ts
    state.update((int(idx), int(n), float(sv), float(last)))
    state.setTimeoutDuration(60_000)
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming form: per-user open-session state with processing-time
    timeout.  ``events_stream`` must be a streaming DataFrame with
    (user_id, ts timestamp, value)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_state_fn,
                outputStructType=SESSION_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
