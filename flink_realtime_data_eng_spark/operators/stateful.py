"""Keyed-state operators, batch analogs (SURVEY §2.7 ST1/ST2).

Reference ST1 — delete-interval alert: keyed ValueState<Long> holding the last
Delete timestamp per user; a Delete arriving < threshold after the previous one
emits (user, diff) (StatefulOperations.java:87-119). ST2 — session action
machine: two ValueStates (last action, last start); each event emits the
duration of the *previous* action, Logout clears state
(CourseUseCase.java:120-176).

Batch-SQL analogs use ``lag() OVER (PARTITION BY key ORDER BY ts, id)`` — one
hash shuffle on the key, sort within partitions, no driver state; the per-key
sequential dependency is confined to a partition-local sort, which is the plan
a 1000-executor cluster wants. Orderings always include a unique tiebreaker
column so results are deterministic under timestamp collisions. The true
record-at-a-time streaming forms live in ``streaming/stateful.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def interval_alerts(df: DataFrame, key: str, ts_ms: str,
                    event_col: str, match_value: str,
                    threshold_ms: int,
                    order_by: Sequence[str] | None = None) -> DataFrame:
    """ST1: rows of ``match_value`` whose previous ``match_value`` for the same
    key is < threshold_ms earlier. Output: key, <order cols>, diff_ms."""
    order = list(order_by) if order_by else [ts_ms]
    matches = df.filter(F.col(event_col) == match_value)
    w = W.partitionBy(key).orderBy(*order)
    return (matches
            .withColumn("diff_ms", F.col(ts_ms) - F.lag(ts_ms).over(w))
            .filter(F.col("diff_ms") < threshold_ms)
            .select(key, *order, "diff_ms"))


def action_durations(df: DataFrame, key: str, ts_ms: str, action_col: str,
                     session_start: str | None = None,
                     session_end: str | None = None,
                     order_by: Sequence[str] | None = None) -> DataFrame:
    """ST2: per key ordered by time, emit the previous action and the time
    spent in it (current ts - previous ts). A session-fresh event — first per
    key, a ``session_start`` action (Login), or anything right after
    ``session_end`` (Logout cleared state) — reports ('None', 0), matching
    CourseUseCase.java:149-175.

    Output: key, <order cols>, prev_action, duration_ms.
    """
    order = list(order_by) if order_by else [ts_ms]
    w = W.partitionBy(key).orderBy(*order)
    prev_action = F.lag(action_col).over(w)
    prev_ts = F.lag(ts_ms).over(w)
    fresh = prev_action.isNull()
    if session_end is not None:
        fresh = fresh | (prev_action == session_end)
    if session_start is not None:
        fresh = fresh | (F.col(action_col) == session_start)
    return df.select(
        key, *order,
        F.when(fresh, F.lit("None")).otherwise(prev_action).alias("prev_action"),
        F.when(fresh, F.lit(0)).otherwise(F.col(ts_ms) - prev_ts)
         .cast("bigint").alias("duration_ms"),
    )
