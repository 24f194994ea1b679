"""Windowed aggregation operators (SURVEY §2.4 A1-A6).

The reference's windows are processing-time assigners over record streams
(TumblingProcessingTimeWindows 5s — MapCountPrinter.java:24; sliding 10s/5s —
WindowingOperations.java:84-86; ProcessingTimeSessionWindows gap 5s —
WindowingOperations.java:123; TumblingEventTimeWindows 1s —
EventTimeOperations.java:158; keyed 10s tumbling — CourseUseCase.java:103).
Its only aggregate functions are sum/count/min/max via ``reduce``.

Spark-first: batch forms use the native ``window()`` / ``session_window()``
expressions over an exact epoch-ms column (LongType, integer arithmetic — the
DuckDB oracle computes the same buckets with ``epoch_ms(ts)``); streaming forms
reuse the same expressions on a streaming DataFrame (see ``streaming/``), with
``current_timestamp()`` stamped as arrival time when processing-time semantics
are wanted. Catalyst handles partial/final aggregation; the groupBy keys hash-
shuffle exactly once, and AQE coalesces the post-shuffle partitions — this plan
is the one you want at 100 TB (no per-record state, no driver loops).

All outputs expose window bounds as epoch-ms BIGINT (``unix_millis``) so the
oracle hash comparison never touches timestamp formatting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def event_time(ts_ms: str | Column) -> Column:
    """Exact ms-precision TimestampType from an epoch-ms LongType column."""
    col = F.col(ts_ms) if isinstance(ts_ms, str) else ts_ms
    return F.timestamp_millis(col)


def tumbling_agg(df: DataFrame, ts_ms: str, size_ms: int,
                 keys: Sequence[str] = (), aggs: Sequence[Column] = (),
                 window_col: str = "window_start_ms") -> DataFrame:
    """A1/A5/A6: tumbling window (global when ``keys`` is empty) + aggregates.

    window_start = floor(ts_ms / size) * size — identical to the SQL oracle's
    integer arithmetic and to Spark's epoch-aligned ``window()``.
    """
    w = F.window(event_time(ts_ms), f"{size_ms} milliseconds")
    out = df.groupBy(w.alias("w"), *keys).agg(*aggs)
    return out.select(F.unix_millis("w.start").alias(window_col), *keys,
                      *[F.col(c) for c in out.columns if c not in ("w", *keys)])


def sliding_agg(df: DataFrame, ts_ms: str, size_ms: int, slide_ms: int,
                keys: Sequence[str] = (), aggs: Sequence[Column] = (),
                window_col: str = "window_start_ms") -> DataFrame:
    """A3: sliding window — each row lands in size/slide epoch-aligned windows.

    Spark's ``window(ts, size, slide)`` expands rows JVM-side (no Python); the
    oracle enumerates the same hop offsets with a small cross join.
    """
    w = F.window(event_time(ts_ms), f"{size_ms} milliseconds", f"{slide_ms} milliseconds")
    out = df.groupBy(w.alias("w"), *keys).agg(*aggs)
    return out.select(F.unix_millis("w.start").alias(window_col), *keys,
                      *[F.col(c) for c in out.columns if c not in ("w", *keys)])


def session_agg(df: DataFrame, ts_ms: str, gap_ms: int,
                keys: Sequence[str] = (), aggs: Sequence[Column] = (),
                window_col: str = "session_start_ms") -> DataFrame:
    """A4: session window (gap-based). ``session_window`` merges events closer
    than ``gap`` into one session per key — the oracle reproduces it with the
    classic gaps-and-islands SQL (lag + running sum of gap-breaks).

    Note the boundary convention: events exactly ``gap`` apart MERGE into one
    session — Spark merges adjacent windows ([t, t+gap] touching the next
    event's start counts as overlap) — so the oracle's break condition is
    strictly ``ts - prev > gap``.
    """
    w = F.session_window(event_time(ts_ms), f"{gap_ms} milliseconds")
    out = df.groupBy(w.alias("w"), *keys).agg(*aggs)
    return out.select(F.unix_millis("w.start").alias(window_col), *keys,
                      *[F.col(c) for c in out.columns if c not in ("w", *keys)])


def running_reduce(df: DataFrame, keys: Sequence[str], order_by: Sequence[str],
                   value: str, out_col: str = "running_total") -> DataFrame:
    """A2 batch analog: keyBy(user).reduce(sum) emits a cumulative total per
    key on every record (KeyedStreamOperations.java:67-68). Batch equivalent:
    a running-sum window frame; streaming equivalent: groupBy().sum() in
    update output mode (see streaming/pipelines.py).
    """
    w = (W.partitionBy(*keys).orderBy(*order_by)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return df.withColumn(out_col, F.sum(value).over(w))


def trailing_agg(df: DataFrame, keys: Sequence[str], ts_ms: str,
                 trail_ms: int, value: str) -> DataFrame:
    """Per-ROW trailing window features: for every event, the count/sum/mean
    of the key's events in the last ``trail_ms`` milliseconds INCLUDING it —
    the "7-day rolling activity" feature-engineering primitive that tumbling
    windows can't express (every row gets its own window end).

    RANGE frame on the epoch-ms ordering, so co-timestamped rows (range
    peers) correctly see each other regardless of tie order — which also
    makes the result deterministic without a unique tiebreak column. One
    shuffle on the key; the frame scan is the per-partition sorted pass
    Spark's WindowExec does natively (no self-join, no explode).

    Output: keys, ts_ms, value, trail_cnt, trail_sum_e4, trail_avg.
    """
    if trail_ms < 0:
        raise ValueError(f"trail_ms must be >= 0, got {trail_ms}")
    val_e4 = F.round(F.col(value) * 10_000).cast("bigint")
    w = (W.partitionBy(*keys).orderBy(F.col(ts_ms).cast("long"))
          .rangeBetween(-trail_ms, 0))
    return (df.select(*keys, F.col(ts_ms), F.col(value),
                      val_e4.alias("_v_e4"))
              .withColumn("trail_cnt", F.count(F.lit(1)).over(w))
              .withColumn("trail_sum_e4", F.sum("_v_e4").over(w))
              .withColumn("trail_avg",
                          F.round(F.col("trail_sum_e4")
                                  / F.col("trail_cnt") / 1e4, 6))
              .drop("_v_e4"))


def sessionize(df: DataFrame, keys: Sequence[str], ts_ms: str,
               gap_ms: int, order_by: Sequence[str] = ()) -> DataFrame:
    """Per-EVENT session assignment: every row gets its key's session_start
    (the session id) plus its ordinal inside the session — the labeling
    primitive behind session_agg's aggregates (a4), needed whenever
    downstream wants the events themselves grouped, not collapsed.

    Gaps-and-islands in one key-partition window pass: a session breaks
    where ``ts - prev_ts > gap_ms`` (strictly — ties and exact-gap spacing
    merge, matching ``session_window``'s merge rule); the running sum of
    break flags is the island ordinal, and the island's min ts is the
    session id. Two window stages over the SAME partitioning — one shuffle
    total.

    Output: input columns + session_start_ms, event_seq (1-based within
    session).
    """
    order = [F.col(ts_ms).cast("long"), *[F.col(c) for c in order_by]]
    wo = W.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts_ms).cast("long")).over(wo)
    brk = F.when(prev.isNull()
                 | (F.col(ts_ms).cast("long") - prev > gap_ms), 1) \
           .otherwise(0)
    with_island = df.withColumn("_isl", F.sum(brk).over(
        wo.rowsBetween(W.unboundedPreceding, W.currentRow)))
    wi = W.partitionBy(*keys, "_isl")
    return (with_island
            .withColumn("session_start_ms",
                        F.min(F.col(ts_ms).cast("long")).over(wi))
            .withColumn("event_seq",
                        F.row_number().over(
                            W.partitionBy(*keys, "_isl").orderBy(*order)))
            .drop("_isl"))


def sessionize_dynamic(df: DataFrame, keys: Sequence[str], ts_ms: str,
                       gap_ms_expr: Column,
                       order_by: Sequence[str] = ()) -> DataFrame:
    """:func:`sessionize` with a PER-EVENT gap (the dynamic-gap form of
    Spark's ``session_window(col, gap_expression)``): each event extends
    its session ``gap_ms_expr`` (evaluated on that event) forward, so a
    'click' can hold a session open longer than an 'error'.

    Same one-shuffle gaps-and-islands plan; the break test compares each
    gap against the PREVIOUS event's gap value (``lag`` of the
    expression), matching the forward-extension merge rule. Output
    contract identical to :func:`sessionize`.
    """
    order = [F.col(ts_ms).cast("long"), *[F.col(c) for c in order_by]]
    wo = W.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(F.col(ts_ms).cast("long")).over(wo)
    prev_gap = F.lag(gap_ms_expr.cast("long")).over(wo)
    brk = F.when(prev_ts.isNull()
                 | (F.col(ts_ms).cast("long") - prev_ts > prev_gap), 1) \
           .otherwise(0)
    with_island = df.withColumn("_isl", F.sum(brk).over(
        wo.rowsBetween(W.unboundedPreceding, W.currentRow)))
    wi = W.partitionBy(*keys, "_isl")
    return (with_island
            .withColumn("session_start_ms",
                        F.min(F.col(ts_ms).cast("long")).over(wi))
            .withColumn("event_seq",
                        F.row_number().over(
                            W.partitionBy(*keys, "_isl").orderBy(*order)))
            .drop("_isl"))
