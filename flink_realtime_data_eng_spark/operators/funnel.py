"""Event-sequence analytics: funnel conversion and cohort retention.

The product-analytics queries every event pipeline grows (the reference's
browser-event chapter motivates them but never aggregates beyond counts —
/root/reference/src/main/java/com/flinklearn/realtime/chapter6/
CourseUseCase.java:87-119 stops at per-action windows).

Scale shape: both operators hinge on ONE hash-partition by user. The
funnel's ordered-step timestamps are chained conditional-min windows over
the same user partition — Catalyst stacks the Window operators on a single
Exchange, so a 3-step funnel over 100 TB of events still shuffles once.
Retention adds one aggregate on (cohort, week) after the same per-user
window. All arithmetic is integer epoch-week/millis — exact across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F

WEEK_MS = 7 * 24 * 3600 * 1000


def funnel_counts(df: DataFrame, steps: Sequence[str],
                  user_col: str = "user_id", ts_col: str = "ts_ms",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel user counts: a user converts step i when an event of
    ``steps[i]`` happens STRICTLY AFTER their step i-1 conversion time
    (first-touch semantics: the earliest qualifying event per step).

    Output: one row per step — step (1-based), step_name, n_users,
    conversion (fraction of step-1 users still present, 6 dp).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = W.partitionBy(user_col)
    cur = df.select(F.col(user_col), F.col(ts_col).alias("_ts"),
                    F.col(type_col).alias("_tp"))
    prev = None
    tcols = []
    for i, s in enumerate(steps):
        cond = F.col("_tp") == s
        if prev is not None:
            cond = cond & (F.col("_ts") > F.col(prev))
        name = f"_t{i}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col("_ts"))).over(w))
        tcols.append(name)
        prev = name
    per_user = cur.groupBy(user_col).agg(
        *[F.min(t).alias(t) for t in tcols])
    counts = per_user.agg(
        *[F.count(t).alias(f"n{i}") for i, t in enumerate(tcols)])
    rows = [F.struct(F.lit(i + 1).alias("step"),
                     F.lit(s).alias("step_name"),
                     F.col(f"n{i}").alias("n_users"))
            for i, s in enumerate(steps)]
    return (counts.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.step", "r.step_name", "r.n_users")
            .withColumn(
                "conversion",
                F.round(F.col("n_users")
                        / F.max(F.when(F.col("step") == 1, F.col("n_users")))
                           .over(W.partitionBy()), 6))
            .orderBy("step"))


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts_ms",
                      horizon_weeks: int = 12) -> DataFrame:
    """Calendar-week cohort retention: users grouped by the epoch week of
    their FIRST event; for each later week, how many were active.

    Output: cohort_week_ms (cohort week start, epoch ms), week_idx
    (0 = cohort week), n_users. week_idx 0 row doubles as cohort size.
    """
    w = W.partitionBy(user_col)
    with_first = df.select(F.col(user_col), F.col(ts_col).alias("_ts")) \
        .withColumn("_first", F.min("_ts").over(w))
    wk = F.floor(F.col("_ts") / WEEK_MS)
    cwk = F.floor(F.col("_first") / WEEK_MS)
    return (with_first
            .select(F.col(user_col),
                    (cwk * WEEK_MS).cast("bigint").alias("cohort_week_ms"),
                    (wk - cwk).cast("bigint").alias("week_idx"))
            .filter(F.col("week_idx") <= horizon_weeks)
            .groupBy("cohort_week_ms", "week_idx")
            .agg(F.countDistinct(user_col).alias("n_users"))
            .orderBy("cohort_week_ms", "week_idx"))


def sequence_match(df: DataFrame, steps: Sequence[str],
                   within_ms: int | None = None,
                   user_col: str = "user_id", ts_col: str = "ts_ms",
                   type_col: str = "event_type",
                   id_col: str = "event_id") -> DataFrame:
    """CEP-lite pattern detection with STRICT contiguity: emit one match
    per position where a user's consecutive event types equal ``steps``
    exactly (Flink CEP's ``begin().next().next()`` semantics — no events
    in between; the relaxed ``followedBy`` form is :func:`funnel_counts`'
    territory). Optional ``within_ms`` bounds last-minus-first timestamp,
    CEP's ``.within()``.

    One hash-partition by user, ``len(steps)-1`` stacked lead() windows on
    the SAME (user, ts, id) sort — Catalyst collapses them onto a single
    Exchange+Sort, so pattern length adds projection width, not shuffles.
    Overlapping matches are all emitted (each start position judged
    independently), which keeps semantics order-deterministic and
    engine-independent.

    Output: (user, start_ts_ms, end_ts_ms, start_event_id).
    """
    if len(steps) < 2:
        raise ValueError("steps must have at least 2 entries")
    w = W.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    # Window expressions are projected to columns first (Spark rejects
    # window functions inside WHERE), then filtered in one pass.
    cur = df.select(F.col(user_col), F.col(ts_col), F.col(id_col),
                    F.col(type_col),
                    *[F.lead(type_col, i).over(w).alias(f"_t{i}")
                      for i in range(1, len(steps))],
                    F.lead(ts_col, len(steps) - 1).over(w).alias("_end"))
    cond = F.col(type_col) == steps[0]
    for i, s in enumerate(steps[1:], start=1):
        cond = cond & (F.col(f"_t{i}") == s)
    if within_ms is not None:
        cond = cond & (F.col("_end") - F.col(ts_col) <= within_ms)
    return (cur.where(cond)
               .select(F.col(user_col),
                       F.col(ts_col).alias("start_ts_ms"),
                       F.col("_end").alias("end_ts_ms"),
                       F.col(id_col).alias("start_event_id")))


def scd2_intervals(df: DataFrame, key_col: str = "user_id",
                   attr_col: str = "event_type", ts_col: str = "ts_ms",
                   id_col: str = "event_id") -> DataFrame:
    """Slowly-changing-dimension type 2 build from a change log: collapse
    each key's event stream into validity intervals — a row per run of
    equal ``attr_col``, valid from its first event to the next change
    (NULL for the current value). The standard warehouse dimension-build
    over CDC/event feeds.

    One user partition, two window passes (change detection via lag, then
    interval close via lead over the change rows only — the second window
    runs on the already-collapsed change points, a fraction of the input).
    Ties on ts are broken by ``id_col`` so runs are deterministic.

    Output: (key, attr value, valid_from_ms, valid_to_ms NULL-able,
    is_current).
    """
    w = W.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    marked = (df.select(F.col(key_col), F.col(attr_col), F.col(ts_col),
                        F.col(id_col))
              .withColumn("_prev", F.lag(attr_col).over(w))
              .where(F.col("_prev").isNull()
                     | (F.col("_prev") != F.col(attr_col))))
    w2 = W.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    return (marked.withColumn("valid_to_ms", F.lead(ts_col).over(w2))
            .select(F.col(key_col), F.col(attr_col),
                    F.col(ts_col).cast("bigint").alias("valid_from_ms"),
                    F.col("valid_to_ms").cast("bigint"),
                    F.col("valid_to_ms").isNull().alias("is_current")))


def touch_attribution(df: DataFrame, key: str = "user_id",
                      ts_ms: str = "ts_ms", id_col: str = "event_id",
                      type_col: str = "event_type",
                      convert_on: str = "purchase",
                      value_col: str | None = None) -> DataFrame:
    """First/last-touch conversion attribution: for every ``convert_on``
    event, the earliest and the latest OTHER-typed event the same key
    produced strictly before it (deterministic (ts, id) order; no prior
    touch maps to '(none)'), aggregated to the (first, last) channel
    matrix. Two ignore-nulls running windows on ONE key partitioning +
    a |types|²-bounded aggregate; optional exact-micros revenue credit
    when ``value_col`` is given (e6 fixed-point BIGINT sum — the
    hash-stable contract for double money columns).

    The streaming twin is ``streaming/stateful.py:attribution_stream``
    (same semantics as keyed state); the registry oracle + property tests
    pin all three formulations together.
    """
    w = (W.partitionBy(key).orderBy(ts_ms, id_col)
          .rowsBetween(W.unboundedPreceding, -1))
    touch = F.when(F.col(type_col) != convert_on, F.col(type_col))
    attributed = (df.withColumn("first_touch", F.first(touch, True).over(w))
                    .withColumn("last_touch", F.last(touch, True).over(w))
                    .filter(F.col(type_col) == convert_on))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_conversions")]
    if value_col is not None:
        aggs.append(F.sum(F.round(F.col(value_col) * 1_000_000)
                          .cast("bigint")).alias("revenue_e6"))
    return (attributed
            .groupBy(F.coalesce("first_touch", F.lit("(none)"))
                     .alias("first_touch"),
                     F.coalesce("last_touch", F.lit("(none)"))
                     .alias("last_touch"))
            .agg(*aggs)
            .orderBy("first_touch", "last_touch"))


def cohort_ltv(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts_ms", value_col: str = "value",
               horizon_weeks: int = 12) -> DataFrame:
    """Cohort lifetime-value curve — retention's revenue sibling: users
    cohorted by the epoch week of their FIRST event
    (:func:`retention_cohorts`' convention), revenue accumulated per
    (cohort, weeks-since) cell, then CUMULATIVE along week_idx so each
    row reads "what a cohort was worth by week k". Exact e6 BIGINT
    revenue end to end (money contract); the cumulative window runs on
    the cohorts × horizon grid, never raw events.

    Output: cohort_week_ms, week_idx, revenue_e6 (that week),
    cum_revenue_e6 (through that week).
    """
    w = W.partitionBy(user_col)
    with_first = (df.select(F.col(user_col), F.col(ts_col).alias("_ts"),
                            F.round(F.col(value_col) * 1_000_000)
                             .cast("bigint").alias("_v6"))
                    .withColumn("_first", F.min("_ts").over(w)))
    wk = F.floor(F.col("_ts") / WEEK_MS)
    cwk = F.floor(F.col("_first") / WEEK_MS)
    cells = (with_first
             .select((cwk * WEEK_MS).cast("bigint").alias("cohort_week_ms"),
                     (wk - cwk).cast("bigint").alias("week_idx"), "_v6")
             .filter(F.col("week_idx") <= horizon_weeks)
             .groupBy("cohort_week_ms", "week_idx")
             .agg(F.sum("_v6").alias("revenue_e6")))
    w_cum = (W.partitionBy("cohort_week_ms").orderBy("week_idx")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (cells.withColumn("cum_revenue_e6",
                             F.sum("revenue_e6").over(w_cum))
                 .orderBy("cohort_week_ms", "week_idx"))
