"""Property-based tests (hypothesis): window arithmetic, session islands,
and batch-vs-streaming state machine agreement on random inputs.

Each property drives full Spark plans, so example counts are kept small and
deadlines disabled — the value is randomized coverage of boundary cases
(negative timestamps, collisions, gap-exact spacing), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from flink_realtime_data_eng_spark.operators import joins, stateful, windows

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

TS = st.integers(min_value=-10_000_000, max_value=10_000_000)


@SLOW
@given(st.lists(TS, min_size=1, max_size=30), st.sampled_from([1000, 5000, 7001]))
def test_window_bucket_matches_spark_window(spark, ts_list, size):
    """joins.window_bucket (integer arithmetic) must agree with F.window's
    epoch alignment for any timestamp sign and any window size."""
    df = spark.createDataFrame([(t,) for t in ts_list], "ts_ms long")
    ours = df.select(F.col("ts_ms"), joins.window_bucket("ts_ms", size))
    spk = df.select(
        F.col("ts_ms"),
        F.unix_millis(F.window(F.timestamp_millis("ts_ms"),
                               f"{size} milliseconds").start).alias("w"))
    got = {r["ts_ms"]: r["window_start_ms"] for r in ours.collect()}
    want = {r["ts_ms"]: r["w"] for r in spk.collect()}
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.sampled_from(["u1", "u2"]), TS),
                min_size=1, max_size=25, unique=True),
       st.sampled_from([1000, 4000]))
def test_session_agg_matches_gaps_and_islands(spark, rows, gap):
    """session_window must agree with the classic lag/running-sum islands
    construction (the DuckDB oracle's shape) for random event sets —
    including events exactly `gap` apart (which MERGE)."""
    df = spark.createDataFrame(rows, "user string, ts_ms long")
    got = sorted(tuple(r) for r in windows.session_agg(
        df, "ts_ms", gap, keys=["user"],
        aggs=[F.count(F.lit(1)).alias("cnt")]).collect())

    from pyspark.sql import Window as W
    w = W.partitionBy("user").orderBy("ts_ms")
    brk = F.when(
        F.lag("ts_ms").over(w).isNull()
        | (F.col("ts_ms") - F.lag("ts_ms").over(w) > gap), 1).otherwise(0)
    grp = df.withColumn("brk", brk).withColumn(
        "grp", F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0)))
    want = sorted(tuple(r) for r in grp.groupBy("user", "grp")
                  .agg(F.min("ts_ms").alias("session_start_ms"),
                       F.count(F.lit(1)).alias("cnt"))
                  .select("session_start_ms", "user", "cnt").collect())
    assert got == want


@SLOW
@given(st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.integers(min_value=0, max_value=100_000),
              st.sampled_from(["Login", "View", "Buy", "Logout"])),
    min_size=1, max_size=20))
def test_action_durations_batch_reference_model(spark, rows):
    """The batch lag-analog must match a plain-Python replay of the
    reference state machine (CourseUseCase.java:149-175) on random inputs."""
    uniq = [(u, t, i, a) for i, (u, t, a) in enumerate(rows)]
    df = spark.createDataFrame(uniq, "user string, ts_ms long, eid long, action string")
    got = {r["eid"]: (r["prev_action"], r["duration_ms"])
           for r in stateful.action_durations(
               df, key="user", ts_ms="ts_ms", action_col="action",
               session_start="Login", session_end="Logout",
               order_by=["ts_ms", "eid"]).collect()}

    state: dict[str, tuple[str | None, int | None]] = {}
    want = {}
    for u, t, i, a in sorted(uniq, key=lambda r: (r[0], r[1], r[2])):
        last_a, last_t = state.get(u, (None, None))
        if last_a is None or a == "Login":
            want[i] = ("None", 0)
        else:
            want[i] = (last_a, t - last_t)
        state[u] = (None, None) if a == "Logout" else (a, t)
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.sampled_from(["u1", "u2"]), TS),
                min_size=1, max_size=20, unique=True),
       st.lists(st.tuples(st.sampled_from(["u1", "u2"]), TS),
                min_size=1, max_size=20, unique=True),
       st.sampled_from([(-1000, 2000), (0, 5000), (-7000, -1000)]))
def test_interval_join_matches_brute_force(spark, lrows, rrows, bounds):
    """Bucketed interval join must equal the brute-force cross+filter for
    random keys/timestamps and bounds of any sign (incl. fully negative)."""
    lo, hi = bounds
    left = spark.createDataFrame(lrows, "k string, ts_ms long")
    right = spark.createDataFrame(rrows, "k string, ts_ms long")
    got = sorted((r["k"], r["l_ts_ms"], r["r_ts_ms"]) for r in
                 joins.interval_join(left, right, key="k", ts_ms="ts_ms",
                                     lower_ms=lo, upper_ms=hi).collect())
    want = sorted(
        (lk, lt, rt)
        for lk, lt in lrows for rk, rt in rrows
        if lk == rk and lt + lo <= rt <= lt + hi)
    assert got == want


@SLOW
@given(st.lists(st.tuples(st.sampled_from(["u1", "u2"]), TS),
                min_size=1, max_size=15, unique=True),
       st.lists(st.tuples(st.sampled_from(["u1", "u2"]), TS, st.integers(0, 99)),
                min_size=1, max_size=15))
def test_asof_join_matches_reference_model(spark, lrows, rrows):
    """asof_join must equal the per-row 'latest right at-or-before'
    reference model for random data (dedup right to one row per (k, ts) so
    the expected match value is well-defined)."""
    rdedup = {}
    for rk, rt, v in rrows:
        rdedup[(rk, rt)] = max(v, rdedup.get((rk, rt), -1))
    rlist = [(k, t, v) for (k, t), v in rdedup.items()]
    left = spark.createDataFrame(lrows, "k string, ts_ms long")
    right = spark.createDataFrame(rlist, "k string, ts_ms long, v long")
    got = {(r["k"], r["ts_ms"]): (r["v"], r["matched_ts_ms"]) for r in
           joins.asof_join(left, right, key="k", ts_ms="ts_ms",
                           value_cols=["v"]).collect()}
    want = {}
    for lk, lt in lrows:
        prior = [(t, v) for k, t, v in rlist if k == lk and t <= lt]
        if prior:
            mt, mv = max(prior)
            want[(lk, lt)] = (mv, mt)
    assert got == want
