"""Window operators (SURVEY §2.4 A1-A6) with explicit timestamps — never
wall clock, per SURVEY §5's determinism rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_realtime_data_eng_spark.operators import windows


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_global_count(spark):
    # 5 s windows: [0,5000) has ts 0,1000,4999; [5000,10000) has 5000,9000.
    df = spark.createDataFrame(
        [(0,), (1000,), (4999,), (5000,), (9000,)], "ts_ms long")
    out = windows.tumbling_agg(df, "ts_ms", 5000,
                               aggs=[F.count(F.lit(1)).alias("cnt")])
    assert _rows(out, "window_start_ms", "cnt") == [(0, 3), (5000, 2)]


def test_tumbling_keyed_composite(spark):
    df = spark.createDataFrame(
        [("u1", "a", 0), ("u1", "a", 9999), ("u1", "b", 1), ("u2", "a", 10000)],
        "user string, action string, ts_ms long")
    out = windows.tumbling_agg(df, "ts_ms", 10_000, keys=["user", "action"],
                               aggs=[F.count(F.lit(1)).alias("cnt")])
    assert _rows(out, "window_start_ms", "user", "action", "cnt") == [
        (0, "u1", "a", 2), (0, "u1", "b", 1), (10000, "u2", "a", 1)]


def test_sliding_rows_land_in_two_windows(spark):
    # 10 s size / 5 s slide: ts=7000 belongs to [0,10000) and [5000,15000).
    df = spark.createDataFrame([(7000,)], "ts_ms long")
    out = windows.sliding_agg(df, "ts_ms", 10_000, 5_000,
                              aggs=[F.count(F.lit(1)).alias("cnt")])
    assert _rows(out, "window_start_ms", "cnt") == [(0, 1), (5000, 1)]


def test_session_gap_merges_and_splits(spark):
    # gap 5 s: u1 events at 0,4000,8999 chain into ONE session (each gap
    # < 5000); the next at 14000 is 5001 later -> new session. u2 separate key.
    df = spark.createDataFrame(
        [("u1", 0), ("u1", 4000), ("u1", 8999), ("u1", 14000), ("u2", 0)],
        "user string, ts_ms long")
    out = windows.session_agg(df, "ts_ms", 5000, keys=["user"],
                              aggs=[F.count(F.lit(1)).alias("cnt"),
                                    F.max("ts_ms").alias("max_ts")])
    assert _rows(out, "session_start_ms", "user", "cnt", "max_ts") == [
        (0, "u1", 3, 8999), (0, "u2", 1, 0), (14000, "u1", 1, 14000)]


def test_session_exact_gap_merges(spark):
    # Boundary: events exactly gap apart DO merge (Spark merges adjacent
    # session windows); one past the gap does not.
    df = spark.createDataFrame([("u", 0), ("u", 5000), ("u", 10001)],
                               "user string, ts_ms long")
    out = windows.session_agg(df, "ts_ms", 5000, keys=["user"],
                              aggs=[F.count(F.lit(1)).alias("cnt")])
    assert _rows(out, "session_start_ms", "cnt") == [(0, 2), (10001, 1)]


def test_running_reduce_cumulative_per_key(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 5), ("a", 4, 30)],
        "user string, seq long, v long")
    out = windows.running_reduce(df, ["user"], ["seq"], "v", "run")
    assert _rows(out, "user", "seq", "run") == [
        ("a", 1, 10), ("a", 2, 30), ("a", 4, 60), ("b", 3, 5)]


def test_trailing_agg_range_frame_includes_peers_and_expires(spark):
    """Events exactly trail_ms apart stay in-window; ties (range peers) see
    each other regardless of row order; older events fall out."""
    from pyspark.sql import functions as F
    from flink_realtime_data_eng_spark.operators.windows import trailing_agg
    rows = [("u", 0, 1.0), ("u", 1000, 2.0), ("u", 1000, 3.0),
            ("u", 2500, 4.0)]
    df = spark.createDataFrame(rows, "user string, ts_ms long, value double")
    out = {(r["ts_ms"], r["value"]): (r["trail_cnt"], r["trail_sum_e4"])
           for r in trailing_agg(df, ["user"], "ts_ms", 1500,
                                 "value").collect()}
    assert out[(0, 1.0)] == (1, 10_000)
    # both t=1000 rows are peers: each sees t=0 + BOTH peers
    assert out[(1000, 2.0)] == (3, 60_000)
    assert out[(1000, 3.0)] == (3, 60_000)
    # t=2500: window [1000, 2500] — t=0 expired, both peers + self
    assert out[(2500, 4.0)] == (3, 90_000)


def test_sessionize_agrees_with_session_agg_on_fixtures(spark):
    """Per-event labels and the aggregate form must describe the SAME
    sessions: identical (user, session_start) sets and per-session sizes,
    and exact-gap spacing merges in both (session_window's merge rule)."""
    from pyspark.sql import functions as F
    from flink_realtime_data_eng_spark.operators.windows import (
        session_agg, sessionize)
    from flink_realtime_data_eng_spark.schemas import load_table
    ev = (load_table(spark, "/root/testdata/sf0.001", "events")
          .select("user_id", "ts_ms", "event_id"))
    gap = 3_600_000
    lab = sessionize(ev, ["user_id"], "ts_ms", gap, order_by=["event_id"])
    got = {(r["user_id"], r["session_start_ms"]): r["n"]
           for r in lab.groupBy("user_id", "session_start_ms")
                       .agg(F.count(F.lit(1)).alias("n")).collect()}
    agg = session_agg(ev, "ts_ms", gap, keys=["user_id"],
                      aggs=[F.count(F.lit(1)).alias("n")])
    want = {(r["user_id"], r["session_start_ms"]): r["n"]
            for r in agg.collect()}
    assert got == want and len(got) > 1

    # exact-gap boundary: events exactly gap apart MERGE into one session
    df = spark.createDataFrame([("u", 0, 1), ("u", gap, 2),
                                ("u", 2 * gap + 1, 3)],
                               "user_id string, ts_ms long, event_id long")
    s = sessionize(df, ["user_id"], "ts_ms", gap, order_by=["event_id"])
    rows = {r["event_id"]: (r["session_start_ms"], r["event_seq"])
            for r in s.collect()}
    assert rows[1] == (0, 1) and rows[2] == (0, 2)
    assert rows[3] == (2 * gap + 1, 1)  # strictly-greater gap breaks


def test_sessionize_dynamic_gap_per_event_type(spark):
    from pyspark.sql import functions as F
    from flink_realtime_data_eng_spark.operators import windows
    # user 1: click at t=0 holds 30 min -> event at t=25min SAME session;
    # the t=25min 'view' holds only 10 min -> event at t=40min NEW session
    rows = [(1, "click", 0, 1), (1, "view", 1_500_000, 2),
            (1, "view", 2_400_000, 3)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_ms long, event_id long")
    gap = (F.when(F.col("event_type") == "click", F.lit(1_800_000))
            .otherwise(F.lit(600_000)))
    out = {r["event_id"]: r["session_start_ms"] for r in
           windows.sessionize_dynamic(df, ["user_id"], "ts_ms", gap,
                                      order_by=["event_id"]).collect()}
    assert out[1] == out[2] == 0          # click's long gap spans 25 min
    assert out[3] == 2_400_000            # view's short gap broke at 40 min
    # fixed-gap form would have merged all three at gap=30min
    fixed = {r["event_id"]: r["session_start_ms"] for r in
             windows.sessionize(df, ["user_id"], "ts_ms", 1_800_000,
                                order_by=["event_id"]).collect()}
    assert fixed[3] == 0


def test_attribution_conserves_conversions_and_revenue(spark):
    """Every purchase is attributed exactly once: the (first,last)-touch
    matrix must conserve both the purchase count and the micro-revenue."""
    from pyspark.sql import functions as F
    from flink_realtime_data_eng_spark import registry
    sf = "/root/testdata/sf0.001"
    out = registry.QUERIES["x_attribution"](spark, sf).collect()
    e = registry._events(spark, sf).filter(F.col("event_type") == "purchase")
    n_purch = e.count()
    rev = e.agg(F.sum(F.round(F.col("value") * 1_000_000)
                      .cast("bigint"))).collect()[0][0]
    assert sum(r.n_conversions for r in out) == n_purch
    assert sum(r.revenue_e6 for r in out) == rev
    # a user's first purchase with no prior touch lands in '(none)'
    assert all(r.first_touch != "purchase" and r.last_touch != "purchase"
               for r in out)
