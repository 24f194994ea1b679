"""ST1/ST2 batch analogs — the Login/Logout edge cases of
CourseUseCase.java:149-175 and the consecutive-delete cases of
StatefulOperations.java:103-118."""

from __future__ import annotations

from flink_realtime_data_eng_spark.operators import stateful


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_interval_alerts_consecutive_deletes(spark):
    # u1: deletes at 0, 5000 (diff 5000 -> alert), 30000 (diff 25000 -> no).
    # First delete per key never alerts (no previous state).
    df = spark.createDataFrame(
        [("u1", 0, "Delete"), ("u1", 2000, "Query"), ("u1", 5000, "Delete"),
         ("u1", 30000, "Delete"), ("u2", 100, "Delete")],
        "user string, ts_ms long, op string")
    out = stateful.interval_alerts(df, key="user", ts_ms="ts_ms",
                                   event_col="op", match_value="Delete",
                                   threshold_ms=10_000)
    assert _rows(out, "user", "ts_ms", "diff_ms") == [("u1", 5000, 5000)]


def test_interval_alerts_non_matching_events_ignored(spark):
    # Non-Delete events between deletes must not reset the interval.
    df = spark.createDataFrame(
        [("u", 0, "Delete"), ("u", 1000, "Query"), ("u", 2000, "Query"),
         ("u", 3000, "Delete")],
        "user string, ts_ms long, op string")
    out = stateful.interval_alerts(df, key="user", ts_ms="ts_ms",
                                   event_col="op", match_value="Delete",
                                   threshold_ms=10_000)
    assert _rows(out, "user", "ts_ms", "diff_ms") == [("u", 3000, 3000)]


def test_action_durations_machine(spark):
    # Reference semantics (CourseUseCase.java:149-175):
    # - first event per key -> ('None', 0)
    # - Login (session_start) -> ('None', 0) regardless of previous
    # - event right after Logout (session_end cleared state) -> ('None', 0)
    # - otherwise -> (prev_action, ts - prev_ts)
    df = spark.createDataFrame(
        [("u", 0, "Login"), ("u", 1000, "View"), ("u", 3500, "Logout"),
         ("u", 9000, "View"), ("u", 9500, "Login")],
        "user string, ts_ms long, action string")
    out = stateful.action_durations(df, key="user", ts_ms="ts_ms",
                                    action_col="action",
                                    session_start="Login", session_end="Logout")
    assert _rows(out, "ts_ms", "prev_action", "duration_ms") == [
        (0, "None", 0),        # first event
        (1000, "Login", 1000),  # time spent logged-in before View
        (3500, "View", 2500),   # time spent in View before Logout
        (9000, "None", 0),      # state cleared by Logout
        (9500, "None", 0),      # Login always fresh
    ]


def test_action_durations_timestamp_tie_deterministic(spark):
    # Equal timestamps: the order_by tiebreaker makes output deterministic.
    df = spark.createDataFrame(
        [("u", 1000, 1, "a"), ("u", 1000, 2, "b")],
        "user string, ts_ms long, event_id long, action string")
    out = stateful.action_durations(df, key="user", ts_ms="ts_ms",
                                    action_col="action",
                                    order_by=["ts_ms", "event_id"])
    assert _rows(out, "event_id", "prev_action", "duration_ms") == [
        (1, "None", 0), (2, "a", 0)]


def test_attribution_stream_matches_batch(spark):
    """The streaming state machine and the batch two-window recipe are
    the same semantics: identical (first, last) conversion matrix."""
    from flink_realtime_data_eng_spark import registry
    sf = "/root/testdata/sf0.001"
    live = {(r.first_touch, r.last_touch): r.n_conversions
            for r in registry.QUERIES["x_attribution_stream"](spark, sf)
            .collect()}
    batch = {(r.first_touch, r.last_touch): r.n_conversions
             for r in registry.QUERIES["x_attribution"](spark, sf)
             .collect()}
    assert live == batch and sum(live.values()) > 0


def test_cooldown_throttle_anchors_on_last_kept(spark):
    """A chain of sub-cooldown gaps must all suppress relative to the
    FIRST kept event — lag/session semantics would wrongly re-admit the
    third event. ts 0, 80, 160, 250 with cooldown 100: keep 0 (first),
    drop 80 (80 <= 100 after 0), drop 160 (160 <= 100? no — 160 - 0 > 100
    so KEEP), then 250 - 160 <= 100 drops."""
    from flink_realtime_data_eng_spark.functions.filtering import (
        cooldown_throttle)
    rows = [("k", 1, 0), ("k", 2, 80), ("k", 3, 160), ("k", 4, 250),
            ("z", 9, 5)]
    df = spark.createDataFrame(rows, "key string, id long, ts long")
    out = cooldown_throttle(df, "key", "id", "ts", cooldown_ms=100)
    kept = sorted((r["key"], r["id"]) for r in out.collect())
    assert kept == [("k", 1), ("k", 3), ("z", 9)]


def test_cooldown_throttle_boundary_is_strict(spark):
    """Exactly cooldown_ms after the last kept event still suppresses
    (strict >): the reference recurrence uses now - cw > delay."""
    from flink_realtime_data_eng_spark.functions.filtering import (
        cooldown_throttle)
    rows = [("k", 1, 0), ("k", 2, 100), ("k", 3, 101)]
    df = spark.createDataFrame(rows, "key string, id long, ts long")
    out = cooldown_throttle(df, "key", "id", "ts", cooldown_ms=100)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]
