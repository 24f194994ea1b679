"""Hierarchical (hypertable-style) multi-resolution rollup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_realtime_data_eng_spark.operators import rollup


def _df(spark):
    # two keys, events across two hours of one day
    rows = [("a", 0, 1), ("a", 30_000, 2), ("a", 3_600_000, 4),
            ("b", 60_000, 8)]
    return spark.createDataFrame(rows, "k string, ts_ms long, v long")


def test_rollup_levels_and_values(spark):
    out = rollup.hierarchical_rollup(
        _df(spark), "ts_ms", levels_ms=(60_000, 3_600_000, 86_400_000),
        keys=["k"], aggs=[F.sum("v").alias("s")])
    got = {(r["resolution"], r["k"], r["bucket_start_ms"]): r["s"]
           for r in out.collect()}
    assert got[("minute", "a", 0)] == 3          # two rows in minute 0
    assert got[("minute", "a", 3_600_000)] == 4
    assert got[("hour", "a", 0)] == 3
    assert got[("hour", "a", 3_600_000)] == 4
    assert got[("day", "a", 0)] == 7
    assert got[("total", "a", None)] == 7
    assert got[("total", "b", None)] == 8
    # keyed rollup: no keyless grand-total row leaks through
    assert all(k[1] is not None for k in got)


def test_rollup_global_keeps_grand_total(spark):
    out = rollup.hierarchical_rollup(
        _df(spark), "ts_ms", levels_ms=(3_600_000, 86_400_000),
        aggs=[F.sum("v").alias("s")])
    got = {(r["resolution"], r["bucket_start_ms"]): r["s"] for r in out.collect()}
    assert got[("total", None)] == 15
    assert got[("hour", 0)] == 11 and got[("hour", 3_600_000)] == 4
    assert got[("day", 0)] == 15


def test_rollup_rejects_non_nesting_levels(spark):
    with pytest.raises(ValueError, match="nest"):
        rollup.hierarchical_rollup(_df(spark), "ts_ms",
                                   levels_ms=(60_000, 90_000))
    with pytest.raises(ValueError, match="ascending"):
        rollup.hierarchical_rollup(_df(spark), "ts_ms",
                                   levels_ms=(3_600_000, 60_000))


def test_rollup_single_shuffle(spark):
    """All resolutions must come from ONE Expand + ONE exchange — the whole
    point vs a groupBy per tier."""
    out = rollup.hierarchical_rollup(
        _df(spark), "ts_ms", keys=["k"], aggs=[F.sum("v").alias("s")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Expand" in plan


def test_rollup_two_keys_no_partial_key_rows(spark):
    """Regression: with 2+ keys, ROLLUP sets that aggregate away later keys
    must be dropped — every output row carries ALL keys."""
    rows = [("r1", "a", 0, 1), ("r1", "b", 30_000, 2), ("r2", "a", 3_600_000, 4)]
    df = spark.createDataFrame(rows, "region string, et string, ts_ms long, v long")
    out = rollup.hierarchical_rollup(
        df, "ts_ms", levels_ms=(3_600_000, 86_400_000),
        keys=["region", "et"], aggs=[F.sum("v").alias("s")]).collect()
    assert all(r["region"] is not None and r["et"] is not None for r in out)
    totals = {(r["region"], r["et"]): r["s"] for r in out
              if r["resolution"] == "total"}
    assert totals == {("r1", "a"): 1, ("r1", "b"): 2, ("r2", "a"): 4}


def test_variant_extract_matches_schema_ful_json(spark):
    """The schema-free variant path must agree with from_json+schema on
    the shared statistics (n_typed == n_present etc.)."""
    from flink_realtime_data_eng_spark.operators import stats
    from flink_realtime_data_eng_spark.schemas import load_table
    e = load_table(spark, "/root/testdata/sf0.01", "events")
    via_schema = {r["event_type"]: (r["n_present"], r["sum_v"], r["min_v"], r["max_v"])
                  for r in stats.json_props_stats(e).collect()}
    via_variant = {r["event_type"]: (r["n_typed"], r["sum_v"], r["min_v"], r["max_v"])
                   for r in stats.variant_props_stats(e).collect()}
    assert via_schema == via_variant


def test_kaplan_meier_hand_computed(spark):
    """5 users, horizon day 12 (u5's last event), censor 1 day:
    churners u1/u2 at duration 2, u3 at 5, u4 at 10 (last event day 10 —
    more than a day before the horizon); u5 (duration 10, last event AT
    the horizon) is censored. S(2) = 1 - 2/5 = 0.6;
    S(5) = 0.6 * (1 - 1/3) = 0.4; S(10) = 0.4 * (1 - 1/2) = 0.2."""
    from flink_realtime_data_eng_spark.operators import stats
    base = 1_700_000_000_000
    day = 86_400_000

    def ev(u, d0, d1):
        return [(u, d0 * day + base), (u, d1 * day + base)]

    rows = (ev(1, 0, 2) + ev(2, 3, 5) + ev(3, 1, 6)
            + ev(4, 0, 10) + ev(5, 2, 12))
    df = spark.createDataFrame(
        [(u, ms) for u, ms in rows], "user_id long, ms long"
    ).selectExpr("user_id", "timestamp_millis(ms) AS ts")
    out = {r["duration_days"]: r
           for r in stats.kaplan_meier(df, censor_days=1).collect()}
    assert set(out) == {2, 5, 10}
    assert out[2]["n_at_risk"] == 5 and out[2]["n_events"] == 2
    assert out[5]["n_at_risk"] == 3 and out[5]["n_events"] == 1
    assert out[10]["n_at_risk"] == 2 and out[10]["n_events"] == 1
    assert abs(out[2]["survival"] - 0.6) < 1e-4
    assert abs(out[5]["survival"] - 0.4) < 1e-4
    assert abs(out[10]["survival"] - 0.2) < 1e-4


def test_kaplan_meier_all_censored_is_empty(spark):
    from flink_realtime_data_eng_spark.operators import stats
    base = 1_700_000_000_000
    df = spark.createDataFrame(
        [(1, base), (1, base + 1000), (2, base), (2, base + 2000)],
        "user_id long, ms long"
    ).selectExpr("user_id", "timestamp_millis(ms) AS ts")
    assert stats.kaplan_meier(df, censor_days=1).count() == 0
