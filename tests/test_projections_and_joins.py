"""P1-P6 projections/split/merge and the J1 windowed join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F, types as T

from flink_realtime_data_eng_spark.operators import joins, projections, split_merge


def test_parse_csv_lines_quoted(spark):
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("user", T.StringType()),
        T.StructField("ts", T.LongType()),
    ])
    lines = spark.createDataFrame([('"1","Tom","1000"',), ('"2","Bob","2000"',)],
                                  "value string")
    out = sorted(tuple(r) for r in projections.parse_csv_lines(lines, schema).collect())
    assert out == [(1, "Tom", 1000), (2, "Bob", 2000)]


def test_filter_sentinel(spark):
    df = spark.createDataFrame([("No-Alerts", 0), ("u1", 5)], "user string, v long")
    out = projections.filter_sentinel(df, "user", "No-Alerts").collect()
    assert [(r["user"], r["v"]) for r in out] == [("u1", 5)]


def test_split_and_merge_roundtrip(spark):
    df = spark.createDataFrame(
        [("Customer", "Tom"), ("SalesRep", "Bob"), ("Customer", "Ann")],
        "entity string, user string")
    main, side = split_merge.split_by_predicate(df, F.col("entity") == "Customer")
    assert main.count() == 2 and side.count() == 1
    merged = split_merge.tag_and_merge(main, side)
    got = sorted((r["src"], r["key"]) for r in merged.collect())
    assert got == [("Stream-1", "Ann"), ("Stream-1", "Tom"), ("Stream-2", "Bob")]


def test_window_bucket_negative_ts_floor_aligned(spark):
    # ADVICE round 1: pre-epoch timestamps must floor (match F.window), not
    # round toward zero.
    df = spark.createDataFrame([(-1,), (-5000,), (-5001,), (4999,)], "ts long")
    out = df.select(joins.window_bucket("ts", 5000)).collect()
    assert [r["window_start_ms"] for r in out] == [-5000, -5000, -10000, 0]


def test_windowed_equi_join_same_bucket_only(spark):
    left = spark.createDataFrame([("u", 1000, 1), ("u", 6000, 2)],
                                 "user string, ts_ms long, event_id long")
    right = spark.createDataFrame([("u", 4000, 10), ("u", 11000, 11)],
                                  "user string, ts_ms long, event_id long")
    out = joins.windowed_equi_join(left, right, key="user",
                                   ts_ms="ts_ms", size_ms=5000)
    rows = [(r["l_event_id"], r["r_event_id"]) for r in out.collect()]
    # bucket [0,5000): left#1 x right#10. left#2 in [5000,10000) has no match;
    # right#11 in [10000,15000) has no match.
    assert rows == [(1, 10)]


def test_sql_entry_point_over_registered_views(spark):
    """SURVEY §3: the engine's SQL lifecycle — register the driver tables as
    views and answer with spark.sql, Catalyst handling the rest."""
    from flink_realtime_data_eng_spark.schemas import register_views
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    register_views(spark, "/root/testdata/sf0.001", ["region", "nation"])
    out = spark.sql("""
        SELECT r_name, count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """).collect()
    assert sum(r["n_nations"] for r in out) == 25


def test_asof_join_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [("u", 100, "a"), ("u", 250, "b"), ("u", 50, "c"), ("v", 100, "d")],
        "k string, ts_ms long, tag string")
    right = spark.createDataFrame(
        [("u", 100, 1.0), ("u", 200, 2.0), ("v", 300, 9.0)],
        "k string, ts_ms long, px double")
    out = joins.asof_join(left, right, key="k", ts_ms="ts_ms",
                          value_cols=["px"])
    got = {(r["k"], r["ts_ms"]): (r["px"], r["matched_ts_ms"])
           for r in out.collect()}
    # u@100 ties right@100 (<= matches); u@250 takes latest (200);
    # u@50 has no prior right row -> dropped; v@100 precedes v@300 -> dropped.
    assert got == {("u", 100): (1.0, 100), ("u", 250): (2.0, 200)}


def test_asof_join_tolerance_drops_stale_matches(spark):
    left = spark.createDataFrame([("u", 1000, "a")], "k string, ts_ms long, tag string")
    right = spark.createDataFrame([("u", 10, 1.0)], "k string, ts_ms long, px double")
    out = joins.asof_join(left, right, key="k", ts_ms="ts_ms",
                          value_cols=["px"], tolerance_ms=500)
    assert out.count() == 0


def test_asof_join_null_value_col_stays_atomic(spark):
    # A right row with a NULL value column must NOT be stitched with an
    # older row's value: the match travels as one struct.
    left = spark.createDataFrame([("u", 300, "a")], "k string, ts_ms long, tag string")
    right = spark.createDataFrame([("u", 100, 1.0), ("u", 200, None)],
                                  "k string, ts_ms long, px double")
    row = joins.asof_join(left, right, key="k", ts_ms="ts_ms",
                          value_cols=["px"]).collect()[0]
    assert row["matched_ts_ms"] == 200 and row["px"] is None


def test_interval_join_bounds_inclusive_and_bucketed(spark):
    left = spark.createDataFrame([("u", 10_000)], "k string, ts_ms long")
    right = spark.createDataFrame(
        [("u", 9_000), ("u", 10_000), ("u", 12_000), ("u", 12_001), ("u", 8_999)],
        "k string, ts_ms long")
    out = joins.interval_join(left, right, key="k", ts_ms="ts_ms",
                              lower_ms=-1000, upper_ms=2000)
    got = sorted(r["r_ts_ms"] for r in out.collect())
    assert got == [9_000, 10_000, 12_000]


def test_interval_join_no_duplicate_pairs(spark):
    # Pairs near bucket edges must appear exactly once despite the 2-bucket
    # left explode.
    left = spark.createDataFrame([("u", t) for t in range(0, 5000, 500)],
                                 "k string, ts_ms long")
    right = spark.createDataFrame([("u", t) for t in range(0, 5000, 300)],
                                  "k string, ts_ms long")
    out = joins.interval_join(left, right, key="k", ts_ms="ts_ms",
                              lower_ms=-700, upper_ms=700)
    assert out.count() == out.distinct().count()
    # Cross-check against a brute-force filter join.
    brute = (left.crossJoin(right.withColumnRenamed("ts_ms", "r_ts")
                            .withColumnRenamed("k", "rk"))
             .filter("rk = k AND r_ts BETWEEN ts_ms - 700 AND ts_ms + 700"))
    assert out.count() == brute.count()


def test_asof_join_rejects_column_collision(spark):
    left = spark.createDataFrame([("u", 1, 5.0)], "k string, ts_ms long, px double")
    right = spark.createDataFrame([("u", 1, 1.0)], "k string, ts_ms long, px double")
    with pytest.raises(ValueError, match="collision"):
        joins.asof_join(left, right, key="k", ts_ms="ts_ms", value_cols=["px"])


def test_interval_join_carries_payload(spark):
    left = spark.createDataFrame([("u", 1000, "L1")], "k string, ts_ms long, tag string")
    right = spark.createDataFrame([("u", 1500, 7.0)], "k string, ts_ms long, score double")
    row = joins.interval_join(left, right, key="k", ts_ms="ts_ms",
                              lower_ms=0, upper_ms=1000).collect()[0]
    assert (row["tag"], row["r_score"]) == ("L1", 7.0)


def test_range_lookup_covers_and_drops(spark):
    from pyspark.sql import functions as F
    from flink_realtime_data_eng_spark.operators import joins
    fact = spark.createDataFrame(
        [(1, 5.0), (2, 49.99), (3, 50.0), (4, 999.0)], "id int, value double")
    bands = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 50.0, 100.0)], "band_id int, lo double, hi double")
    got = {r["id"]: r["band_id"]
           for r in joins.range_lookup(fact, bands, "value").collect()}
    # half-open [lo, hi): 50.0 lands in band 1; 999 outside -> dropped
    assert got == {1: 0, 2: 0, 3: 1}
    plan = joins.range_lookup(fact, bands, "value")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # dim broadcast, fact map-side


def test_asof_forward_matches_next_event(spark):
    from flink_realtime_data_eng_spark.operators import joins
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 250, "b"), (2, 50, "c")],
        "k long, ts_ms long, tag string")
    right = spark.createDataFrame(
        [(1, 100, 9.0), (1, 200, 8.0), (1, 300, 7.0)],
        "k long, ts_ms long, v double")
    out = {r["tag"]: (r["matched_ts_ms"], r["v"]) for r in
           joins.asof_join_forward(left, right, key="k", ts_ms="ts_ms",
                                   value_cols=["v"]).collect()}
    assert out["a"] == (100, 9.0)   # ties match (>= semantics)
    assert out["b"] == (300, 7.0)   # next AFTER 250
    assert "c" not in out           # key 2 has no right rows (inner)
    # tolerance drops matches farther than the bound
    tol = {r["tag"] for r in
           joins.asof_join_forward(left, right, key="k", ts_ms="ts_ms",
                                   value_cols=["v"], tolerance_ms=20)
           .collect()}
    assert tol == {"a"}


def test_parse_csv_routed_splits_ok_and_dead(spark):
    from pyspark.sql import types as T
    from flink_realtime_data_eng_spark.operators.projections import (
        parse_csv_routed)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("n", T.LongType()),
    ])
    lines = spark.createDataFrame(
        [("1,alice,10",),      # clean
         ("2,bob,notanum",),   # type mismatch -> dead
         ("3,carol",),         # truncated -> dead
         ("4,,7",)],           # empty field parses to NULL -> ok
        "value string")
    out = {r["raw"] or r["id"]: r for r in parse_csv_routed(lines, schema).collect()}
    assert out[1]["route"] == "ok" and out[1]["n"] == 10
    assert out["2,bob,notanum"]["route"] == "dead"
    assert out["2,bob,notanum"]["id"] is None  # all-or-nothing per row
    assert out["3,carol"]["route"] == "dead"
    assert out[4]["route"] == "ok" and out[4]["name"] is None
