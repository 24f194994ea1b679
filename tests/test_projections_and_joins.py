"""P1-P6 projections/split/merge and the J1 windowed join."""

from __future__ import annotations

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
