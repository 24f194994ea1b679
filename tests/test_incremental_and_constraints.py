"""Unit tests for the incremental aggregate-view and DQ-constraint ops."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from flink_realtime_data_eng_spark.operators import constraints as C
from flink_realtime_data_eng_spark.operators import incremental as inc


def _rows_by_key(df):
    return {tuple(r)[0]: tuple(r)[1:] for r in df.collect()}


class TestIncrementalAggView:
    def test_merge_equals_full_recompute(self, spark):
        rows = [("a", 10), ("a", 20), ("b", 5), ("b", None), ("c", 7),
                ("a", -3), ("d", 0)]
        df = spark.createDataFrame(rows, "k string, v long")
        full = inc.agg_partials(df, ["k"], "v")
        base = inc.agg_partials(df.limit(0).union(df.filter("v is null or v >= 5")), ["k"], "v")
        delta = inc.agg_partials(df.filter("v is not null and v < 5"), ["k"], "v")
        merged = inc.merge_partials(base, delta, ["k"])
        assert _rows_by_key(merged) == _rows_by_key(full)

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.tuples(st.sampled_from("xyz"),
                              st.integers(-1000, 1000)),
                    min_size=1, max_size=30),
           st.integers(0, 29))
    def test_merge_property_any_split(self, spark, rows, cut):
        cut = min(cut, len(rows))
        df = spark.createDataFrame([(k, v) for k, v in rows],
                                   "k string, v long")
        a = spark.createDataFrame(rows[:cut] or [("__none__", 0)],
                                  "k string, v long").filter(
            F.col("k") != "__none__")
        b = spark.createDataFrame(rows[cut:] or [("__none__", 0)],
                                  "k string, v long").filter(
            F.col("k") != "__none__")
        merged = inc.merge_partials(inc.agg_partials(a, ["k"], "v"),
                                    inc.agg_partials(b, ["k"], "v"), ["k"])
        assert _rows_by_key(merged) == _rows_by_key(
            inc.agg_partials(df, ["k"], "v"))

    def test_refresh_plan_never_rescans_base_facts(self, spark):
        """The registry query's scale claim, pinned: the refresh plan has
        exactly two scans — the delta slice of events (with the day
        filter pushed to the scan) and the |keys|-row partials parquet.
        A third scan would mean the base facts are being recomputed."""
        from flink_realtime_data_eng_spark import registry
        df = registry.QUERIES["x_incremental_aggview"](
            spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 2, plan
        assert "frde_aggview_" in plan  # one scan is the partial table
        # the delta cutoff must reach the events parquet scan as a range
        # predicate on the RAW ts column (partition pruning at 100 TB)
        assert "GreaterThanOrEqual(ts," in plan, plan

    def test_finalize_avg_is_floor_division(self, spark):
        df = spark.createDataFrame([("a", 3), ("a", 4)], "k string, v long")
        out = inc.finalize_view(inc.agg_partials(df, ["k"], "v"), ["k"])
        row = out.collect()[0]
        assert (row["n"], row["sum_e"], row["min_e"], row["max_e"],
                row["avg_e_trunc"]) == (2, 7, 3, 4, 3)  # 7 DIV 2 = 3


class TestConstraints:
    @pytest.fixture(scope="class")
    def frame(self, spark):
        rows = [(1, "u1", 5.0), (2, "u2", 50.0), (3, None, 150.0),
                (4, "u4", None), (4, "u5", 7.0)]
        return spark.createDataFrame(rows, "id long, user string, v double")

    def test_verdicts(self, frame):
        out = C.run_checks(frame, [
            C.completeness("user"),
            C.completeness("v"),
            C.uniqueness("id"),
            C.in_range("v", 0.0, 100.0),
            C.min_rows(3),
        ])
        got = {r["check"]: (r["metric"], r["basis"], r["passed"])
               for r in out.collect()}
        assert got["completeness:user"] == (4, 5, False)
        assert got["completeness:v"] == (4, 5, False)
        assert got["uniqueness:id"] == (4, 5, False)      # id 4 duplicated
        assert got["in_range:v:0.0:100.0"] == (3, 4, False)  # 150 outside
        assert got["min_rows:3"] == (5, 3, True)

    def test_all_pass_on_clean_frame(self, spark):
        df = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)],
                                   "id long, user string, v double")
        out = C.run_checks(df, [C.completeness("user"), C.uniqueness("id"),
                                C.in_range("v", 0.0, 10.0), C.min_rows(1)])
        assert all(r["passed"] for r in out.collect())

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 6),
                              st.one_of(st.none(), st.sampled_from("pq")),
                              st.one_of(st.none(),
                                        st.floats(-5, 15, allow_nan=False))),
                    min_size=1, max_size=25))
    def test_verdicts_match_python_reference(self, spark, rows):
        """The compiled single-pass verdicts equal a literal Python
        recomputation for arbitrary null-riddled frames."""
        df = spark.createDataFrame(rows, "id long, user string, v double")
        out = {r["check"]: (r["metric"], r["basis"], r["passed"])
               for r in C.run_checks(df, [
                   C.completeness("user"), C.uniqueness("id"),
                   C.in_range("v", 0.0, 10.0), C.min_rows(5)]).collect()}
        ids = [i for i, _, _ in rows]
        users = [u for _, u, _ in rows]
        vs = [v for _, _, v in rows]
        nn_u, total = sum(u is not None for u in users), len(rows)
        d_id, nn_id = len(set(ids)), len(ids)
        inr = sum(v is not None and 0.0 <= v <= 10.0 for v in vs)
        nn_v = sum(v is not None for v in vs)
        assert out["completeness:user"] == (nn_u, total, nn_u == total)
        assert out["uniqueness:id"] == (d_id, nn_id, d_id == nn_id)
        assert out["in_range:v:0.0:10.0"] == (inr, nn_v, inr == nn_v)
        assert out["min_rows:5"] == (total, 5, total >= 5)

    def test_single_scan_plan(self, frame):
        """N checks must compile to ONE scan of the input."""
        out = C.run_checks(frame, [C.completeness("user"),
                                   C.uniqueness("id"),
                                   C.in_range("v", 0.0, 100.0),
                                   C.min_rows(1)])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("LocalTableScan") + plan.count("Scan ") <= 2
