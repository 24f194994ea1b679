"""Unit tests for CDC changelog compaction (operators/cdc.py)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from flink_realtime_data_eng_spark.operators.cdc import snapshot_from_changelog

SCHEMA = "k string, ts long, seq long, op string, v long"


def _snap(df):
    return {r["k"]: (r["ts"], r["seq"], r["op"], r["v"], r["n_changes"])
            for r in df.collect()}


class TestSnapshotFromChangelog:
    def test_latest_wins_and_delete_removes(self, spark):
        rows = [("a", 1, 1, "U", 10), ("a", 2, 1, "U", 20),
                ("b", 1, 1, "U", 5), ("b", 2, 1, "D", 0),
                ("c", 9, 1, "D", 0), ("c", 9, 2, "U", 7)]
        out = _snap(snapshot_from_changelog(
            spark.createDataFrame(rows, SCHEMA), "k", ["ts", "seq"]))
        assert out["a"] == (2, 1, "U", 20, 2)   # latest update wins
        assert "b" not in out                   # latest op is delete
        assert out["c"] == (9, 2, "U", 7, 2)    # seq breaks the ts tie

    def test_null_op_winner_is_kept_not_deleted(self, spark):
        """A winning row with NULL op (malformed source line) must stay in
        the snapshot — op != 'D' evaluates NULL and a plain filter would
        silently drop the key (invisible data loss)."""
        rows = [("a", 1, 1, "U", 10), ("a", 2, 1, None, 20)]
        out = _snap(snapshot_from_changelog(
            spark.createDataFrame(rows, SCHEMA), "k", ["ts", "seq"]))
        assert out["a"] == (2, 1, None, 20, 2)

    def test_deterministic_under_shuffled_input(self, spark):
        rows = [("a", 1, i, "U", i) for i in range(20)]
        df = spark.createDataFrame(rows, SCHEMA)
        a = _snap(snapshot_from_changelog(df.repartition(7), "k",
                                          ["ts", "seq"]))
        b = _snap(snapshot_from_changelog(df.orderBy(F.rand(1)), "k",
                                          ["ts", "seq"]))
        assert a == b == {"a": (1, 19, "U", 19, 20)}

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.tuples(st.sampled_from("abc"),
                              st.integers(0, 5),
                              st.sampled_from("UD"),
                              st.integers(-9, 9)),
                    min_size=1, max_size=25, unique_by=lambda t: (t[0], t[1])))
    def test_matches_python_reference(self, spark, rows):
        """Latest-wins + delete-wins equals a literal Python recomputation
        for arbitrary changelogs (seq = ts, unique per key)."""
        log = [(k, ts, ts, op, v) for k, ts, op, v in rows]
        got = _snap(snapshot_from_changelog(
            spark.createDataFrame(log, SCHEMA), "k", ["ts", "seq"]))
        want = {}
        for k in set(x[0] for x in rows):
            hist = sorted((r for r in rows if r[0] == k),
                          key=lambda r: r[1])
            n = len(hist)
            _, ts, op, v = hist[-1]
            if op != "D":
                want[k] = (ts, ts, op, v, n)
        assert got == want

    def test_incremental_fold_equals_full_compaction(self, spark):
        """snapshot(snapshot(base)-as-log ∪ delta) == snapshot(base ∪ delta)
        — the upsert-table refresh shape. The folded side must order the
        persisted snapshot BELOW any delta for its keys, which the
        (ts, seq) sequence already guarantees for monotone logs."""
        base = [("a", 1, 1, "U", 10), ("b", 1, 1, "U", 5),
                ("c", 1, 1, "U", 3)]
        delta = [("a", 2, 1, "U", 99), ("b", 2, 1, "D", 0),
                 ("d", 2, 1, "U", 4)]
        full = snapshot_from_changelog(
            spark.createDataFrame(base + delta, SCHEMA), "k", ["ts", "seq"])
        snap0 = snapshot_from_changelog(
            spark.createDataFrame(base, SCHEMA), "k", ["ts", "seq"])
        folded = snapshot_from_changelog(
            snap0.drop("n_changes").unionByName(
                spark.createDataFrame(delta, SCHEMA)),
            "k", ["ts", "seq"])
        want = {k: v[:4] for k, v in _snap(full).items()}
        got = {k: v[:4] for k, v in _snap(folded).items()}
        assert got == want
