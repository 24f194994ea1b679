"""Change-data-capture compaction: reconstruct the current snapshot from
a changelog (merge-on-read, latest-wins).

The lakehouse primitive behind MERGE/upsert tables: a stream of keyed
change records (insert/update/delete ops) compacts to the live table by
keeping each key's LATEST record and dropping keys whose latest op is a
delete. One shuffle on the key; the per-key window never materializes
more than the key's own history. Determinism contract: the caller names
explicit sequence columns so concurrent same-timestamp changes order
identically on every engine and every retry — never rely on arrival
order.

``snapshot_from_changelog(base ∪ delta)`` is the incremental form: a
persisted snapshot IS a changelog of upserts, so folding a new delta in
is the same operator over (snapshot-as-inserts ∪ delta) — the
complement of operators/incremental.py for row-level state rather than
aggregate state (and the batch twin of the SCD2 interval build in
operators/funnel.py:scd2_intervals, which keeps history instead of the
head).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def snapshot_from_changelog(log: DataFrame, key: str,
                            seq_cols: Sequence[str],
                            op_col: str = "op",
                            delete_op: str = "D") -> DataFrame:
    """Latest-wins compaction of a changelog to the current snapshot.

    seq_cols: ordering columns, most significant first (e.g.
    ``["ts_ms", "event_id"]``) — the full tuple must be unique per key
    for a deterministic winner.  Rows whose winning op is ``delete_op``
    remove the key from the snapshot; a winning row with a NULL op is
    KEPT (null-safe comparison) — this repo's CSV sources surface
    malformed lines as nulls, and silently treating them as deletes
    would be invisible data loss. Output: the winning rows minus
    deletes, plus ``n_changes`` (total changelog entries per key —
    kept because compaction monitoring wants churn per key for free;
    it rides the same window pass).
    """
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc() for c in seq_cols])
    ranked = (log.withColumn("_rn", F.row_number().over(w))
                 .withColumn("n_changes",
                             F.count(F.lit(1)).over(Window.partitionBy(key))
                              .cast("bigint")))
    return (ranked.filter(F.col("_rn") == 1)
                  .filter(~F.col(op_col).eqNullSafe(F.lit(delete_op)))
                  .drop("_rn"))
