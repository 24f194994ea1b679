"""Join operators (SURVEY §2.5 J1) + scale-aware helpers.

Reference J1: windowed stream-stream inner equi-join — file stream ⋈ Kafka
stream on user, both sides assigned to the same 5 s tumbling window, emitting
one row per matched pair (WindowJoins.java:106-121).

Spark-first batch form: stamp both sides with the epoch-aligned window bucket
and equi-join on (key, bucket). The bucket is part of the join key, so the
shuffle co-partitions key×window and the per-window cartesian product happens
locally — the same plan scales to 100 TB because no window state is held, and
AQE switches to broadcast when one side is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def window_bucket(ts_ms: str | Column, size_ms: int) -> Column:
    """Epoch-aligned tumbling bucket start (exact integer arithmetic).

    Floor semantics (``floor(ts/size)*size``) so pre-epoch (negative)
    timestamps bucket identically to ``F.window()``'s epoch alignment —
    Spark's ``%`` is dividend-signed and would round toward zero instead.
    """
    col = F.col(ts_ms) if isinstance(ts_ms, str) else ts_ms
    return (F.floor(col / F.lit(size_ms)) * size_ms).cast("bigint").alias("window_start_ms")


def windowed_equi_join(left: DataFrame, right: DataFrame, key: str,
                       ts_ms: str, size_ms: int,
                       how: str = "inner") -> DataFrame:
    """J1: per-(key, window) inner join. Columns from both sides survive with
    ``l_``/``r_`` prefixes except the shared key/bucket."""
    lb = left.withColumn("window_start_ms", window_bucket(ts_ms, size_ms))
    rb = right.withColumn("window_start_ms", window_bucket(ts_ms, size_ms))
    lsel = lb.select(key, "window_start_ms",
                     *[F.col(c).alias(f"l_{c}") for c in left.columns
                       if c not in (key,)])
    rsel = rb.select(key, "window_start_ms",
                     *[F.col(c).alias(f"r_{c}") for c in right.columns
                       if c not in (key,)])
    return lsel.join(rsel, on=[key, "window_start_ms"], how=how)


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Star-schema helper: force the small dimension broadcast so the fact
    table never shuffles for the join (the default plan at 100 TB)."""
    return fact.join(F.broadcast(dim), on=on, how=how)
