"""Incremental materialized-aggregate maintenance: merge partials, never
rescan the base.

The 100 TB shape for a standing dashboard aggregate: the base corpus's
per-key PARTIALS (count / sum / min / max — every decomposable aggregate
the reference uses, SURVEY §2.4) are computed once and persisted; each
new delta batch folds in by aggregating ONLY the delta and merging the
two partial tables on the key. Work per refresh is O(|delta| +
|keys|), independent of the base size — the same algebra Spark's own
map-side partial aggregation exploits within one job, lifted across jobs
via a persisted intermediate (and the same reason HLL registers and CMS
counters merge in functions/sketches.py).

Correctness contract: ``merge_partials(agg_partials(A), agg_partials(B))
== agg_partials(A ∪ B)`` for any split — the registry query proves it
against a full-recompute DuckDB oracle over the un-split table.

Derived measures (avg, rates) are computed FROM the merged partials at
read time (exact integer floor division here), never maintained
directly — averages do not merge, (sum, count) pairs do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

#: partial-column suffixes maintained per value column
_PARTIALS = ("cnt", "sum", "min", "max")


def agg_partials(df: DataFrame, keys: Sequence[str], value_e: str,
                 prefix: str = "p") -> DataFrame:
    """Per-key mergeable partials of an exact-integer value column:
    (count, sum, min, max) — each one re-aggregable with (sum, sum, min,
    max). ``value_e`` must already be fixed-point integer (the corpus's
    e4/e6 convention) so sums are order-independent across engines."""
    v = F.col(value_e)
    return (df.groupBy(*keys)
            .agg(F.count(v).cast("bigint").alias(f"{prefix}_cnt"),
                 F.sum(v).cast("bigint").alias(f"{prefix}_sum"),
                 F.min(v).cast("bigint").alias(f"{prefix}_min"),
                 F.max(v).cast("bigint").alias(f"{prefix}_max")))


def merge_partials(base: DataFrame, delta: DataFrame,
                   keys: Sequence[str], prefix: str = "p") -> DataFrame:
    """Fold a delta partial table into a base partial table: union, then
    one aggregate over ≤2 rows per key (sum/sum/min/max re-aggregation).
    The only shuffle is on the key at PARTIAL-table cardinality — the
    base fact rows are never touched."""
    u = base.unionByName(delta)
    return (u.groupBy(*keys)
            .agg(F.sum(f"{prefix}_cnt").cast("bigint").alias(f"{prefix}_cnt"),
                 F.sum(f"{prefix}_sum").cast("bigint").alias(f"{prefix}_sum"),
                 F.min(f"{prefix}_min").cast("bigint").alias(f"{prefix}_min"),
                 F.max(f"{prefix}_max").cast("bigint").alias(f"{prefix}_max")))


def finalize_view(partials: DataFrame, keys: Sequence[str],
                  prefix: str = "p") -> DataFrame:
    """Read the serving view off the partial table: the four maintained
    aggregates plus derived avg as exact integer division TRUNCATING
    TOWARD ZERO (Spark `DIV` and DuckDB `//` both truncate — for a
    negative sum this differs from floor: -7 DIV 2 = -3, floor = -4;
    no float, no rounding tie, engines agree either way)."""
    return partials.select(
        *keys,
        F.col(f"{prefix}_cnt").alias("n"),
        F.col(f"{prefix}_sum").alias("sum_e"),
        F.col(f"{prefix}_min").alias("min_e"),
        F.col(f"{prefix}_max").alias("max_e"),
        F.expr(f"{prefix}_sum DIV {prefix}_cnt").alias("avg_e_trunc"))
