"""Hypertable-style multi-resolution time rollup.

Time-series stores (TimescaleDB hypertables, Druid rollup segments)
maintain the same aggregate at several resolutions — per-minute,
per-hour, per-day — so dashboards read the coarsest level that answers
the question. The naive Spark translation is one groupBy per resolution
= N shuffles over the full fact table.

:func:`hierarchical_rollup` produces ALL levels in ONE shuffle: the
nested bucket columns (minute ⊂ hour ⊂ day) go through a single
``ROLLUP`` grouping, which Catalyst executes as one Expand + one hash
aggregate with map-side partials — the scan and shuffle are paid once
no matter how many resolutions are materialized. At 100 TB this is the
difference between one pass and one pass per retention tier.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: level-name defaults for common resolutions, keyed by bucket ms
_LEVEL_NAMES = {60_000: "minute", 3_600_000: "hour", 86_400_000: "day",
                604_800_000: "week"}


def hierarchical_rollup(df: DataFrame, ts_ms: str,
                        levels_ms: Sequence[int] = (60_000, 3_600_000, 86_400_000),
                        keys: Sequence[str] = (),
                        aggs: Sequence[Column] = ()) -> DataFrame:
    """All-resolution rollup of ``aggs`` in a single shuffle.

    ``levels_ms`` are bucket sizes, finest-to-coarsest nested (each must
    divide the next — minute/hour/day). ``keys`` are preserved at every
    level. Output rows carry ``resolution`` (level name or ``"<N>ms"``),
    ``bucket_start_ms`` (NULL on the per-key ``total`` row) and the
    aggregates; the ROLLUP's all-keys-aggregated grand-total row is kept
    only when ``keys`` is empty (otherwise the per-key ``total`` level
    already covers it and a keyless row would break the schema contract).
    """
    lv = list(levels_ms)
    if sorted(lv) != lv or len(set(lv)) != len(lv):
        raise ValueError(f"levels_ms must be strictly ascending, got {levels_ms}")
    for fine, coarse in zip(lv, lv[1:]):
        if coarse % fine:
            raise ValueError(
                f"levels must nest: {fine} does not divide {coarse}")
    names = [_LEVEL_NAMES.get(ms, f"{ms}ms") for ms in lv]
    bucket_cols = [f"_b_{n}" for n in names]
    # coarsest FIRST in the rollup so the sets are (day),(day,hour),(day,hour,minute)
    ordered = list(zip(lv, names, bucket_cols))[::-1]
    # keep the source columns (agg inputs live there); Catalyst prunes unused
    src = df.withColumns(
        {bc: F.floor(F.col(ts_ms) / ms) * ms for ms, _n, bc in ordered})
    agg_list = list(aggs) or [F.count(F.lit(1)).alias("cnt")]
    rolled = src.rollup(*keys, *[bc for _ms, _n, bc in ordered]).agg(*agg_list)
    if keys:
        # drop the sets that aggregate ANY key away: rollup sets are prefixes,
        # so the LAST key surviving implies every key survived.
        rolled = rolled.filter(F.grouping(keys[-1]) == 0)
    resolution = F.lit("total")
    for _ms, name, bc in ordered:  # finest non-null bucket wins, checked fine→coarse
        resolution = F.when(F.col(bc).isNotNull(), F.lit(name)).otherwise(resolution)
    # re-derive finest→coarsest order for the coalesce
    finest_first = [bc for _ms, _n, bc in sorted(ordered)]
    return rolled.select(
        resolution.alias("resolution"), *keys,
        F.coalesce(*finest_first).cast("bigint").alias("bucket_start_ms"),
        *[c for c in rolled.columns if c not in (*keys, *bucket_cols)])
