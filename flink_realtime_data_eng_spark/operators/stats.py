"""Distribution statistics operators.

Exact quantiles are per-group sorts; Spark's ``percentile`` aggregate
does the sort inside the aggregation buffer of each group after the
one hash shuffle on the group key — no global sort, no second pass.
(For quantiles over a single giant group at 100 TB, switch to
``percentile_approx`` — a t-digest style mergeable sketch — and accept
the approximation; the exact form here is the oracle-checkable path.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def exact_group_quantiles(df: DataFrame, group: Sequence[str], value: str,
                          qs: Sequence[float] = (0.25, 0.5, 0.9, 0.99),
                          ) -> DataFrame:
    """Exact linear-interpolation quantiles of ``value`` per group, one
    column per requested quantile (``p25``, ``p50``, ...), rounded to
    6 dp so both engines' interpolation arithmetic hashes identically.
    """
    names = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q}")
        pct = round(q * 100, 6)  # 0.25->p25, 0.5->p50, 1.0->p100, 0.999->p99_9
        names.append(f"p{int(pct)}" if pct == int(pct)
                     else "p" + str(pct).replace(".", "_"))
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantiles in {qs}")
    aggs = [
        F.round(F.percentile(value, F.lit(float(q))), 6).alias(name)
        for q, name in zip(qs, names)]
    return df.groupBy(*group).agg(
        F.count(value).cast("bigint").alias("n"), *aggs)
