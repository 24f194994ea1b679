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


def json_props_stats(df: DataFrame, json_col: str = "props",
                     field: str = "k", group_col: str = "event_type") -> DataFrame:
    """Semi-structured extraction: pull an integer field out of a JSON
    string column and aggregate it per group.

    ``from_json`` with an explicit schema is the scale path — it parses
    once into a typed struct inside whole-stage codegen (a JSON scan with
    schema inference would read the data twice; repeated
    ``get_json_object`` calls re-parse the string per field). Extraction is
    map-side; the only shuffle is the final low-cardinality aggregate.
    """
    parsed = F.from_json(F.col(json_col), f"{field} BIGINT")
    return (df.select(F.col(group_col), parsed[field].alias("_v"))
              .groupBy(group_col)
              .agg(F.count("_v").alias("n_present"),
                   F.sum("_v").alias("sum_v"),
                   F.min("_v").alias("min_v"),
                   F.max("_v").alias("max_v"))
              .orderBy(group_col))


def pivot_counts(df: DataFrame, row_key: str, pivot_col: str,
                 pivot_values: Sequence[str]) -> DataFrame:
    """Pivot (long → wide) with an EXPLICIT pivot-value list: one hash
    aggregate producing one conditional-count column per value.

    The explicit list matters at scale: ``pivot`` without values first runs
    a distinct-collect job over 100 TB to discover columns (and can blow
    the 10k-column default cap on high-cardinality keys); with values the
    plan is a single aggregate, identical to hand-written CASE WHEN sums —
    which is also exactly what the SQL oracle writes.
    """
    return (df.groupBy(row_key)
              .pivot(pivot_col, list(pivot_values))
              .count()
              .na.fill(0, list(pivot_values))
              .orderBy(row_key))
