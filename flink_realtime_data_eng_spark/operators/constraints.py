"""Declarative data-quality constraint suite — one scan, one verdict table.

Deequ-style checks (completeness, uniqueness, range, accepted values,
volume) declared as specs and compiled into a SINGLE aggregate over the
input: every check contributes a (metric, basis) pair of exact BIGINT
counters to one ``df.agg(...)``, and the verdict table is unpivoted from
that one row driver-side-free (``inline`` over literal structs). At
100 TB this is exactly one pass over the data regardless of how many
checks are declared — the property that makes a DQ gate affordable in
front of every ingest.

All metrics are exact integer counts (no ratios, no rounding), so the
verdict table hash-matches a plain-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: a check is (name, metric expr, basis expr, pass-op) with op ∈ {eq, ge}
Check = tuple[str, Column, Column, str]


def completeness(col: str) -> Check:
    """Every row has a non-null value: count(col) == count(*)."""
    return (f"completeness:{col}", F.count(F.col(col)),
            F.count(F.lit(1)), "eq")


def uniqueness(col: str) -> Check:
    """No duplicate non-null values: countDistinct(col) == count(col)."""
    return (f"uniqueness:{col}", F.countDistinct(F.col(col)),
            F.count(F.col(col)), "eq")


def in_range(col: str, lo: float, hi: float) -> Check:
    """Every non-null value within [lo, hi]."""
    metric = F.count(F.when(F.col(col).between(lo, hi), 1))
    return (f"in_range:{col}:{lo}:{hi}", metric, F.count(F.col(col)), "eq")


def accepted_values(col: str, values: Sequence[str]) -> Check:
    """Every non-null value drawn from the accepted set."""
    metric = F.count(F.when(F.col(col).isin(list(values)), 1))
    vals = ",".join(sorted(str(v) for v in values))
    return (f"accepted_values:{col}:{vals}", metric,
            F.count(F.col(col)), "eq")


def min_rows(n: int) -> Check:
    """Volume floor: at least n rows arrived."""
    return (f"min_rows:{n}", F.count(F.lit(1)), F.lit(n), "ge")


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Compile the specs into ONE aggregate (a countDistinct among plain
    counts turns it into a single expand+agg — still one scan of df) and
    unpivot the single row into (check, metric, basis, passed)."""
    aggs = []
    for i, (_, num, den, _) in enumerate(checks):
        aggs.append(num.cast("bigint").alias(f"_n{i}"))
        aggs.append(den.cast("bigint").alias(f"_d{i}"))
    row = df.agg(*aggs)
    structs = []
    for i, (name, _, _, op) in enumerate(checks):
        n, d = F.col(f"_n{i}"), F.col(f"_d{i}")
        passed = (n >= d) if op == "ge" else (n == d)
        structs.append(F.struct(
            F.lit(name).alias("check"),
            n.alias("metric"), d.alias("basis"),
            passed.alias("passed")))
    return (row.select(F.inline(F.array(*structs)))
            .orderBy("check"))
