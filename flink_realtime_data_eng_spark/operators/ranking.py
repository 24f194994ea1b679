"""Ranking / top-k operators (not in the reference — SURVEY §2.8 notes it has
no sorts/limits/top-k; these are required engine surface for the analytics +
similarity-search paths).

Top-k per group = window row_number ≤ k: one shuffle on the group key, heap-
based TopK inside each partition (Spark's WindowExec with a rank limit prunes
via ``rank <= k`` pushdown in recent versions); never a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def top_k_per_group(df: DataFrame, group: Sequence[str],
                    order: Sequence[Column], k: int,
                    rank_col: str = "rk") -> DataFrame:
    w = W.partitionBy(*group).orderBy(*order)
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))
