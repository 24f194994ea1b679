"""Stream split (side outputs) and merge (connect/CoMap) — SURVEY §2.3 P5/P6.

Reference: a ProcessFunction routes ``entity == "Customer"`` records to the
main output and everything else (projected to ``(user, 1)``) to a side output
with a *different schema* (StreamSplitAndCombine.java:72-100); the two branches
are then re-unified by tagging each side with a stream label through a
CoMapFunction and connecting (:112-128).

Spark-first: a split is two filters over one DataFrame (Catalyst pushes each
predicate into the shared scan; for streaming, fan out inside one
``foreachBatch`` so the source is read once). A merge is schema-normalizing
``select`` + ``unionByName`` — exactly what CoMap does, declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def split_by_predicate(df: DataFrame, predicate) -> tuple[DataFrame, DataFrame]:
    """P5: (matching, non-matching). Each side is a filter over the same plan;
    the caller projects the side output to its own schema."""
    return df.filter(predicate), df.filter(~predicate)


def tag_and_merge(left: DataFrame, right: DataFrame,
                  left_tag: str = "Stream-1", right_tag: str = "Stream-2",
                  key_col: str = "user") -> DataFrame:
    """P6: normalize both branches to (src, key, one) and union.

    Parity with the CoMapFunction at StreamSplitAndCombine.java:115-128 which
    emits Tuple3(tag, user, 1) from either input.
    """
    def norm(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.lit(tag).alias("src"),
            F.col(key_col).cast("string").alias("key"),
            F.lit(1).alias("one"),
        )
    return norm(left, left_tag).unionByName(norm(right, right_tag))
