"""Row-level transforms: parse / project / filter (SURVEY §2.3 P1-P4).

The reference parses each CSV line with a hand-written map
(/root/reference/.../chapter2/AuditTrail.java:15-30) and projects records to
tuples with per-record map functions. Here parsing is a single ``from_csv``
expression (JVM-side, codegen'd, pushdown-friendly) and projections are plain
``select`` — whole-stage codegen fuses them into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def schema_ddl(schema: T.StructType) -> str:
    """Flat-schema DDL string for ``from_csv`` — the one place this string
    is built (batch and streaming parse paths share it)."""
    return ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in schema.fields)


def parse_csv_lines(lines: DataFrame, schema: T.StructType,
                    value_col: str = "value") -> DataFrame:
    """P1: CSV line -> typed record.

    Reference parity: strips opencsv double-quotes then splits on commas
    (AuditTrail.java:18-20). ``from_csv`` handles quoting natively; the
    ``regexp_replace`` fallback reproduces the reference's cruder strip-then-
    split for byte-exact parity on quoted inputs.
    """
    return lines.select(
        F.from_csv(F.regexp_replace(F.col(value_col), '"', ""),
                   schema_ddl(schema)).alias("r")
    ).select("r.*")


def project(df: DataFrame, *cols: Column | str) -> DataFrame:
    """P3: record -> tuple projections are just ``select`` (narrow, fused)."""
    return df.select(*cols)


def filter_sentinel(df: DataFrame, col: str, sentinel: str) -> DataFrame:
    """P4: drop sentinel rows (StatefulOperations.java:120-126 drops
    ``("No-Alerts", 0)`` tuples). In this engine stateful ops emit only real
    alerts, but the standalone filter is part of the operator surface."""
    return df.filter(F.col(col) != F.lit(sentinel))
