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


def parse_csv_routed(lines: DataFrame, schema: T.StructType,
                     value_col: str = "value",
                     corrupt_col: str = "_corrupt") -> DataFrame:
    """P1 with a dead-letter lane — the production form of the reference's
    parse map (AuditTrail.java:15-30, which would throw on a malformed
    line and kill the job): PERMISSIVE ``from_csv`` keeps every row,
    lines that don't fit the schema surface their raw text in ``raw`` and
    route to ``'dead'``; clean rows parse to typed fields and route to
    ``'ok'``. Typed fields are explicitly nulled on the dead lane so the
    contract is all-or-nothing per row (no half-parsed records downstream
    — the parser's partial-fill behavior on malformed input is
    implementation detail, not API).

    Map-side only: one ``from_csv`` expression, no shuffle; at scale the
    dead lane is a filter over the same scan (write it to a quarantine
    sink, alert on its rate).
    """
    ddl = schema_ddl(schema) + f", {corrupt_col} string"
    parsed = lines.select(
        F.from_csv(F.col(value_col), ddl,
                   {"mode": "PERMISSIVE",
                    "columnNameOfCorruptRecord": corrupt_col}).alias("r")
    ).select("r.*")
    ok = F.col(corrupt_col).isNull()
    return parsed.select(
        *[F.when(ok, F.col(f.name)).otherwise(F.lit(None)).alias(f.name)
          for f in schema.fields],
        F.when(ok, F.lit("ok")).otherwise(F.lit("dead")).alias("route"),
        F.col(corrupt_col).alias("raw"))
