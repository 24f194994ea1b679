"""Explicit StructTypes for every source + normalizing loaders.

The engine is schema-first: the reference parses untyped CSV lines at each
pipeline head (AuditTrail.java:15-30 in /root/reference); here every source
declares its StructType once and Catalyst prunes/pushes down against it.

Two schema families:

1. Reference stream records — ``AUDIT_TRAIL`` (FileStreamDataGenerator.java:58-76)
   and ``BROWSER_EVENT`` (BrowserStreamDataGenerator.java:65-66).
2. Driver batch tables at /root/testdata/sf*/ (FIXTURES.md §B).

``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as LongType under
``spark.sql.legacy.parquet.nanosAsLong=true``. :func:`load_table` normalizes it
to both an exact epoch-ms LongType (``ts_ms``, integer division — never float)
and a TimestampType (``ts``, µs precision) so windows/watermarks work while the
DuckDB oracle (µs-truncating reader) sees identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# --- Reference stream record types (SURVEY §1.1) -------------------------

# AuditTrail POJO: /root/reference/.../chapter2/AuditTrail.java:6-12
AUDIT_TRAIL = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("user", T.StringType()),
    T.StructField("entity", T.StringType()),
    T.StructField("operation", T.StringType()),
    T.StructField("timestamp", T.LongType()),  # epoch millis, as in reference
    T.StructField("duration", T.IntegerType()),
    T.StructField("count", T.IntegerType()),
])

# Browser event: /root/reference/.../chapter6/BrowserStreamDataGenerator.java:65-66
BROWSER_EVENT = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("user", T.StringType()),
    T.StructField("action", T.StringType()),
    T.StructField("timestamp", T.LongType()),  # epoch millis
])

# --- Driver batch tables (FIXTURES.md §B) --------------------------------

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table, normalizing time columns.

    events: raw ns LongType ``ts`` ->
      - ``ts``     TimestampType (µs, exact ``div 1000`` of ns)
      - ``ts_ms``  LongType epoch millis (exact ``div 1000000``)
      - ``ts_ns``  original nanos
    Other tables pass through (their timestamps are ms-precision parquet
    TIMESTAMP, which Spark reads natively).

    Local-master fixture parallelism: each driver table is ONE parquet file
    with ONE row group, so the scan — and every map-side stage fused onto it
    (regex normalization, hashing, parsing) — would run as a single task on
    a 32-core box. On local masters we repartition to the default
    parallelism right after the scan; shuffling these MB-scale fixtures
    costs milliseconds and unlocks the other 31 cores. On a cluster master
    this branch never runs: production datasets arrive as many files/row
    groups and the scan parallelizes natively, where an unconditional
    repartition would be a catastrophic full shuffle.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spark.sparkContext.master.startswith("local"):
        df = df.repartition(spark.sparkContext.defaultParallelism)
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) parquet read as long under nanosAsLong.
            df = (
                df.withColumn("ts_ns", F.col("ts"))
                  .withColumn("ts_ms", F.expr("ts_ns div 1000000"))
                  .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
            )
        else:
            # timestamp[us] (tz-naive) — session tz is UTC, so the cast to
            # TimestampType reads the wall-clock as UTC, matching DuckDB's
            # epoch_ms(ts) on the same file. Integer µs arithmetic only.
            df = (
                df.withColumn("ts", F.col("ts").cast("timestamp"))
                  .withColumn("ts_ms", F.expr("unix_micros(ts) div 1000"))
                  .withColumn("ts_ns", F.expr("unix_micros(ts) * 1000"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register each table as a temp view (for the SQL entry points)."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
