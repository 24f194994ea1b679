"""Bucketed-table helpers: co-located joins and aggregations.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Bucketing
pays that shuffle ONCE at write time: `bucketBy(n, key)` hash-partitions
rows into n files per partition and records the layout in the catalog;
every later equi-join or aggregation on the bucket key reads both sides
already co-partitioned — Catalyst plans a SortMergeJoin with NO Exchange
on either side (sorted buckets also skip the Sort). This is the batch
analog of the streaming state-store partitioning: decide the partition
key once, reuse it across every downstream stage.

Both sides must share the bucket count (or be multiples, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, buckets: int, *keys: str,
                   sort: bool = True, path: str | None = None) -> DataFrame:
    """Persist ``df`` as a catalog table bucketed (and bucket-sorted) by
    ``keys``; returns the catalog-backed frame whose scans carry the
    bucketing metadata joins need to elide exchanges.

    The pre-write ``repartition(buckets, *keys)`` matters: bucketBy writes
    one file per (input partition × bucket), and Spark only trusts bucket
    SORTEDNESS when each bucket is exactly one file — multi-file buckets
    keep the exchange elision but re-sort both join sides. Repartitioning
    on the bucket keys makes each task own whole buckets, so ``sort=True``
    can elide the Sort too — note Spark 3+ additionally requires
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` to consume
    bucket sort metadata at scan time (exchange elision needs no flag).
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    writer = (df.repartition(buckets, *[df[k] for k in keys])
                .write.mode("overwrite").format("parquet")
                .bucketBy(buckets, *keys))
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def register_bucketed(spark: SparkSession, table: str, path: str,
                      schema_ddl: str, buckets: int, *keys: str,
                      sort: bool = True) -> DataFrame:
    """Attach an EXISTING bucketed-parquet location to the current
    session's catalog (``CREATE TABLE ... CLUSTERED BY ... LOCATION``).

    Spark's default in-memory catalog forgets table metadata between
    sessions while the bucket files (bucket id encoded in each file name)
    persist on disk — so a restarted job re-registers the layout instead
    of re-paying the bucketing shuffle. The column list must be explicit:
    Spark refuses to infer a schema for a CREATE TABLE that carries
    bucketing info (SPECIFY_BUCKETING_IS_NOT_ALLOWED).
    """
    key_list = ", ".join(keys)
    sorted_by = f"SORTED BY ({key_list})" if sort else ""
    spark.sql(f"""
        CREATE TABLE IF NOT EXISTS {table} ({schema_ddl}) USING PARQUET
        CLUSTERED BY ({key_list}) {sorted_by} INTO {buckets} BUCKETS
        LOCATION '{path}'
    """)
    return spark.table(table)


def drop_bucketed(spark: SparkSession, *tables: str) -> None:
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def write_partitioned(df: DataFrame, path: str, *part_cols: str,
                      sort_cols: tuple[str, ...] = ()) -> DataFrame:
    """Hive-style partitioned parquet layout: one directory per partition
    value, so any filter on ``part_cols`` becomes partition PRUNING (the
    scan never opens non-matching directories — at 100 TB this is the
    difference between reading one day and reading three years).

    ``sort_cols`` additionally sorts rows WITHIN each output task
    (``sortWithinPartitions`` — no global sort) so parquet row-group
    min/max stats stay tight and predicate pushdown can skip row groups
    inside each partition too.

    Returns the read-back frame whose scans carry the partition metadata.
    """
    if not part_cols:
        raise ValueError("at least one partition column required")
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy(*part_cols).parquet(path)
    # Hive-style read-back moves partition columns last and type-infers
    # them from directory names (string '007' would come back as int 7);
    # passing the input schema pins partition-column types (no inference,
    # leading zeros survive) and a select restores column order, so the
    # round trip is schema-transparent. NULL partition values still
    # round-trip as __HIVE_DEFAULT_PARTITION__, an inherent property of
    # the layout.
    back = df.sparkSession.read.schema(df.schema).parquet(path)
    return back.select(*[f.name for f in df.schema.fields])


def write_range_sorted(df: DataFrame, path: str, *sort_cols: str,
                       num_files: int | None = None) -> DataFrame:
    """Globally-ordered parquet export WITHOUT a global sort: the final
    "sorted corpus shard" write (ids monotone across shard files, so a
    consumer can binary-search shards by filename order).

    ``repartitionByRange`` samples the sort key to build range boundaries
    (one pass over a sample, not the data), shuffles each row to its range,
    and ``sortWithinPartitions`` orders each shard locally — total order
    lives in (shard ranges are disjoint and ordered) × (each shard is
    sorted), with no single-reducer ORDER BY anywhere. The row-group
    min/max stats of each file are tight, so range predicates skip whole
    shards at scan time.

    Returns the read-back frame.
    """
    if not sort_cols:
        raise ValueError("at least one sort column required")
    out = df.repartitionByRange(*([num_files] if num_files else []),
                                *sort_cols)
    out.sortWithinPartitions(*sort_cols) \
       .write.mode("overwrite").parquet(path)
    back = df.sparkSession.read.schema(df.schema).parquet(path)
    return back.select(*[f.name for f in df.schema.fields])


def morton_code(a, b, bits: int = 8):
    """Z-order (Morton) interleave of two non-negative integer columns'
    low ``bits`` bits — pure integer Catalyst arithmetic (bit j of each
    input lands at positions 2j / 2j+1), reproducible in any SQL engine
    with the same div/mod formula.

    Z-ordering is the multi-column generalization of sorted layout: a sort
    on the interleaved code gives BOTH dimensions locality, so parquet
    row-group min/max stats stay tight on each raw column and a range
    predicate on either (or both) skips most row groups — where a plain
    sort on column A leaves column B's stats spanning the full domain.
    """
    from pyspark.sql import functions as FF
    ca = (a if not isinstance(a, str) else FF.col(a)).cast("bigint")
    cb = (b if not isinstance(b, str) else FF.col(b)).cast("bigint")
    code = FF.lit(0).cast("bigint")
    for j in range(bits):
        # exact bit extraction (shift+mask), never float division
        bit_a = FF.shiftrightunsigned(ca, j).bitwiseAND(FF.lit(1))
        bit_b = FF.shiftrightunsigned(cb, j).bitwiseAND(FF.lit(1))
        code = code + bit_a * (1 << (2 * j)) + bit_b * (1 << (2 * j + 1))
    return code


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   bits: int = 8, num_files: int = 8) -> DataFrame:
    """Z-ordered parquet layout over two dimensions: range-partition +
    locally sort by the Morton code (no global sort — same discipline as
    :func:`write_range_sorted`), so every output file/row group covers a
    compact 2-D tile of (col_a, col_b) space.

    Returns the read-back frame. The pruning payoff is measurable from
    parquet footer stats alone (see the row-group-skip test): a box
    predicate on the two raw columns overlaps only the tiles that
    intersect it, not every row group the way a single-column sort would.
    """
    code = morton_code(col_a, col_b, bits).alias("_z")
    out = (df.withColumn("_z", code)
             .repartitionByRange(num_files, "_z")
             .sortWithinPartitions("_z")
             .drop("_z"))
    out.write.mode("overwrite").parquet(path)
    back = df.sparkSession.read.schema(df.schema).parquet(path)
    return back.select(*[f.name for f in df.schema.fields])


def compact_files(spark: SparkSession, src_path: str, dst_path: str,
                  target_file_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Small-files compaction — the standing maintenance job of every
    streaming-ingest lake: rewrite a directory of many small parquet
    files into ``ceil(total_bytes / target)`` right-sized files.

    The output partition count comes from the ACTUAL on-disk bytes (not
    row counts), so the job self-tunes as the input grows; the rewrite is
    a round-robin ``repartition(n)`` — an all-to-all exchange of the data
    once, which is the point: pay one shuffle now so every later scan
    opens n files instead of thousands (file-open + footer-read overhead
    dominates small-file scans; a 100 TB table ingested in 1-minute
    micro-batches accretes ~500k files/year per partition dir without
    this). At scale, run per partition directory so each compaction job
    stays bounded and partition pruning is preserved.

    Returns the read-back compacted frame.
    """
    import math
    import os
    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n).write.mode("overwrite").parquet(dst_path)
    return spark.read.schema(df.schema).parquet(dst_path)
