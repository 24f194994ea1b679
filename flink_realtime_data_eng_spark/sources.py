"""Streaming sources (SURVEY §2.1 S1/S2).

S1 — file-monitor text source. The reference tails a directory with a 1 s
poll and emits each line (FileSource.forRecordStreamFormat +
monitorContinuously, chapter2/BasicStreamingOperations.java:50-60). Spark's
file streaming source natively discovers new files each micro-batch;
``maxFilesPerTrigger`` paces ingestion like the poll interval.

S2 — Kafka source. The reference consumes one topic value-only with latest
offsets (chapter3/WindowingOperations.java:47-60). Spark's Kafka source is
``format("kafka")``; it needs the spark-sql-kafka package on the classpath
and a live broker, neither of which exists in this container — the builder
is constructed (options verified in tests) but only ``load()``-ed on demand.

At scale: the file source lists directories on the driver — for 100 TB
landing zones use fewer, larger files (maxFilesPerTrigger × file size
governs micro-batch size) and a compacted metadata log; the Kafka source
maps partitions 1:1 to tasks, so topic partition count bounds parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming import DataStreamReader

from .operators.projections import parse_csv_lines


def file_text_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """S1: unbounded stream of text lines from files appearing under ``path``.

    Mirrors chapter2/BasicStreamingOperations.java:50-60 (TextLineInputFormat,
    1 s monitor): each discovered file's lines become rows ``value: string``.
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def file_csv_stream(spark: SparkSession, path: str, schema: T.StructType,
                    max_files_per_trigger: int | None = None,
                    quoted: bool = True) -> DataFrame:
    """S1 typed variant: text lines parsed to ``schema`` via the same
    ``from_csv`` path the batch P1 operator uses (strip quotes, split).

    Parsing happens after the source, exactly like the reference's parse map
    (P1) — so malformed lines surface as nulls, not source failures.
    """
    from .operators.projections import schema_ddl
    lines = file_text_stream(spark, path, max_files_per_trigger)
    return parse_csv_lines(lines, schema) if quoted else lines.select(
        F.from_csv("value", schema_ddl(schema)).alias("r")).select("r.*")


def kafka_options(topic: str,
                  bootstrap_servers: str = "kafka-broker:9092",
                  group_id: str = "flink.learn.realtime",
                  starting_offsets: str = "latest") -> dict[str, str]:
    """S2 option set, parity with chapter3/WindowingOperations.java:47-60:
    value-only string records, consumer group, latest offsets."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "kafka.group.id": group_id,
        "startingOffsets": starting_offsets,
    }


def kafka_stream_reader(spark: SparkSession, topic: str,
                        **overrides: str) -> DataStreamReader:
    """S2: configured (not loaded) Kafka reader. Call ``.load()`` then
    :func:`kafka_values` where a broker + the spark-sql-kafka package exist
    (neither does in this container)."""
    return spark.readStream.format("kafka").options(
        **{**kafka_options(topic), **overrides})


def kafka_values(kafka_df: DataFrame) -> DataFrame:
    """Value-only string deserialization (SimpleStringSchema analog)."""
    return kafka_df.selectExpr("CAST(value AS STRING) AS value")


def jsonl_read(spark: SparkSession, path: str,
               schema: T.StructType) -> DataFrame:
    """JSON-Lines batch reader with an EXPLICIT schema — the interchange
    format LLM-data pipelines actually move documents in. The schema is
    mandatory by design: on a 100 TB landing zone, schema inference is a
    full extra pass over the data and silently widens types on dirty
    rows; a declared StructType makes the scan single-pass and malformed
    rows surface as nulls (pair with a dead-letter filter, the
    parse_csv_routed pattern)."""
    return spark.read.schema(schema).json(path)


def jsonl_stream(spark: SparkSession, path: str, schema: T.StructType,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """S1 in JSONL form: the file-monitor source parsing each line as a
    JSON object of ``schema`` — same discovery/pacing semantics as the
    text/CSV variants."""
    reader = spark.readStream.schema(schema).format("json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


# ---------------------------------------------------------------------------
# S3 as a FIRST-CLASS source: Spark 4 Python DataSource API
# ---------------------------------------------------------------------------

def _h32_py(prefix: str, v: object) -> int:
    """Python twin of dedup._md5_hash32 — int(first 8 hex of
    md5('prefix:value')). Keeping the identical construction is what
    makes the generated records SQL-replayable."""
    import hashlib
    return int(hashlib.md5(f"{prefix}:{v}".encode()).hexdigest()[:8], 16)


# The frde_audit source's declared schema, exported ONCE: readers that pass
# an explicit schema to skip the plan-time Python schema probe
# (x_datasource_scan, bench warmup) must stay byte-identical to
# AuditDataSource.schema() or the read misparses — a single constant cannot
# drift.
AUDIT_SCHEMA_DDL = ("id bigint, user string, entity string, "
                    "operation string, ts_ms bigint, duration int, cnt int")


try:  # pyspark >= 4 only; the module stays importable elsewhere
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        InputPartition,
                                        SimpleDataSourceStreamReader)

    class AuditDataSource(DataSource):
        """The reference's audit-trail generator
        (datasource/FileStreamDataGenerator.java:35-110) re-expressed as
        a REAL Spark data source instead of files-on-disk: register once,
        then ``spark.read.format("frde_audit").option("n", ...)`` scans
        it like any table. Records derive every field from md5(i) (same
        _md5_hash32 construction as the dedup family), so the source is
        deterministic across runs, partitions, and ENGINES — DuckDB can
        replay the exact rows, which is what lets a generated source
        carry a correctness oracle at all.

        Scale shape: ``partitions()`` splits the id range into
        contiguous slices, one ``read()`` per task — generation is
        embarrassingly parallel and driver-free, the property the
        reference's single-threaded file-writer generator lacks."""

        @classmethod
        def name(cls) -> str:
            return "frde_audit"

        def schema(self) -> str:
            return AUDIT_SCHEMA_DDL

        def reader(self, schema) -> "AuditReader":
            return AuditReader(self.options)

        def simpleStreamReader(self, schema) -> "AuditStreamReader":
            return AuditStreamReader(self.options)

    _AUDIT_USERS = ["Tom", "Harry", "Bob"]
    _AUDIT_ENTITIES = ["Customer", "SalesRep"]
    _AUDIT_OPERATIONS = ["Create", "Modify", "Query", "Delete"]

    def _audit_tuples(lo: int, hi: int, base: int, step: int) -> list:
        """The deterministic audit rows for ids [lo, hi) as plain tuples —
        shared by the batch reader (which repacks them into one Arrow
        RecordBatch) and the Simple stream reader (whose prefetch cache
        pickles tuples, not Arrow batches)."""
        return [(i,
                 _AUDIT_USERS[_h32_py("au", i) % len(_AUDIT_USERS)],
                 _AUDIT_ENTITIES[_h32_py("ae", i) % len(_AUDIT_ENTITIES)],
                 _AUDIT_OPERATIONS[_h32_py("ao", i)
                                   % len(_AUDIT_OPERATIONS)],
                 base + i * step,
                 _h32_py("ad", i) % 10 + 1,
                 _h32_py("ac", i) % 4 + 1)
                for i in range(lo, hi)]

    class AuditReader(DataSourceReader):
        USERS = _AUDIT_USERS
        ENTITIES = _AUDIT_ENTITIES
        OPERATIONS = _AUDIT_OPERATIONS

        def __init__(self, options):
            self.n = int(options.get("n", 100))
            self.parts = int(options.get("parts", 8))
            self.base = int(options.get("base_ts_ms", 1_700_000_000_000))
            self.step = int(options.get("step_ms", 1000))

        def partitions(self):
            per = max(1, (self.n + self.parts - 1) // self.parts)
            return [InputPartition((lo, min(lo + per, self.n)))
                    for lo in range(0, self.n, per)]

        def read(self, partition):
            # One Arrow RecordBatch per partition instead of 1 pickled
            # tuple per row: the md5 loop is the same, but the
            # Python->JVM hop becomes a single columnar transfer (the
            # API accepts pyarrow.RecordBatch iterators since Spark 4).
            import pyarrow as pa
            lo, hi = partition.value
            rows = _audit_tuples(lo, hi, self.base, self.step)
            cols = list(zip(*rows)) if rows else [[]] * 7
            types = [pa.int64(), pa.string(), pa.string(), pa.string(),
                     pa.int64(), pa.int32(), pa.int32()]
            yield pa.RecordBatch.from_arrays(
                [pa.array(list(c), t) for c, t in zip(cols, types)],
                names=["id", "user", "entity", "operation", "ts_ms",
                       "duration", "cnt"])

    class AuditStreamReader(SimpleDataSourceStreamReader):
        """Streaming twin of AuditReader — the audit generator as a REAL
        Structured Streaming source (no files, no Kafka): offsets are
        plain record indices, each micro-batch emits the next
        ``batch_size`` ids, and ``readBetweenOffsets`` regenerates any
        range on replay (md5 determinism makes replay exact — the
        at-least-once contract costs nothing). When the index reaches
        ``n`` the offset stops advancing and availableNow drains."""

        def __init__(self, options):
            self.n = int(options.get("n", 100))
            self.batch = int(options.get("batch_size", 1000))
            self.base = int(options.get("base_ts_ms", 1_700_000_000_000))
            self.step = int(options.get("step_ms", 1000))

        def initialOffset(self):
            return {"i": 0}

        def _rows(self, lo: int, hi: int):
            # tuples, NOT the batch reader's Arrow path: the Simple
            # reader's prefetch cache pickles rows, and the engine treats
            # any non-empty list as "records emitted" — a 0-row
            # RecordBatch object would trip SIMPLE_STREAM_READER_OFFSET_
            # DID_NOT_ADVANCE at the drained offset
            return _audit_tuples(lo, hi, self.base, self.step)

        def read(self, start):
            lo = int(start["i"])
            hi = min(lo + self.batch, self.n)
            # an iterator over a MATERIALIZED list: the engine wrapper
            # probes it with next() on empty batches AND pickles the
            # prefetched rows — a bare list fails the first, a bare
            # generator the second.
            return iter(self._rows(lo, hi)), {"i": hi}

        def readBetweenOffsets(self, start, end):
            return iter(self._rows(int(start["i"]), int(end["i"])))

    def register_audit_source(spark: SparkSession) -> None:
        """Idempotent per-session registration."""
        try:
            spark.dataSource.register(AuditDataSource)
        except Exception:
            pass  # already registered in this session

except ImportError:  # pragma: no cover - pyspark < 4
    AuditDataSource = None  # type: ignore[assignment]

    def register_audit_source(spark: SparkSession) -> None:
        raise NotImplementedError("Python DataSource API needs pyspark>=4")
