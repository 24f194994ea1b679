"""Deterministic file-backed Kafka stand-in (S2/K2 test harness).

No broker exists in this container, so the real ``format("kafka")``
reader/writer (sources.kafka_stream_reader / sinks.kafka_sink) has
never executed here — the one "code exists, never ran" surface the r7
VERDICT flagged. This module closes as much of that gap as a sandbox
allows: an embedded topic that reproduces the Kafka **DataFrame
contract** bit-for-bit, so every adapter AROUND the broker (S4 record
building, S2 value deserialization, downstream parses/windows, the K2
value/key column requirements, per-partition offset semantics) runs
under pytest against the same schema a live broker would produce.

What is emulated faithfully:

- **Source schema parity**: :func:`read_stream`/:func:`read_batch`
  return exactly the 7 columns Spark's Kafka source emits — key BINARY,
  value BINARY, topic STRING, partition INT, offset BIGINT, timestamp
  TIMESTAMP, timestampType INT — so ``sources.kafka_values`` and any
  downstream pipeline run unchanged against either implementation.
- **Partitioning**: records hash to partitions by md5(key) (sticky for
  null keys), and offsets are dense and monotonic PER PARTITION —
  ordering is guaranteed within a partition only, exactly Kafka's
  contract.
- **Producer semantics**: :func:`standin_sink` is a foreachBatch
  producer with AT-LEAST-ONCE delivery — a replayed micro-batch
  re-appends its records, matching sinks.kafka_sink's documented
  semantics (NOT the reference's transactional exactly-once; that gap
  and its commit-manifest mitigation are documented in sinks.py).

What is NOT emulated: broker failover, consumer groups/rebalancing,
transactions, compaction. The stand-in appends on the DRIVER (it plays
the broker role, which is single-writer by definition here) — bounded
test volumes only; production uses ``format("kafka")`` unchanged.

Layout: ``<topic_dir>/data/*.jsonl`` (key/value base64 so binary
payloads survive JSON), ``<topic_dir>/_meta.json`` (next offset per
partition).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: The on-disk JSONL schema (base64 for binary round-trip through JSON).
FILE_SCHEMA = T.StructType([
    T.StructField("key_b64", T.StringType()),
    T.StructField("value_b64", T.StringType()),
    T.StructField("topic", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("timestampType", T.IntegerType()),
])

#: Column names+types of Spark's real Kafka source output, in order.
KAFKA_SOURCE_SCHEMA = (
    ("key", "binary"), ("value", "binary"), ("topic", "string"),
    ("partition", "int"), ("offset", "bigint"),
    ("timestamp", "timestamp"), ("timestampType", "int"))


def _partition_for(key: str | bytes | None, n_partitions: int) -> int:
    """Deterministic md5 partitioner (Kafka's default is murmur2 — the
    CONTRACT being emulated is key-stickiness, not the exact hash)."""
    if key is None:
        return 0
    kb = key if isinstance(key, bytes) else str(key).encode()
    return int(hashlib.md5(kb).hexdigest()[:8], 16) % n_partitions


def _load_meta(topic_dir: str) -> dict:
    path = os.path.join(topic_dir, "_meta.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"next_offset": {}, "n_files": 0}


def _save_meta(topic_dir: str, meta: dict) -> None:
    path = os.path.join(topic_dir, "_meta.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)  # atomic publish, same idea as the manifest sink


def produce(topic_dir: str, topic: str,
            records: list[tuple[str | bytes | None, str | bytes]],
            n_partitions: int = 3,
            base_ts_ms: int = 1_700_000_000_000) -> int:
    """Append (key, value) records to the topic, assigning partitions by
    key hash and per-partition dense offsets. Returns records written.
    Plays the broker: single-writer, driver-side."""
    data_dir = os.path.join(topic_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    meta = _load_meta(topic_dir)
    nxt = meta["next_offset"]
    lines = []
    for i, (key, value) in enumerate(records):
        part = _partition_for(key, n_partitions)
        off = nxt.get(str(part), 0)
        nxt[str(part)] = off + 1
        kb = (key if isinstance(key, bytes)
              else str(key).encode()) if key is not None else None
        vb = value if isinstance(value, bytes) else str(value).encode()
        lines.append(json.dumps({
            # `is not None`, not truthiness: an EMPTY key (b'') must
            # round-trip as empty bytes — _partition_for already hashed
            # it (md5(b'')), so storing it as a null key would pair a
            # null key with a hashed partition, unlike a real broker.
            "key_b64": (base64.b64encode(kb).decode()
                        if kb is not None else None),
            "value_b64": base64.b64encode(vb).decode(),
            "topic": topic,
            "partition": part,
            "offset": off,
            "ts_ms": base_ts_ms + i,
            "timestampType": 0,  # CreateTime, Kafka's default
        }))
    fname = os.path.join(data_dir, f"batch-{meta['n_files']:06d}.jsonl")
    with open(fname + ".tmp", "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(fname + ".tmp", fname)  # files appear atomically, like K1
    meta["n_files"] += 1
    _save_meta(topic_dir, meta)
    return len(records)


def _to_kafka_schema(df: DataFrame) -> DataFrame:
    return df.select(
        F.unbase64("key_b64").alias("key"),
        F.unbase64("value_b64").alias("value"),
        "topic", "partition", "offset",
        F.timestamp_millis("ts_ms").alias("timestamp"),
        F.col("timestampType").cast("int").alias("timestampType"))


def read_stream(spark: SparkSession, topic_dir: str,
                max_files_per_trigger: int | None = None) -> DataFrame:
    """S2 stand-in: streaming read of the topic with the real Kafka
    source's 7-column schema — drop-in for
    ``kafka_stream_reader(...).load()``; feed to ``kafka_values``."""
    reader = spark.readStream.schema(FILE_SCHEMA).format("json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return _to_kafka_schema(reader.load(os.path.join(topic_dir, "data")))


def read_batch(spark: SparkSession, topic_dir: str) -> DataFrame:
    """Batch view of the topic (the consumer-side audit path)."""
    return _to_kafka_schema(
        spark.read.schema(FILE_SCHEMA)
        .json(os.path.join(topic_dir, "data")))


def standin_sink(df: DataFrame, topic_dir: str, topic: str,
                 checkpoint: str, n_partitions: int = 3):
    """K2 stand-in: foreachBatch producer with sinks.kafka_sink's exact
    column contract — a ``value`` (string or binary) column is REQUIRED,
    ``key`` optional — and its at-least-once semantics (a replayed batch
    re-appends). Driver-side append, test volumes only."""
    cols = dict(df.dtypes)
    if "value" not in cols:
        raise ValueError(
            "kafka sink contract: a 'value' column is required "
            f"(got {sorted(cols)})")

    def _produce_batch(batch_df: DataFrame, batch_id: int) -> None:
        has_key = "key" in cols
        sel = (["key", "value"] if has_key else ["value"])
        rows = batch_df.select(*sel).collect()  # stand-in broker is
        # driver-side by definition; bounded test volumes (see module doc)
        produce(topic_dir, topic,
                [(r["key"] if has_key else None, r["value"])
                 for r in rows],
                n_partitions=n_partitions)

    return (df.writeStream.foreachBatch(_produce_batch)
            .option("checkpointLocation", checkpoint))
