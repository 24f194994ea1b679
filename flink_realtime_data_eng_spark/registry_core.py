"""Shared registry plumbing: session prep, table loaders, oracle fragments, and the QUERIES/ORACLES/STREAMING_DEMOS containers every registry_* chunk registers into.

Split out of the original registry.py (r9); statement text is
verbatim so per-query content hashes are unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .functions import (contamination, dedup, filtering, multimodal, packing,
                        pii, similarity, sketches, text)
from .operators import (funnel, joins, projections, rollup, split_merge, stateful,
                        stats, windows)
from .plans import relational
from .schemas import load_table

# ---------------------------------------------------------------------------
# Session prep: the driver runs queries on ITS OWN SparkSession; make the two
# confs correctness depends on explicit (both are runtime-settable SQL confs).
# ---------------------------------------------------------------------------


def _prep(spark: SparkSession) -> SparkSession:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet is TIMESTAMP(NANOS); without this the scan throws.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(_prep(spark), sf_dir, "events")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(_prep(spark), sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(_prep(spark), sf_dir, "embeddings")


# Shared oracle fragments ----------------------------------------------------

_EV = "SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value FROM events"

# Normalized text: lowercase, strip non-alnum, squeeze spaces, trim — must
# mirror dedup._norm / text.fingerprint exactly.
_NORM_SQL = ("trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
             " ' +', ' ', 'g'))")

_H32 = "CAST(concat('0x', substring(md5({x}), 1, 8)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Shared registry containers — every registry_* chunk registers into these
# (the chunks are executed, in original definition order, by registry.py).
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
STREAMING_DEMOS: set[str] = set()
