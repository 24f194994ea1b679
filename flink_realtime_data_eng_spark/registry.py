"""Driver-contract query registry: every implemented operator from SURVEY §2
(plus the LLM-pipeline extensions) as a ``(spark, sf_dir) -> DataFrame``
callable paired with an ANSI-SQL DuckDB oracle.

Cross-engine hash-match rules observed throughout:

- Integer outputs are BIGINT on both sides (DuckDB SUM(BIGINT) returns
  HUGEINT → always ``CAST(... AS BIGINT)`` in the oracle; Spark narrow ints
  are ``.cast("bigint")``-ed). ``row_number`` stays INT on both sides.
- Monetary/double measures go through per-row fixed-point (×10⁴ BIGINT)
  before summing, so sums are byte-exact regardless of partition ordering.
- Ratios/scores are double divisions of exact integers, written with the
  SAME association order in both engines, rounded to 6 decimals (both
  engines round half-away-from-zero for positives).
- Timestamps are compared as epoch-ms BIGINT (``unix_millis`` ↔
  ``epoch_ms``); ``events.ts`` is TIMESTAMP(NANOS) parquet — Spark reads
  ns-as-long (``div 1000000``), DuckDB truncates to µs then ``epoch_ms``
  floors — identical for the post-1970 fixture data.
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all default.
- md5-derived hashes (dedup/minhash/simhash) reproduce as
  ``CAST('0x' || substring(md5(x), 1, 8) AS BIGINT)`` ↔ Spark
  ``conv(substring(md5(x), 1, 8), 16, 10)``.

This module is the ASSEMBLER for the registry_* chunk modules (split
in r9 to keep every file under ~3,000 lines): it executes them in the
original definition order and re-exports every top-level name, so
``registry.QUERIES`` / ``registry.ORACLES`` / ``registry.<helper>``
keep working for the driver, bench.py, tools/ and tests/.
"""

from . import (  # noqa: F401 — import order IS registration order
    registry_core,
    registry_ops,
    registry_llm,
    registry_catalog,
    registry_ext_a,
    registry_ext_b,
    registry_ext_c,
    registry_ext_d,
)

_CHUNKS = (registry_core, registry_ops, registry_llm, registry_catalog, registry_ext_a, registry_ext_b, registry_ext_c, registry_ext_d)

# Re-export every top-level name (public AND private: tests and
# tools reach registry._events / registry.x_* / registry._*_oracle).
# Collisions of DIFFERENT objects under one name would silently resolve
# to the first chunk's version for anything reached via registry.<name>,
# so they are a hard error; re-exports of the identical object (shared
# imports like F, SparkSession) are fine.
for _m in _CHUNKS:
    for _k, _v in vars(_m).items():
        if _k.startswith('__'):
            continue
        _prev = globals().get(_k, _v)
        if _prev is not _v:
            raise ImportError(
                f"registry chunk name collision: {_k!r} is defined with "
                f"different values in multiple registry_* chunks "
                f"(latest: {_m.__name__}); rename the chunk-private helper"
            )
        globals()[_k] = _v
del _m, _k, _v, _prev
