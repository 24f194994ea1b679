"""Oracle-output hygiene gates (r7).

Two correctness hazards were root-caused in rounds 6-7, both invisible to
the sf0.01 hash gate until a checker-environment change exposed them:

1. DuckDB types ``SUM(BIGINT)`` as HUGEINT (INT128) unless cast, and the
   only two driver hash-reds ever recorded were exactly the two oracles
   whose FINAL result emitted a HUGEINT column (a fetch path that
   materializes INT128 via pandas float64/object diverges on the value
   hash while rows and schema still match). Rule: every oracle's final
   columns must land on plain portable types.

2. The query-hash ledger (tools/query_hashes.py) is what expires stale
   driver greens when a query changes; it only works if it is kept in
   sync with the registry. Rule: the committed ledger covers exactly the
   registered queries and matches their current content hashes.
"""

from __future__ import annotations

import duckdb
import pytest

from flink_realtime_data_eng_spark import registry

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

#: Types a driver fetch path round-trips identically to Spark's collect().
PORTABLE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
            "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "BLOB",
            "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS "
                  f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_no_exotic_oracle_output_types(con):
    """No oracle may emit HUGEINT/DECIMAL/LIST/STRUCT final columns —
    wrap wide aggregates in CAST(... AS BIGINT) (values that genuinely
    exceed int64 must be re-scaled on BOTH engines instead)."""
    bad = {}
    for name, sql in registry.ORACLES.items():
        rel = con.sql(sql)  # bind/plan only; nothing is fetched
        exotic = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                  if str(t) not in PORTABLE]
        if exotic:
            bad[name] = exotic
    assert not bad, f"oracles with non-portable output columns: {bad}"


def test_query_hash_ledger_in_sync():
    """query_hashes.json must cover exactly the registered queries with
    current content hashes — run `python tools/query_hashes.py update`
    after adding or editing a query/oracle."""
    from tools.query_hashes import content_hashes, load
    ledger, cur = load(), content_hashes()
    missing = sorted(set(cur) - set(ledger))
    stale_rows = sorted(set(ledger) - set(cur))
    drifted = sorted(n for n in cur
                     if n in ledger and ledger[n]["hash"] != cur[n])
    assert not (missing or stale_rows or drifted), (
        f"ledger out of sync — missing={missing} removed={stale_rows} "
        f"drifted={drifted}; run: python tools/query_hashes.py update")
