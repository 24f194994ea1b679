"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in :mod:`flink_realtime_data_eng_spark.registry`.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_realtime_data_eng_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"
_HERE = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return registry.q1_pricing_summary(spark, SMOKE_SF_DIR)


def _last_verified_round() -> dict[str, int]:
    """name -> latest round whose CORRECTNESS_r*.json records a pass,
    EXPIRED when the query's code changed since that pass.

    A green only counts while the query's current content hash (function
    source + oracle, tools/query_hashes.py) still equals the hash the
    green was recorded against in query_hashes.json — the r6 ADVICE
    case (x_ivf_topk re-algorithmed after its r5 green) demotes back to
    never-verified and re-queues automatically.
    """
    best: dict[str, int] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        for name, res in data.items():
            ok = res.get("hash_match") is True or (
                res.get("hash_match") is None and not res.get("err")
                and res.get("spark_rows") is not None)
            if ok:
                best[name] = max(best.get(name, 0), rnd)
    try:
        with open(os.path.join(_HERE, "query_hashes.json")) as f:
            ledger = json.load(f)
        sys.path.insert(0, _HERE)
        from tools.query_hashes import content_hashes
        cur = content_hashes()
        for name in list(best):
            green = ledger.get(name, {}).get("green_hash")
            if green is None or green != cur.get(name):
                del best[name]
    except Exception:
        pass  # no ledger → fall back to raw correctness history
    return best


#: Queries this round's VERDICT demands driver evidence for — they jump
#: the never-verified queue so a >50-query backlog can't starve them.
_PRIORITY = (
    # r9 must-verify: the 3 new ops + the 6 greens expired by the
    # adaptive-planes scale fix (all locally dual-SF hash-green; the
    # adaptive set additionally engine-vs-oracle-proven at /tmp sf1
    # where planes=12 actually diverges from the old fixed-8 form).
    "x_exact_substr_spans",
    "x_token_budget_select",
    "x_curriculum_order",
    "x_embedding_neardup_lsh",
    "x_semdedup_keep",
    "x_joint_dedup",
    "x_joint_dedup_persisted",
    "x_full_dedup_policy",
    "x_training_manifest",
    "x_simhash",
    "x_simhash_pairs",
    "x_pq_incremental",      # green expired by the r9 cache-tag ADVICE fix
    # The 23 never-driver-verified queries (VERDICT r7 next-1): all are
    # locally dual-SF hash-green; landing them makes 290/290 driver-backed.
    "x_cdc_snapshot",
    "x_cdc_stream",
    "x_dq_checks",
    "x_incremental_aggview",
    "x_statestore_read",
    "x_datasource_scan",
    "x_datasource_stream",
    "x_udtf_chunks",
    "x_recursive_ancestors",
    "x_bfs_hops",
    "x_lpa_communities",
    "x_cc_incremental",
    "x_golden_record",
    "x_filter_agreement",
    "x_source_overlap",
    "x_pareto_docs",
    "x_maxsim_labels",       # also the r7 scale fix — must re-prove
    "x_seasonal_mae",
    "x_share_report",
    "x_dynamic_overwrite",
    "x_observe_metrics",
    "x_chained_windows_stream",
    "x_join_agg_stream",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.9).

    The verify harness checks a bounded prefix of this dict per round
    (r02 recorded exactly the first 50 of 102). To accumulate oracle
    evidence for EVERY query across rounds, order by (last round the
    query verified clean-on-current-code, priority, registry order):
    never-verified / previously-failing / changed-since-green queries go
    first (VERDICT-flagged names among them first of all), queries that
    already hash-matched most recently go last. Deterministic at call
    time.
    """
    order = list(registry.QUERIES)
    best = _last_verified_round()
    ranked = sorted(order, key=lambda n: (
        best.get(n, -1),
        0 if n in _PRIORITY else 1,
        order.index(n)))
    return {n: registry.QUERIES[n] for n in ranked}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; keys without an oracle
    get the driver's weaker rows-only check."""
    return dict(registry.ORACLES)
