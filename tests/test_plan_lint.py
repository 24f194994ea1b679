"""Plan lint: sweep EVERY registered batch query's physical plan for shapes
that break at 100 TB, regardless of whether they pass correctness at sf0.01.

Two rules:
1. No cartesian / broadcast-nested-loop join, except where the design
   genuinely wants one (1-row global-stats broadcasts, the brute-force ANN
   baseline whose corpus×queries product is the operator's definition).
2. No forced broadcast of an SF-scaled table: every BroadcastExchange /
   BroadcastQueryStage subtree must bottom out in a bounded dim (nation /
   region / supplier / part slice), a 1-row aggregate, or an
   already-reduced aggregate — approximated here by capping the broadcast
   side's row estimate at sf0.001, where SF-scaled tables are still ≥1000×
   a true dim.
"""

from __future__ import annotations

import pytest

from flink_realtime_data_eng_spark import registry

SF_DIR = "/root/testdata/sf0.001"

# Queries whose plan INTENTIONALLY contains a nested-loop/cartesian product:
#   - *_stats crossJoins of a 1-row global aggregate
#   - brute-force / pairwise similarity baselines (the all-pairs IS the op)
NESTED_LOOP_OK = {
    "q11_important_parts",      # 1-row total_e4 broadcast
    "q22_idle_rich_customers",  # 1-row stats broadcast
    "x_brute_force_topk",       # broadcast queries × corpus by design
    "x_ivf_topk",               # n_lists-row centroid frame broadcast
                                # (bounded trained artifact, never SF-scaled)
    "x_pq_topk",                # broadcast per-query ADC tables (bounded
                                # trained artifact: queries × m × ks ints)
    "x_ivfpq_topk",             # same bounded broadcast artifacts (coarse
                                # centroids + per-cell ADC tables)
    "x_pq_recall",              # persisted-index ADC + brute force (audit)
    "x_pq_persisted_topk",      # same bounded ADC-table broadcast, codes
                                # and codebook read from the persisted index
    "x_pq_incremental",         # same bounded ADC-table broadcast over
                                # base-codes UNION delta-codes
    "x_ivfpq_persisted_topk",   # same: coarse centroids + per-cell ADC
                                # tables broadcast over the persisted index
    "x_hard_negatives",         # brute-force anchor broadcast by design
    "x_knn_eval",               # brute-force anchor broadcast by design
    "x_contrastive_pairs",      # negatives side reuses the anchor
                                # broadcast; anchors are edge-bounded
    "x_fk_orphans",             # crossJoin of 1-row audit aggregates
    "x_token_budget_select",    # 1-row token-budget aggregate broadcast
                                # (band/prefix sums are all equi-joins)
    "x_curriculum_order",       # 1-row corpus-count broadcast (phase
                                # arithmetic); rank joins are equi-joins
    "x_rp_recall",              # brute-force audit on both sides
                                # (projected + full-dim), query broadcast
    "x_nb_source_classifier",   # |sources|-bounded model frame + 1-row
                                # vocab/total broadcasts
    "x_maxsim_labels",          # bounded 32-per-label query sample
                                # broadcast (ColBERT query-length cap;
                                # fixed size regardless of corpus SF)
    "x_dsir_weights",           # 1-row token-totals broadcast into the
                                # |buckets|-bounded weight table
    "x_kaplan_meier",           # 1-row observation-horizon broadcast
    "x_rrf_fusion",             # semantic leg's bounded 5-anchor
                                # broadcast (brute force baseline; ANN
                                # index at scale)
    "x_rag_retrieve",           # same brute-force retrieval stage inside
    "x_mmr_diversify",          # same brute-force retrieval stage; the
                                # MMR greedy itself is pair-scale
    "x_embedding_neardup",      # pairwise cosine on a bounded bucket
    "x_decontaminate",          # eval-set shingles broadcast (bounded)
    "x_source_mixture",         # 1-row corpus-total broadcast
    "x_json_stats",             # 1-row denominators broadcast
    "x_tfidf_topk",             # 1-row corpus-count (N) broadcast
    "x_collocations",           # 1-row token-total broadcast for PMI
    "x_unigram_logprob",        # 1-row (N, V) totals broadcast
    "x_bigram_logprob",         # 1-row vocabulary-size broadcast
    "x_freshness",              # 1-row corpus-max broadcast
    "x_quality_buckets",        # 1-row (N, V) totals broadcast (same CTE)
    "x_range_lookup",           # static 10-row bands dim broadcast by design
    "x_dedup_stats",            # crossJoin of four 1-row report aggregates
    "x_dedup_report",           # same crossJoin shape, clusters from parquet
    "x_bm25_topk",              # 1-row (N, avgdl) constants broadcast
    "x_bloom_prune",            # 1-row Bloom bitmap broadcast by design
    "x_join_size_estimate",     # crossJoin of two 1-row report aggregates
    "x_ab_test",                # crossJoin of the two 1-row cohort frames
    "x_psi_drift",              # dense grid + 1-row corpus-total broadcast
    "x_ks_test",                # 1-row (n1, n2) totals broadcast
    "x_heldout_ppl",            # 1-row (N, V) model-totals broadcast
    "x_target_encode",          # 1-row global-prior broadcast
    "x_benford",                # 1-row digit-total broadcast
    "x_rfm",                    # 1-row corpus-max broadcast
    "x_dim_recall",             # brute-force retrieval on both sides of
                                # the truncation audit (queries broadcast)
    "x_training_manifest",      # 1-row (N, V) totals broadcast inside the
                                # embedded quality verdict
    "x_domain_caps",            # 1-row (N, V) totals broadcast (unigram LM)
    "x_retrieval_metrics",      # brute-force ideal side of the eval
                                # (queries broadcast, the audit's definition)
    "x_quality_auc",            # 1-row (N, V) totals broadcast (unigram LM)
    "x_pareto_docs",            # 1-row (N, V) totals broadcast (unigram LM
                                # inside the quality key); the skyline
                                # itself is windows, never a self-join
    "x_seasonal_mae",           # dense test grid: |types| × 7-day × 24-hour
                                # broadcast ranges (bounded calendar dims)
}

BATCH_QUERIES = sorted(set(registry.QUERIES) - registry.STREAMING_DEMOS)


@pytest.fixture(scope="module")
def plans(spark):
    """One pass: build every batch query's executed plan string."""
    out = {}
    for name in BATCH_QUERIES:
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = plan.split("== Initial Plan ==")[0]
    return out


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_unintended_nested_loop_join(name, plans):
    plan = plans[name]
    has_nlj = ("CartesianProduct" in plan
               or "BroadcastNestedLoopJoin" in plan)
    if name in NESTED_LOOP_OK:
        return  # intended shape; nothing to assert either way (AQE may
                # legitimately simplify it into a plain broadcast join)
    assert not has_nlj, (
        f"{name}: unintended cartesian/nested-loop join at sf0.001 — "
        "this product grows quadratically with SF")


def test_nested_loop_whitelist_is_not_stale(plans):
    """Every whitelisted query must still exist; stale entries hide bugs."""
    assert NESTED_LOOP_OK <= set(BATCH_QUERIES)


def test_shuffle_budget_never_regresses(plans):
    """Shuffles are the budget: each query's (broadcast+hash) Exchange
    count at sf0.001 must not exceed its recorded budget in
    tests/shuffle_budgets.json. A failure means a change ADDED a shuffle —
    either fix the plan or consciously re-record the budget file."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "shuffle_budgets.json")
    budgets = json.load(open(path))
    over = {}
    for name, plan in plans.items():
        n = plan.count("Exchange ")
        if n > budgets.get(name, n):  # new queries pass until recorded
            over[name] = (n, budgets[name])
    assert not over, f"shuffle budget exceeded (got, budget): {over}"


SF_SCALED = ("lineitem.parquet", "orders.parquet", "customer.parquet",
             "part.parquet", "supplier.parquet")


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_forced_broadcast_of_sf_scaled_tables(name, spark):
    """Rule 2, enforced: a broadcast HINT pins the optimizer's hand, so it
    may only wrap bounded inputs — nation/region, literal frames, or
    already-aggregated/pair-scale results. A hint whose subtree reads an
    SF-scaled parquet WITHOUT an intervening Aggregate is a driver-OOM at
    100x (the round-1 q5 bug, generalized). AQE remains free to broadcast
    anything at runtime — this lints only the forced hints."""
    df = registry.QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().analyzed().toString()
    segs = plan.split("ResolvedHint")[1:]
    for seg in segs:
        # the hint's subtree is printed right below; stop at the next hint
        body = seg[:2000]
        for rel in SF_SCALED:
            if rel in body and "Aggregate" not in body.split(rel)[0]:
                raise AssertionError(
                    f"{name}: broadcast hint over un-aggregated {rel}")


# Queries whose plan INTENTIONALLY contains an unpartitioned (global)
# Window / WindowGroupLimit node. The r9 scale dry-run proved global
# windows are where one-task quadratic shapes hide (semdedup planes,
# simhash slices), so every entry here must state why its window INPUT
# is bounded — either by construction (grids, |sources|, |bands|,
# value cardinality) or by a documented aggregate-reduction with a
# written 100 TB escape hatch in the function's docstring.
GLOBAL_WINDOW_OK = {
    "q15_top_supplier":     # global max over the per-supplier AGGREGATE
        "aggregate-reduced (16 B/supplier); docstring documents the "
        "broadcast-the-max swap if supplier cardinality outgrows a task",
    "x_bpe_merges":         # top-merge rank over the pair-count aggregate
        "pair vocabulary bounded (within-word char/token bigrams)",
    "x_curriculum_order":   # band-offset prefix sum, tier 2 of two-tier
        "|bands| rows by construction (two-tier band-offset design)",
    "x_funnel":             # final global max over the per-step frame
        "|steps| rows (funnel step list is a query constant)",
    "x_global_offsets":     # partition-totals cumsum of global_prefix_sum
        "|shuffle partitions| rows (two-phase distributed prefix sum)",
    "x_heaps_law":          # cumulative vocab curve over the doc grid
        "|grid| rows (100-doc buckets of first-occurrence aggregate)",
    # x_kmeans_assign's init rank (k rows after limit(k)) runs inside a
    # localCheckpoint during plan construction, so the final plan the
    # lint sees has no Window node — nothing to whitelist.
    "x_kaplan_meier":       # at-risk + log-survival cumsums
        "distinct duration days — value-cardinality bounded by the "
        "observation window",
    "x_ks_test":            # two ECDF cumsums over merged value set
        "distinct n_chars values — value-cardinality bounded",
    "x_mixture_allocation": # allocation waterfall over source weights
        "|sources| rows",
    "x_pareto_docs":        # skyline prefix-max over the quality order
        "aggregate-reduced per-doc frame; exact skyline is a report-set "
        "op — band-partitioned prefix-max is the 100 TB swap",
    "x_quality_buckets":    # exact ntile over the quality key
        "docstring documents quality_buckets_approx as the 100 TB path "
        "(approx-quantile cutoffs, map-side assignment; pytest-checked)",
    "x_rfm":                # three ntile ranks over the per-user aggregate
        "aggregate-reduced; docstring documents the global_prefix_sum "
        "swap at billion-user scale",
    "x_source_mixture":     # mixture shares over per-source aggregate
        "|sources| rows",
    "x_temperature_sample": # per-source keep probabilities
        "|sources| rows",
    "x_token_budget_select":  # band-offset prefix sum, tier 2
        "|bands| rows by construction (two-tier band-offset design)",
    "x_training_manifest":  # embedded token-budget selection, tier 2
        "|bands| rows (same two-tier budget-selection subplan)",
}


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_unintended_global_window(name, plans):
    """An unpartitioned Window funnels its whole input through ONE task —
    the shape that turned x_semdedup_keep super-linear before r9. Every
    global window must ride a bounded frame and be whitelisted with the
    boundedness argument."""
    from tools.window_scan import global_window_lines
    hits = global_window_lines(plans[name])
    if name in GLOBAL_WINDOW_OK:
        return  # audited shape (AQE may also legitimately remove it)
    assert not hits, (
        f"{name}: unpartitioned Window/WindowGroupLimit at sf0.001 — "
        f"single-task at scale. Partition it, use the two-tier "
        f"band-offset prefix sum, or whitelist with a boundedness "
        f"argument. Nodes: {hits}")


def test_global_window_whitelist_is_not_stale(plans):
    """Whitelisted queries must still exist AND still contain a global
    window — else the entry is stale and would mask a future one."""
    from tools.window_scan import global_window_lines
    assert set(GLOBAL_WINDOW_OK) <= set(BATCH_QUERIES)
    stale = [n for n in GLOBAL_WINDOW_OK
             if not global_window_lines(plans[n])]
    assert not stale, f"whitelist entries without a global window: {stale}"


def test_no_registered_query_uses_driver_collect_sink():
    """sinks.log_sink collect()s every micro-batch to the driver — it is
    the K4 DEBUG surface and must never route a registered query
    (r7 VERDICT item 7, made mechanical). Sweep the source of every
    registered query function plus its one-level package callees (the
    same closure the query-hash ledger covers) for a log_sink
    reference."""
    import inspect

    from tools.query_hashes import _callee_sources
    offenders = []
    for name, fn in registry.QUERIES.items():
        try:
            srcs = [inspect.getsource(fn)] + _callee_sources(fn)
        except (OSError, TypeError):
            continue
        if any("log_sink" in s for s in srcs):
            offenders.append(name)
    assert not offenders, (
        f"registered queries routed through the debug-only driver-"
        f"collect log_sink: {offenders}")


def test_vocab_coverage_single_corpus_scan(plans):
    """r12 VERDICT fix pin: x_vocab_coverage tokenizes the corpus ONCE —
    the (source, tok) → n aggregate is materialized (localCheckpoint)
    and all three consumers (vocab top-20, per-source totals, OOV
    anti-probe) read the materialized frame. The returned plan must
    contain NO parquet scan of documents (it happened once, eagerly,
    at build time) and exactly 3 reads of the checkpointed RDD."""
    plan = plans["x_vocab_coverage"]
    assert "documents.parquet" not in plan, plan[:800]
    assert plan.count("Scan ExistingRDD") == 3, plan[:800]
