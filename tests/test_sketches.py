"""Deterministic sketches: KMV distinct estimation and hash sampling."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_realtime_data_eng_spark.functions import sketches


def test_kmv_exact_below_k(spark):
    df = spark.range(50).select(F.col("id").alias("v"))
    row = sketches.kmv_distinct(df, "v", k=256).collect()[0]
    # fewer distinct values than k -> the sketch IS the exact count
    assert row["n_kept"] == 50 and row["distinct_est"] == 50.0


def test_kmv_estimate_accuracy(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").alias("v"))
    row = sketches.kmv_distinct(df, "v", k=256).collect()[0]
    assert row["n_kept"] == 256
    # KMV with k=256 has ~1/sqrt(k) ≈ 6% relative error; allow 3 sigma.
    assert abs(row["distinct_est"] - n) / n < 0.20


def test_kmv_ignores_duplicates_and_nulls(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (None,)], "v int")
    row = sketches.kmv_distinct(df, "v", k=16).collect()[0]
    assert row["n_kept"] == 2 and row["distinct_est"] == 2.0


def test_kmv_rejects_k_below_two(spark):
    with pytest.raises(ValueError):
        sketches.kmv_distinct(spark.range(5), "id", k=1)


def test_kmv_plan_uses_partial_topk(spark):
    """The k-smallest step must be TakeOrdered (per-partition heap), never a
    global sort — the property that keeps the sketch one narrow pass."""
    df = spark.range(1000).select(F.col("id").alias("v"))
    h = (df.select(sketches._md5_hash32("kmv", F.col("v").cast("string")).alias("h"))
           .distinct().orderBy("h").limit(256))
    plan = h._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_hash_sample_rate_and_determinism(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    s1 = {r["k"] for r in sketches.hash_sample(df, "k", 0.1).collect()}
    s2 = {r["k"] for r in sketches.hash_sample(df, "k", 0.1).collect()}
    assert s1 == s2                      # same rows every run
    assert 700 <= len(s1) <= 1300        # ~10% +- 3 sigma
    # nested property: a higher-rate sample strictly contains a lower-rate one
    s_big = {r["k"] for r in sketches.hash_sample(df, "k", 0.3).collect()}
    assert s1 <= s_big


def test_hash_sample_keeps_key_groups_together(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, payload string")
    kept = sketches.hash_sample(df, "k", 0.5).groupBy("k").count().collect()
    src = dict(df.groupBy("k").count().collect())
    for r in kept:  # every surviving key keeps ALL its rows
        assert r["count"] == src[r["k"]]


def test_hash_sample_rejects_bad_rate(spark):
    with pytest.raises(ValueError):
        sketches.hash_sample(spark.range(5), "id", 1.5)


def test_stratified_rates_per_stratum(spark):
    rows = [(i, "rare" if i % 100 == 0 else "common") for i in range(10_000)]
    df = spark.createDataFrame(rows, "k long, cls string")
    out = sketches.stratified_hash_sample(
        df, strata_col="cls", key_col="k",
        rates={"rare": 1.0, "common": 0.05})
    got = dict((r["cls"], r["count"])
               for r in out.groupBy("cls").count().collect())
    assert got["rare"] == 100            # rate 1.0 keeps everything
    assert 400 <= got.get("common", 0) <= 600   # ~5% of 9900 = 495 +- 3 sigma


def test_stratified_default_rate_zero_drops_unknown(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k int, cls string")
    out = sketches.stratified_hash_sample(df, "cls", "k", rates={"x": 1.0})
    assert [r["cls"] for r in out.collect()] == ["x"]


def test_vocab_topk_counts_and_tiebreak(spark):
    from flink_realtime_data_eng_spark.functions import text as textf
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "Apple!")],
        "doc_id long, text string")
    out = textf.vocab_topk(df, k=2).collect()
    # apple: tf=3 (case-folded) in docs {1,3}; banana: tf=2 in {1,2}
    assert [(r["tok"], r["term_freq"], r["doc_freq"]) for r in out] == [
        ("apple", 3, 2), ("banana", 2, 2)]


def test_vocab_topk_tie_broken_by_token(spark):
    from flink_realtime_data_eng_spark.functions import text as textf
    df = spark.createDataFrame([(1, "zz aa")], "doc_id long, text string")
    out = textf.vocab_topk(df, k=1).collect()
    assert [r["tok"] for r in out] == ["aa"]  # equal tf -> lexicographic


def test_exact_group_quantiles_values(spark):
    from flink_realtime_data_eng_spark.operators import stats
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 5)] + [("b", 10.0), ("b", None)],
        "g string, v double")
    got = {r["g"]: r for r in
           stats.exact_group_quantiles(df, ["g"], "v", qs=(0.5,)).collect()}
    # linear interpolation over [1,2,3,4] -> median 2.5; nulls ignored
    assert got["a"]["n"] == 4 and got["a"]["p50"] == 2.5
    assert got["b"]["n"] == 1 and got["b"]["p50"] == 10.0


def test_exact_group_quantiles_single_shuffle(spark):
    from flink_realtime_data_eng_spark.operators import stats
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    out = stats.exact_group_quantiles(df, ["g"], "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Sort" not in plan.split("Exchange")[0]


def test_exact_group_quantiles_extreme_names(spark):
    from flink_realtime_data_eng_spark.operators import stats
    df = spark.createDataFrame([("a", 1.0), ("a", 3.0)], "g string, v double")
    row = stats.exact_group_quantiles(df, ["g"], "v", qs=(0.0, 1.0)).collect()[0]
    assert row["p0"] == 1.0 and row["p100"] == 3.0
    with pytest.raises(ValueError, match="duplicate"):
        stats.exact_group_quantiles(df, ["g"], "v", qs=(0.5, 0.5))


def test_json_props_stats_typed_parse_and_nulls(spark):
    from flink_realtime_data_eng_spark.operators import stats
    df = spark.createDataFrame(
        [("click", '{"k": 5}'), ("click", '{"k": 7}'),
         ("view", '{"other": 1}'),      # field absent -> null, not counted
         ("view", "not json at all"),   # malformed -> null, not an error
         ("view", '{"k": 3}')],
        "event_type string, props string")
    got = {r["event_type"]: (r["n_present"], r["sum_v"], r["min_v"], r["max_v"])
           for r in stats.json_props_stats(df).collect()}
    assert got["click"] == (2, 12, 5, 7)
    assert got["view"] == (1, 3, 3, 3)


def test_pivot_counts_explicit_values_and_zero_fill(spark):
    from flink_realtime_data_eng_spark.operators import stats
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "g long, t string")
    got = {r["g"]: (r["a"], r["b"], r["c"]) for r in
           stats.pivot_counts(df, "g", "t", ["a", "b", "c"]).collect()}
    assert got[1] == (2, 1, 0)   # missing combination -> 0, not null
    assert got[2] == (0, 1, 0)
    # a value NOT in the explicit list is ignored (no surprise columns)
    df2 = df.union(spark.createDataFrame([(2, "zzz")], "g long, t string"))
    cols = stats.pivot_counts(df2, "g", "t", ["a", "b"]).columns
    assert cols == ["g", "a", "b"]


def test_hll_distinct_error_bound(spark):
    from flink_realtime_data_eng_spark.functions import sketches
    sf = "/root/testdata/sf0.01"
    from flink_realtime_data_eng_spark.schemas import load_table
    e = load_table(spark, sf, "events")
    got = {r["event_type"]: r["approx_distinct"] for r in
           sketches.approx_distinct_per_group(e, "event_type", "user_id")
           .collect()}
    exact = {r["event_type"]: r["n"] for r in
             e.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert abs(got[t] - n) <= max(3, 0.15 * n), (t, got[t], n)


def test_approx_quantiles_bracket_exact(spark):
    from flink_realtime_data_eng_spark.functions import sketches
    from flink_realtime_data_eng_spark.operators import stats
    from flink_realtime_data_eng_spark.schemas import load_table
    e = load_table(spark, "/root/testdata/sf0.01", "events")
    approx = {r["event_type"]: r for r in
              sketches.approx_group_quantiles(e, "event_type", "value")
              .collect()}
    exact = {r["event_type"]: r for r in
             stats.exact_group_quantiles(e, ["event_type"], "value")
             .collect()}
    for t in exact:
        # percentile_approx returns a REAL element of the group, within
        # rank error; exact interpolates — allow a small relative band
        for p in ("p25", "p50", "p90"):
            lo, hi = 0.8 * exact[t][p], 1.2 * exact[t][p] + 1e-6
            assert lo <= approx[t][p] <= hi, (t, p, approx[t][p], exact[t][p])


def test_group_sample_exact_size_and_determinism(spark):
    from flink_realtime_data_eng_spark.functions import sketches
    from flink_realtime_data_eng_spark.schemas import load_table
    d = load_table(spark, "/root/testdata/sf0.01", "documents") \
        .select("doc_id", "source")
    out = sketches.group_sample(d, "source", "doc_id", k=5)
    rows = out.collect()
    sizes = {}
    for r in rows:
        sizes[r["source"]] = sizes.get(r["source"], 0) + 1
    group_n = {r["source"]: r["n"] for r in
               d.groupBy("source").count().withColumnRenamed("count", "n")
               .collect()}
    for s, n in group_n.items():
        assert sizes.get(s, 0) == min(5, n), (s, sizes.get(s), n)
    # deterministic across invocations (hash order, not rand)
    again = {(r["source"], r["doc_id"]) for r in
             sketches.group_sample(d, "source", "doc_id", k=5).collect()}
    assert again == {(r["source"], r["doc_id"]) for r in rows}


def test_group_sample_rejects_bad_k(spark):
    import pytest as _pytest
    from flink_realtime_data_eng_spark.functions import sketches
    from flink_realtime_data_eng_spark.schemas import load_table
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    with _pytest.raises(ValueError):
        sketches.group_sample(d, "source", "doc_id", k=0)


def test_temperature_sample_rebalances_sources(spark):
    from flink_realtime_data_eng_spark.functions import packing
    from flink_realtime_data_eng_spark.schemas import load_table
    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    # tau=1 targets a uniform token mixture: dominant sources shrink,
    # sources already below uniform share keep everything
    mix = {r["source"]: r for r in packing.source_mixture(d).collect()}
    kept = packing.temperature_sample(d, tau=1.0)
    kept_n = {r["source"]: r["n"] for r in
              kept.groupBy("source").count().withColumnRenamed("count", "n")
              .collect()}
    tot_n = {r["source"]: r["n"] for r in
             d.groupBy("source").count().withColumnRenamed("count", "n")
             .collect()}
    for s, m in mix.items():
        if m["sample_weight"] >= 1.0:
            assert kept_n.get(s, 0) == tot_n[s], s  # below-share: keep all
        else:
            assert kept_n.get(s, 0) <= tot_n[s], s
    # tau=0 -> keep_prob 1 everywhere: the identity sample
    assert packing.temperature_sample(d, tau=0.0).count() == d.count()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        packing.temperature_sample(d, tau=1.5)


def test_train_val_test_split_stable_and_leak_free(spark):
    from flink_realtime_data_eng_spark.functions import sketches
    from flink_realtime_data_eng_spark.schemas import load_table
    d = load_table(spark, "/root/testdata/sf0.01", "documents") \
        .select("doc_id", "source")
    full = {r["doc_id"]: r["split"] for r in
            sketches.train_val_test_split(d, "doc_id").collect()}
    # fractions roughly 80/10/10
    from collections import Counter
    c = Counter(full.values())
    n = len(full)
    assert 0.7 * n < c["train"] < 0.9 * n
    assert c["val"] > 0 and c["test"] > 0
    # growth-stability: the split of a SUBSET equals the full corpus's
    # assignment for those rows (randomSplit cannot promise this)
    sub = {r["doc_id"]: r["split"] for r in
           sketches.train_val_test_split(
               d.filter("doc_id < 100"), "doc_id").collect()}
    assert all(full[i] == s for i, s in sub.items())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sketches.train_val_test_split(d, "doc_id", val_frac=0.6, test_frac=0.5)


def test_weighted_sample_topk_determinism_and_bias(spark):
    """A-ES: same draw every run; heavier rows overrepresented vs uniform."""
    df = spark.range(2_000).select(
        F.col("id").alias("k"),
        # ids >= 1000 carry 50x the weight of ids < 1000
        F.when(F.col("id") >= 1000, F.lit(50.0)).otherwise(F.lit(1.0))
         .alias("w"))
    s1 = [r["k"] for r in sketches.weighted_sample_topk(df, "k", "w", 200).collect()]
    s2 = [r["k"] for r in sketches.weighted_sample_topk(df, "k", "w", 200).collect()]
    assert s1 == s2 and len(s1) == 200 and len(set(s1)) == 200
    heavy = sum(1 for k in s1 if k >= 1000)
    assert heavy > 150  # 50x weight must dominate the draw


def test_weighted_sample_topk_no_global_sort(spark):
    """orderBy().limit(k) must execute as TakeOrdered, not a full sort."""
    df = spark.range(1_000).select(F.col("id").alias("k"),
                                   F.lit(1.0).alias("w"))
    out = sketches.weighted_sample_topk(df, "k", "w", 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_topk_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        sketches.weighted_sample_topk(spark.range(5).select(
            F.col("id").alias("k"), F.lit(1.0).alias("w")), "k", "w", 0)


# -- Bloom runtime filter ---------------------------------------------------

def test_bloom_bitmap_shape_and_bits(spark):
    df = spark.range(20).select(F.col("id").alias("k"))
    row = sketches.bloom_bitmap(df, "k", num_bits=1024, num_hashes=3) \
                  .collect()[0]
    bm = row["bitmap"]
    assert len(bm) == 1024
    n_set = sum(bm)
    # 20 keys x 3 hashes: some collisions allowed, but within bounds
    assert 3 <= n_set <= 60


def test_bloom_prefilter_never_drops_members(spark):
    build = spark.range(0, 50).select(F.col("id").alias("k"))
    probe = spark.range(0, 500).select(F.col("id").alias("k"))
    bm = sketches.bloom_bitmap(build, "k", num_bits=4096, num_hashes=4)
    kept = {r["k"] for r in
            sketches.bloom_prefilter(probe, "k", bm, num_bits=4096,
                                     num_hashes=4).collect()}
    assert set(range(50)) <= kept  # zero false negatives, ever


def test_bloom_semi_join_matches_exact_semi_join(spark):
    fact = spark.range(0, 300).select((F.col("id") % 40).alias("fk"),
                                      F.col("id").alias("v"))
    dim = spark.range(0, 10).select((F.col("id") * 3).alias("dk"))
    got = sorted(r["v"] for r in
                 sketches.bloom_semi_join(fact, dim, "fk", "dk",
                                          num_bits=1024).collect())
    want = sorted(r["v"] for r in
                  fact.join(dim, fact["fk"] == dim["dk"], "left_semi")
                      .collect())
    assert got == want


def test_bloom_rejects_non_power_of_two(spark):
    with pytest.raises(ValueError):
        sketches.bloom_bitmap(spark.range(5), "id", num_bits=1000)


# -- Count-min sketch -------------------------------------------------------

def test_cms_sketch_is_bounded_by_depth_x_width(spark):
    df = spark.range(5000).select((F.col("id") % 700).alias("v"))
    sk = sketches.cms_sketch(df, "v", depth=4, width=64)
    assert sk.count() <= 4 * 64
    # total mass per seed equals the input row count
    per_seed = {r["seed"]: r["s"] for r in
                sk.groupBy("seed").agg(F.sum("cnt").alias("s")).collect()}
    assert all(v == 5000 for v in per_seed.values())


def test_cms_estimate_never_underestimates(spark):
    df = spark.range(3000).select((F.col("id") % 97).alias("v"))
    sk = sketches.cms_sketch(df, "v", depth=4, width=32)  # heavy collisions
    items = df.distinct()
    est = {r["v"]: r["cms_est"] for r in
           sketches.cms_estimate(items, "v", sk, depth=4, width=32).collect()}
    exact = {r["v"]: r["n"] for r in
             df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(est[v] >= exact[v] for v in exact)


def test_cms_estimate_absent_item_can_be_zero(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    sk = sketches.cms_sketch(df, "v", depth=4, width=4096)
    ghost = spark.createDataFrame([(999999,)], "v bigint")
    est = sketches.cms_estimate(ghost, "v", sk, depth=4, width=4096) \
                  .collect()[0]["cms_est"]
    assert est == 0  # wide sketch, tiny build: no collisions


# -- Exact heavy hitters via partition-local candidates ---------------------

def test_heavy_hitters_matches_exact_groupby(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5 + [("d",)] * 1,
        "tok string")
    got = {(r["tok"], r["n"]) for r in
           sketches.heavy_hitters(df, "tok", threshold=30).collect()}
    assert got == {("a", 50), ("b", 30)}


def test_heavy_hitters_invariant_to_partitioning(spark):
    df = spark.createDataFrame([(f"t{i % 7}",) for i in range(700)],
                               "tok string")
    a = {(r["tok"], r["n"]) for r in
         sketches.heavy_hitters(df.repartition(2), "tok", 100).collect()}
    b = {(r["tok"], r["n"]) for r in
         sketches.heavy_hitters(df.repartition(17), "tok", 100).collect()}
    assert a == b and len(a) == 7


def test_heavy_hitters_rejects_bad_threshold(spark):
    with pytest.raises(ValueError):
        sketches.heavy_hitters(spark.createDataFrame([("x",)], "tok string"),
                               "tok", 0)


def test_cms_inner_product_never_underestimates(spark):
    from flink_realtime_data_eng_spark.functions.sketches import (
        cms_inner_product, cms_sketch)
    a = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i % 5,) for i in range(60)], "k long")
    # exact inner product of key frequencies
    fa, fb = {}, {}
    for i in range(100):
        fa[i % 7] = fa.get(i % 7, 0) + 1
    for i in range(60):
        fb[i % 5] = fb.get(i % 5, 0) + 1
    exact = sum(fa[k] * fb.get(k, 0) for k in fa)
    # wide sketch: no collisions -> estimate is exact
    est = cms_inner_product(cms_sketch(a, "k", depth=4, width=256),
                            cms_sketch(b, "k", depth=4, width=256)
                            ).collect()[0]["cms_est"]
    assert est == exact
    # narrow sketch: collisions only ADD
    est_narrow = cms_inner_product(cms_sketch(a, "k", depth=2, width=2),
                                   cms_sketch(b, "k", depth=2, width=2)
                                   ).collect()[0]["cms_est"]
    assert est_narrow >= exact


def test_hll_portable_small_range_is_near_exact(spark):
    """Tiny cardinalities take the linear-counting branch and land within
    a fraction of a count of exact."""
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)], "g string, v int")
    row = sketches.hll_portable(df, "g", "v", p=10).collect()[0]
    assert row["v_nonzero"] == 7
    assert abs(row["hll_est"] - 7) < 0.5


def test_hll_portable_estimate_accuracy(spark):
    """p=10 (m=1024) HLL has ~1.04/sqrt(m) ≈ 3.3% relative error;
    allow 4 sigma on a 20k-distinct input."""
    n = 20_000
    df = spark.range(n).select(F.lit("g").alias("g"),
                               F.col("id").alias("v"))
    row = sketches.hll_portable(df, "g", "v", p=10).collect()[0]
    assert abs(row["hll_est"] - n) / n < 0.14


def test_hll_portable_duplicates_dont_move_the_sketch(spark):
    """The sketch is a pure function of the distinct value set."""
    base = [("g", i) for i in range(500)]
    one = spark.createDataFrame(base, "g string, v int")
    dup = spark.createDataFrame(base * 3, "g string, v int")
    assert (sketches.hll_portable(one, "g", "v").collect()
            == sketches.hll_portable(dup, "g", "v").collect())


def test_hll_portable_register_table_is_bounded(spark):
    """At most m register rows per group reach the final fold regardless
    of input rows — the property that makes the sketch 100 TB-safe."""
    df = spark.range(50_000).select(F.lit("g").alias("g"),
                                    F.col("id").alias("v"))
    h = sketches._md5_hash32("hll", F.col("v").cast("string"))
    regs = (df.select((h / F.lit(1 << 22)).cast("bigint").alias("b"))
              .distinct())
    assert regs.count() <= 1024


def test_hist_quantiles_within_one_bin_of_exact(spark):
    """The sketch's contract: each reported quantile is the lower edge of
    the qualifying bin — within one bin width below the exact answer."""
    n = 10_000
    df = spark.range(n).selectExpr("'g' AS g",
                                   "CAST(id AS DOUBLE) AS v")
    row = sketches.hist_quantiles(df, "g", "v", bins=256).collect()[0]
    width = (n - 1) / 256.0
    for bp, p in [(2500, 0.25), (5000, 0.5), (9000, 0.9), (9900, 0.99)]:
        exact = p * (n - 1)
        got = row[f"p{bp}"]
        # 1e-4 absorbs the 6-dp rounding of the reported bin edge
        assert exact - width - 1e-4 <= got <= exact + width + 1e-4


def test_hist_quantiles_constant_column(spark):
    """All-equal values: width guard (no divide-by-zero), every quantile
    IS the value."""
    df = spark.createDataFrame([("g", 42.0)] * 50, "g string, v double")
    row = sketches.hist_quantiles(df, "g", "v").collect()[0]
    assert row["n"] == 50
    assert all(row[c] == 42.0 for c in ["p2500", "p5000", "p9000", "p9900"])


def test_hist_quantiles_rejects_unrepresentable_probability(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        sketches.hist_quantiles(df, "g", "v", probabilities=(1 / 3,))


def test_hll_sliding_merge_tracks_exact_distinct(spark):
    """Merged per-bucket registers must estimate each sliding window's
    exact distinct count within the HLL error envelope — merging buckets
    must not degrade the sketch (registers are max-folds, so a window's
    merged registers EQUAL the registers of its union)."""
    from flink_realtime_data_eng_spark import registry
    from pyspark.sql import functions as F
    sf = "/root/testdata/sf0.01"
    est = {r.w_start: r.hll_est for r in
           registry.QUERIES["x_hll_sliding"](spark, sf).collect()}
    e = registry._events(spark, sf).select("user_id", "ts_ms")
    win = (e.withColumn("bucket_ms",
                        F.expr("ts_ms div 600000") * F.lit(600000))
            .select(F.explode(F.expr("sequence(0, 5)")).alias("k"),
                    "bucket_ms", "user_id")
            .withColumn("w_start",
                        F.col("bucket_ms") - F.col("k") * 600000))
    exact = {r.w_start: r.n for r in
             win.groupBy("w_start")
                .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for w, n in exact.items():
        assert abs(est[w] - n) <= max(5, 0.15 * n), (w, est[w], n)
