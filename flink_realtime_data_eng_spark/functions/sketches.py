"""Deterministic sketch & sampling operators for 100 TB pipelines.

At training-data scale, exact global statistics (COUNT DISTINCT over
billions of keys) and uniform row sampling are themselves expensive
distributed jobs. These operators replace them with single-pass,
hash-deterministic equivalents:

- :func:`kmv_distinct` — KMV (k-minimum-values) distinct-count sketch
  (Bar-Yossef et al., "Counting distinct elements in a data stream",
  RANDOM 2002): hash every value to (0,1], keep the k smallest hashes;
  the k-th smallest h_k estimates distinct ≈ (k-1)/h_k. One narrow
  hash projection + a partial top-k (TakeOrdered — map-side k values
  per partition, never a global sort), so the driver receives k longs
  regardless of input size.
- :func:`hash_sample` — consistent (deterministic) sampling: keep a row
  iff md5(key) maps below ``rate``. Unlike ``df.sample()`` the decision
  is a pure function of the key — re-runs, retries, and other engines
  (the DuckDB oracle) pick the SAME rows, and sampling two tables by
  the same key keeps them join-consistent.
- :func:`stratified_hash_sample` — per-stratum rates (e.g. keep 100% of
  rare 'purchase' events, 1% of 'view'), same hash determinism.

All hashing is md5-derived (same construction as
``functions.dedup._md5_hash32``) so every operator is reproducible as
ANSI SQL, which is what makes these oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .dedup import _md5_hash32

_HASH_SPACE = float(2**32)  # _md5_hash32 values are uniform on [0, 2^32)


def _unit_hash(prefix: str, col: Column) -> Column:
    """Deterministic uniform draw in [0,1) from a column value."""
    return _md5_hash32(prefix, col.cast("string")) / F.lit(_HASH_SPACE)


def kmv_distinct(df: DataFrame, col: str, k: int = 256,
                 prefix: str = "kmv") -> DataFrame:
    """KMV distinct-count estimate for ``col``: one row
    ``(n_kept, kth_hash, distinct_est)``.

    distinct_est = (k-1) / h_k with h_k the k-th smallest unit hash; when
    fewer than k distinct hashes exist the count is exact (n_kept).
    Plan shape: project-to-hash → hash-distinct (map-side partial) →
    ``orderBy().limit(k)`` which Spark executes as TakeOrderedAndProject
    (per-partition heap of k, k-way merge on the driver) — no global sort,
    driver traffic is k longs. Estimate rounded to 6 dp for cross-engine
    hash-matching.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 for the (k-1)/h_k estimator, got {k}")
    h = (df.select(_md5_hash32(prefix, F.col(col).cast("string")).alias("h"))
           .where(F.col("h").isNotNull())
           .distinct()
           .orderBy("h")
           .limit(k))
    return h.agg(
        F.count("h").alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.round(
            F.when(F.count("h") < k, F.count("h").cast("double"))
             .otherwise((F.lit(float(k - 1)))
                        / (F.max("h") / F.lit(_HASH_SPACE))),
            6).alias("distinct_est"))


def hash_sample(df: DataFrame, key_col: str, rate: float,
                prefix: str = "sample") -> DataFrame:
    """Deterministic ``rate``-fraction sample: keeps a row iff the unit
    hash of ``key_col`` is below ``rate``. Pure map-side filter — no
    shuffle, pushdown-friendly, and stable across runs/engines. Sampling
    is per KEY: all rows sharing a key are kept or dropped together
    (the right semantics for sampling documents/users consistently).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_unit_hash(prefix, F.col(key_col)) < rate)


def weighted_sample_topk(df: DataFrame, key_col: str, weight_col: str,
                         k: int, prefix: str = "wsample") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006): each row draws
    ``score = u^(1/w)`` with ``u`` a uniform draw and ``w`` its weight; the
    k largest scores are a weighted sample without replacement — the
    standard way to pick training documents proportional to a quality or
    length weight. ``u`` is the deterministic md5 unit draw, so the chosen
    set is identical across runs, retries, and engines.

    Plan shape: the score is one map-side expression; ``orderBy().limit(k)``
    executes as TakeOrderedAndProject (per-partition top-k heap, k-way
    driver merge) — no global sort at any scale. Ties broken by key for
    determinism. Score column rounded to 6 dp after selection (the oracle
    contract; selection itself uses the exact value).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-9))
    score = F.pow(_unit_hash(prefix, F.col(key_col)), F.lit(1.0) / w)
    return (df.withColumn("score", score)
              .orderBy(F.desc("score"), F.col(key_col))
              .limit(k)
              .withColumn("score", F.round("score", 6)))


def stratified_hash_sample(df: DataFrame, strata_col: str, key_col: str,
                           rates: dict[str, float], default_rate: float = 0.0,
                           prefix: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling: stratum ``s`` keeps rows at
    ``rates.get(s, default_rate)``. One map-side filter; the CASE over
    strata stays in whole-stage codegen. Typical use: keep all rare
    positives, downsample the dominant class.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    rate_expr: Column = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate_expr = F.when(F.col(strata_col) == s, F.lit(float(r))) \
                     .otherwise(rate_expr)
    return df.where(_unit_hash(prefix, F.col(key_col)) < rate_expr)


def group_sample(df: DataFrame, strata_col: str, key_col: str, k: int = 10,
                 prefix: str = "gsample") -> DataFrame:
    """Deterministic fixed-size sample per group: the ``k`` rows of each
    stratum whose key hashes smallest — a reservoir-sample analog that is
    reproducible across runs AND engines (md5 order, key as tiebreak).

    Plan shape: one hash projection + one shuffle on ``strata_col`` +
    partition-local row_number — the same cost as any per-group top-k.
    Unlike rate-based :func:`hash_sample`, the output size per group is
    exactly ``min(k, group_size)`` — the right contract when downstream
    wants a bounded eval/debug set per source. Skewed strata stay safe at
    scale: rank runs partition-local after the hash shuffle, and a
    hot stratum can be pre-limited per map partition (cap candidates at k
    per partition) before the shuffle if one group dominates.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window as W
    h = df.withColumn("_h", _md5_hash32(prefix, F.col(key_col).cast("string")))
    w = W.partitionBy(strata_col).orderBy(F.col("_h"), F.col(key_col))
    return (h.withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") <= k)
             .drop("_h"))


def train_val_test_split(df: DataFrame, key_col: str,
                         val_frac: float = 0.1, test_frac: float = 0.1,
                         prefix: str = "split") -> DataFrame:
    """Deterministic dataset split: each row's unit hash of ``key_col``
    lands it in train / val / test by fixed thresholds — reproducible
    across runs, engines, and re-shards (a row's split NEVER changes when
    the corpus grows, unlike randomSplit), and keyed splitting keeps all
    rows of one key together (no leakage between splits).

    Pure map-side filter column; thresholds at [1-v-t, 1-t) so train is
    the contiguous low range. Output: input columns + ``split``.
    """
    if not (0 <= val_frac and 0 <= test_frac and val_frac + test_frac < 1):
        raise ValueError(f"invalid fractions {val_frac}/{test_frac}")
    h = _unit_hash(prefix, F.col(key_col))
    lo_val = 1.0 - val_frac - test_frac
    lo_test = 1.0 - test_frac
    split = (F.when(h < F.lit(lo_val), "train")
              .when(h < F.lit(lo_test), "val")
              .otherwise("test"))
    return df.withColumn("split", split)


def bloom_bitmap(df: DataFrame, key_col: str, num_bits: int = 1 << 16,
                 num_hashes: int = 4, prefix: str = "bloom") -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a ONE-ROW DataFrame holding
    an ``array<boolean>`` bitmap — the broadcastable runtime-filter shape.

    Spark's own AQE runtime filter (InjectRuntimeFilter) builds exactly
    this structure JVM-side when its thresholds hit; this operator makes
    the pattern explicit and tunable for plans the injector misses (the
    builtin ``bloom_filter_agg`` expression is not SQL-registered in this
    build). Hashes are the md5 family, so the filter is deterministic
    across runs and engines. Build cost: one explode of ``num_hashes``
    positions per build row + a ``num_bits``-row dense join — all bounded
    by the (small) build side, never the probe side. A production variant
    would pack 64 bits/word; booleans keep the probe expression in the
    pure Column API (element_at only, no per-row variable shifts).
    """
    if num_bits < 64 or num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two >= 64, got {num_bits}")
    spark = df.sparkSession
    key = F.col(key_col).cast("string")
    positions = F.array(*[
        (_md5_hash32(f"{prefix}{i}", key) % num_bits).cast("int")
        for i in range(num_hashes)])
    marks = df.select(F.explode(positions).alias("pos")).distinct()
    dense = (spark.range(num_bits)
             .select(F.col("id").cast("int").alias("pos"))
             .join(marks.withColumn("hit", F.lit(True)), "pos", "left")
             .select("pos", F.coalesce("hit", F.lit(False)).alias("bit")))
    return dense.agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "bit"))),
                    lambda x: x["bit"]).alias("bitmap"))


def bloom_prefilter(df: DataFrame, key_col: str, bitmap_df: DataFrame,
                    num_bits: int = 1 << 16, num_hashes: int = 4,
                    prefix: str = "bloom") -> DataFrame:
    """Probe side of the Bloom runtime filter: broadcast the 1-row bitmap
    and drop every row whose key cannot be in the build set — a pure
    map-side filter (``num_hashes`` element_at lookups per row) that cuts
    shuffle/scan volume BEFORE the real join. May pass false positives
    (rate ≈ (set_bits/num_bits)^num_hashes); never drops a true match, so
    an exact join downstream yields exact results.
    """
    probe = df.crossJoin(F.broadcast(bitmap_df))
    key = F.col(key_col).cast("string")
    cond = F.lit(True)
    for i in range(num_hashes):
        pos = (_md5_hash32(f"{prefix}{i}", key) % num_bits).cast("int")
        cond = cond & F.element_at(F.col("bitmap"), pos + F.lit(1))
    return probe.where(cond).drop("bitmap")


def bloom_semi_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                    dim_key: str, num_bits: int = 1 << 16,
                    num_hashes: int = 4,
                    prefix: str = "bloom") -> DataFrame:
    """Exact semi-join accelerated by a Bloom pre-filter: build the bitmap
    on the (small) ``dim`` key set, map-side prune ``fact``, then a real
    ``left_semi`` join clears the Bloom's false positives — the composed
    result is byte-identical to ``fact SEMI JOIN dim`` while the join
    input is already pruned at the scan side. At 100 TB this is the
    difference between shuffling every fact row and shuffling only the
    ~selectivity fraction that can possibly match.
    """
    keys = dim.select(F.col(dim_key)).distinct()
    bm = bloom_bitmap(keys, dim_key, num_bits, num_hashes, prefix)
    pre = bloom_prefilter(fact, fact_key, bm, num_bits, num_hashes, prefix)
    return pre.join(keys.withColumnRenamed(dim_key, "__dk"),
                    pre[fact_key] == F.col("__dk"), "left_semi")


def cms_sketch(df: DataFrame, col: str, depth: int = 4, width: int = 256,
               prefix: str = "cms") -> DataFrame:
    """Count-min sketch [Cormode & Muthukrishnan, J.Algorithms 2005] of
    ``col`` as a ``(seed, bucket, cnt)`` table of at most depth×width rows.

    The map-side explode writes ``depth`` (seed, bucket) rows per input
    row, but hash-aggregate partial combine collapses each partition to at
    most depth×width rows before the exchange — the shuffle is bounded by
    the SKETCH size, not the data, which is the whole point at 100 TB
    (an exact groupBy shuffles every distinct value). md5 bucket hashes
    keep the sketch bit-identical across engines.
    """
    v = F.col(col).cast("string")
    rows = df.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("seed"),
                 (_md5_hash32(f"{prefix}{i}", v) % width).cast("int")
                 .alias("bucket"))
        for i in range(depth)])).alias("sb"))
    return (rows.groupBy(F.col("sb.seed").alias("seed"),
                         F.col("sb.bucket").alias("bucket"))
                .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(items: DataFrame, col: str, sketch: DataFrame,
                 depth: int = 4, width: int = 256,
                 prefix: str = "cms") -> DataFrame:
    """Point-query the sketch for each row of ``items``: estimate = min
    over the ``depth`` bucket counters. Never underestimates; collisions
    only inflate. ``items`` is the small watchlist side — its explode and
    join against the ≤depth×width sketch broadcast trivially.
    """
    v = F.col(col).cast("string")
    probes = items.select(
        F.col(col),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("seed"),
                     (_md5_hash32(f"{prefix}{i}", v) % width).cast("int")
                     .alias("bucket"))
            for i in range(depth)])).alias("sb"))
    return (probes.select(col, F.col("sb.seed").alias("seed"),
                          F.col("sb.bucket").alias("bucket"))
            .join(sketch, ["seed", "bucket"], "left")
            .groupBy(col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                  .cast("bigint").alias("cms_est")))


def heavy_hitters(df: DataFrame, col: str, threshold: int,
                  num_partitions: int | None = None) -> DataFrame:
    """Exact heavy hitters (global count >= ``threshold``) WITHOUT a full
    groupBy over the vocabulary: per-partition candidate generation + an
    exact count restricted to candidates.

    Soundness is pigeonhole, not probabilistic: if a value's global count
    is >= T, then in at least one of the P partitions its local count is
    >= ceil(T/P) — so the union of per-partition candidates is a strict
    superset of the true heavy hitters, for ANY partitioning. The final
    exact count + filter makes the output invariant to P. Candidate
    generation is partition-local state (a counter), genuinely outside
    DataFrame expressibility, so it runs as Arrow-batched mapInPandas —
    the shuffle that remains carries only candidate values (<= P x
    |candidates| partial rows) instead of the whole vocabulary.

    ``num_partitions``: an UPPER bound on the input's partition count.
    Callers who know their layout should pass it (shuffle-partition conf,
    file count): the introspective default (``df.rdd.getNumPartitions()``)
    is always sound but under AQE materializes the upstream query stages,
    executing any shuffle in the lineage a second time. Overestimating
    only admits extra candidates (the exact verify absorbs them);
    UNDERestimating breaks the pigeonhole guarantee — never pass a value
    that the actual partition count could exceed.
    """
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    import pandas as pd
    num_parts = (num_partitions if num_partitions is not None
                 else df.rdd.getNumPartitions())
    local_t = max(1, -(-threshold // max(1, num_parts)))

    def local_candidates(batches):
        # value_counts accumulation stays vectorized (C-level hash table)
        # instead of round-tripping every token through a Python Counter —
        # ~4x faster on a cold interpreter, identical result.
        acc = None
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
        vals = [] if acc is None else acc[acc >= local_t].index.tolist()
        yield pd.DataFrame({col: vals})

    cands = df.mapInPandas(local_candidates, schema=f"{col} string").distinct()
    return (df.join(F.broadcast(cands), col, "left_semi")
              .groupBy(col)
              .agg(F.count(F.lit(1)).alias("n"))
              .where(F.col("n") >= threshold))


def approx_distinct_per_group(df: DataFrame, group: str, col: str,
                              rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct count per group (``approx_count_distinct``):
    the mergeable-sketch path for COUNT DISTINCT at 100 TB — fixed-size
    state per group, partial sketches merge map-side, no shuffle of raw
    values (the exact form shuffles every distinct value once).

    Not oracle-hashable (engine-specific sketch), so registered rows-only;
    the pytest contract asserts the relative error stays within ~3×rsd of
    the exact answer on the fixture.
    """
    return (df.groupBy(group)
              .agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"),
                   F.count(F.lit(1)).alias("n_rows"))
              .orderBy(group))


def hll_portable(df: DataFrame, group: str, col: str, p: int = 10,
                 prefix: str = "hll") -> DataFrame:
    """Engine-portable HyperLogLog per group — same register/estimator
    math as Flajolet et al. (AofA 2007), but built from the repo's
    md5-derived 32-bit hash so the SKETCH ITSELF (not just the estimate)
    is a pure function of the data, reproducible bit-for-bit in any
    engine with md5 — unlike :func:`approx_distinct_per_group`, whose
    HLL++ registers are Spark-private and therefore rows-only in the
    correctness gate. A persisted sketch built here can be merged or
    re-estimated by DuckDB/Trino/anything, which is what you want for a
    100 TB pipeline that stores per-partition sketches and folds them
    later.

    Register construction on a 32-bit hash h with 2**p buckets:
    bucket = h >> (32-p); w = h mod 2**(32-p);
    rho(w) = leading-zeros(w)+1 = (32-p) - length(bin(w)) + 1 for w>0
    (``bin``/``length`` exist in both Spark and DuckDB and are exact —
    no float log2 at the register level), else (32-p)+1.
    Estimator: alpha_m * m^2 / Z with Z = sum(2^-reg) + (m - V) over the
    V non-empty registers; small-range (linear counting) correction
    m*ln(m/zeros) when raw <= 2.5m and zeros exist. Z is computed SCALED
    BY 2^(33-p) so every term 2^(33-p-reg) is a plain BIGINT — the whole
    denominator is exact integer arithmetic folded by shiftleft/sum, and
    the estimate is one correctly-rounded IEEE division. The only libm
    call is the linear-counting ln, shared behavior the logprob/entropy
    oracles already rely on; the output rounds to 6 dp.

    Plan shape: narrow hash projection → groupBy(group, bucket) max
    (partial map-side; at most m registers per group survive to the
    shuffle regardless of input rows) → per-group fold of ≤ m rows.
    """
    regs = (hll_rho(df, group, col, p=p, prefix=prefix)
            .groupBy(group, "bucket")
            .agg(F.max("rho").alias("reg")))
    return hll_estimate(regs, group, p=p)


def hll_rho(df: DataFrame, group: str, col: str, p: int = 10,
            prefix: str = "hll") -> DataFrame:
    """Map-side stage of :func:`hll_portable`: one (group, bucket, rho)
    row per input row. ``groupBy(group, bucket).max(rho)`` over this —
    batch or STREAMING aggregation alike — is the register table; the
    max-fold is what makes the sketch mergeable (registers only grow), so
    streaming maintenance is a plain update-mode agg with state bounded
    by m × groups and NO watermark requirement."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    wbits = 32 - p
    wspace = 1 << wbits
    h = _md5_hash32(prefix, F.col(col).cast("string"))
    return (df.where(F.col(col).isNotNull())
              .select(F.col(group),
                      (h / F.lit(wspace)).cast("bigint").alias("bucket"),
                      (h % F.lit(wspace)).alias("w"))
              .withColumn("rho",
                          F.when(F.col("w") == 0, F.lit(wbits + 1))
                           .otherwise(F.lit(wbits + 1)
                                      - F.length(F.bin(F.col("w")))))
              .drop("w"))


def hll_estimate(regs: DataFrame, group: str, p: int = 10) -> DataFrame:
    """Estimator stage of :func:`hll_portable` over a register table
    (group, bucket, reg) — ≤ m rows per group however it was maintained
    (one batch pass, a streaming agg, or a merge of persisted sketches)."""
    m = 1 << p
    wbits = 32 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    shift = wbits + 1  # scale: 2^-reg * 2^shift = 2^(shift-reg) >= 1, integer
    per_group = (regs.groupBy(group)
                 .agg(F.count(F.lit(1)).alias("v_nonzero"),
                      F.sum(F.expr(f"CAST(shiftleft(1, {shift} - reg) "
                                   "AS BIGINT)")).alias("z_scaled")))
    zeros = F.lit(m) - F.col("v_nonzero")
    denom = F.col("z_scaled") + zeros * F.lit(1 << shift)  # exact BIGINT
    raw = F.lit(float(alpha * m * m * (1 << shift))) / denom
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m))
                                         / zeros.cast("double"))) \
           .otherwise(raw)
    return (per_group.select(group, "v_nonzero",
                             F.round(est, 6).alias("hll_est"))
                     .orderBy(group))


def approx_group_quantiles(df: DataFrame, group: str, col: str,
                           probabilities: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
                           accuracy: int = 10_000) -> DataFrame:
    """Mergeable approximate quantiles per group (``percentile_approx``,
    Greenwald-Khanna style sketch): bounded memory per group vs the exact
    per-group sort — the swap-in when one group holds billions of rows
    (operators/stats.exact_group_quantiles is the oracle-checkable twin).
    """
    qs = F.percentile_approx(F.col(col), list(probabilities), accuracy)
    out = (df.groupBy(group)
             .agg(F.count(col).alias("n"), qs.alias("_qs")))
    return out.select(
        group, "n",
        *[F.round(F.col("_qs")[i], 6).alias(f"p{int(p * 100)}")
          for i, p in enumerate(probabilities)]).orderBy(group)


def approx_distinct_check(df: DataFrame, group: str, col: str,
                          rsd: float = 0.05, margin: float = 3.0) -> DataFrame:
    """Certification form of :func:`approx_distinct_per_group`: run the
    HLL++ sketch AND the exact COUNT DISTINCT in one pass, emit the exact
    answer plus a boolean attesting the sketch landed within ``margin``
    standard-deviations (``margin * rsd``, floored at ±3 absolute for tiny
    groups). The sketch estimate itself is engine-private, but the
    invariant IS cross-engine checkable — the oracle replays the exact
    count and expects ``within_bound`` true, so the row hash-matches.
    This is the audit query a pipeline runs once per source before
    trusting the sketch alone at 100 TB; production uses the sketch-only
    twin (no raw-value shuffle).
    """
    approx = F.approx_count_distinct(col, rsd)
    exact = F.count_distinct(F.col(col))
    bound = F.greatest(F.lit(3.0),
                       F.lit(margin * rsd) * exact.cast("double"))
    return (df.groupBy(group)
              .agg(exact.alias("n_exact"),
                   (F.abs(approx.cast("double") - exact.cast("double"))
                    <= bound).alias("within_bound"))
              .orderBy(group))


def approx_quantile_rank_check(df: DataFrame, group: str, col: str,
                               probabilities: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
                               accuracy: int = 10_000,
                               tol: float = 0.005) -> DataFrame:
    """Certification form of :func:`approx_group_quantiles`: verify the
    Greenwald-Khanna guarantee itself. ``percentile_approx(col, p,
    accuracy)`` must return a real element whose rank fraction sits within
    ``1/accuracy`` of p; we re-rank each returned value against its group
    (count(<= v)/n must reach p - tol, count(< v)/n must not exceed
    p + tol) and emit one boolean per probability. The floats never leave
    the plan, so the output is hash-stable cross-engine: the oracle
    replays group sizes and expects every flag true.

    Scale shape: sketch pass + one broadcast of the tiny per-group
    quantile table back onto the fact for the re-rank — two scans, no
    raw-value shuffle beyond the keyed aggregations.
    """
    qs = F.percentile_approx(F.col(col), list(probabilities), accuracy)
    agg = df.groupBy(group).agg(qs.alias("_qs"))
    j = df.select(group, col).join(F.broadcast(agg), group)
    n = F.count(F.col(col))  # non-null, matching the sketch's population
    checks = []
    for i, p in enumerate(probabilities):
        le = F.sum(F.when(F.col(col) <= F.col("_qs")[i], 1).otherwise(0))
        lt = F.sum(F.when(F.col(col) < F.col("_qs")[i], 1).otherwise(0))
        ok = ((le.cast("double") / n.cast("double") >= F.lit(p - tol))
              & (lt.cast("double") / n.cast("double") <= F.lit(p + tol)))
        # n = 0 (all-NULL group) makes both ratios NULL; the rank bound is
        # vacuously true for an empty population, matching the oracle's
        # unconditional TRUE — don't let the NULL leak into the hash.
        checks.append(F.when(n > 0, ok).otherwise(F.lit(True))
                       .alias(f"p{int(p * 100)}_ok"))
    return (j.groupBy(group)
             .agg(n.alias("n"), *checks)
             .orderBy(group))


def cms_inner_product(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Join-size estimation from two count-min sketches (the AMS-style
    inner product, Cormode & Muthukrishnan §4.3): |A ⋈ B| on the sketched
    key equals Σ_k fA(k)·fB(k), and Σ_bucket cmsA·cmsB over one seed row
    upper-bounds it (collisions only add) — so ``min`` over seeds is the
    estimator, never an underestimate. This is the sketch a cost-based
    optimizer consults to size a join WITHOUT touching either table:
    the inputs here are ≤ depth×width rows each, so the whole estimate
    is a toy-sized join regardless of data scale.

    Returns one row: (cms_est).
    """
    a = sketch_a.select("seed", "bucket", F.col("cnt").alias("cnt_a"))
    b = sketch_b.select("seed", "bucket", F.col("cnt").alias("cnt_b"))
    per_seed = (a.join(b, ["seed", "bucket"])
                .groupBy("seed")
                .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip")))
    return per_seed.agg(F.min("ip").cast("bigint").alias("cms_est"))


def hist_quantiles(df: DataFrame, group: str, col: str,
                   probabilities: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
                   bins: int = 256) -> DataFrame:
    """Engine-portable quantile sketch: a fixed-``bins`` equi-width
    histogram per group, quantiles read off the cumulative counts. The
    hash-checkable member of the quantile family — percentile_approx
    (:func:`approx_group_quantiles`) is Spark-private and rows-only;
    the exact per-group sort doesn't bound memory. Histogram counts ADD,
    so the sketch merges across partitions/engines/days like the
    portable HLL, with error bounded by one bin width.

    Two passes, both bounded: (1) per-group min/max (one aggregate,
    group-cardinality rows broadcast back), (2) per-(group, bin) counts —
    at most ``bins`` rows per group reach the shuffle. Quantile selection
    is exact integer arithmetic (cross-multiplied cumulative-count
    threshold, no float comparison): the reported value is the LOWER EDGE
    of the first bin whose cumulative count reaches ceil(p*n) — i.e.
    within one bin width below the exact percentile_disc answer.

    Probabilities must be exactly representable as n/10000 (they are
    embedded as integer basis points both engines).
    """
    bps = []
    for p in probabilities:
        bp = round(p * 10_000)
        if abs(bp - p * 10_000) > 1e-9 or not 0 < bp <= 10_000:
            raise ValueError(f"probability {p} not an exact basis-point")
        bps.append(bp)
    stats = (df.groupBy(group)
             .agg(F.min(col).alias("_lo"), F.max(col).alias("_hi"),
                  F.count(col).alias("_n")))
    width = F.when(F.col("_hi") > F.col("_lo"),
                   (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))) \
             .otherwise(F.lit(1.0))
    binned = (df.where(F.col(col).isNotNull())
              .join(F.broadcast(stats), group)
              .withColumn("_w", width)
              .withColumn("bin",
                          F.least(F.floor((F.col(col) - F.col("_lo"))
                                          / F.col("_w")).cast("bigint"),
                                  F.lit(bins - 1)))
              .groupBy(group, "bin")
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.first("_lo").alias("_lo"), F.first("_w").alias("_w"),
                   F.first("_n").alias("_n")))
    wcum = W.partitionBy(group).orderBy("bin") \
            .rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = binned.withColumn("cum", F.sum("cnt").over(wcum))
    # ALL quantiles in one conditional-min aggregate over the (group, bin)
    # cumulative table: first bin with 10000*cum >= bp*n, exact integers —
    # one shuffle however many probabilities are asked for.
    qbins = [F.min(F.when(F.lit(10_000) * F.col("cum")
                          >= F.lit(bp) * F.col("_n"), F.col("bin")))
              .alias(f"_qbin{bp}") for bp in bps]
    sel = (cum.groupBy(group)
           .agg(F.first("_lo").alias("_lo"), F.first("_w").alias("_w"),
                F.first("_n").alias("n"), *qbins))
    return (sel.select(
                group, "n",
                *[F.round(F.col("_lo") + F.col(f"_qbin{bp}") * F.col("_w"),
                          6).alias(f"p{bp}") for bp in bps])
            .orderBy(group))


def hist_bins_fixed(df: DataFrame, group: str, col: str,
                    lo: float = 0.0, width: float = 2.0,
                    bins: int = 256) -> DataFrame:
    """One-pass fixed-edge binning stage: (group, bin, cnt) with
    ``bin = clamp(floor((x - lo)/width), 0, bins-1)``. Fixed edges are
    the STREAMING contract for histogram sketches — a stream can't take
    the batch min/max pre-pass, so edges are declared up front (as every
    production metrics system does) and out-of-range mass clamps into
    the edge bins. Counts add, so an update-mode streaming sum maintains
    exactly this table with state bounded at bins × groups."""
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("bigint")
    return (df.where(F.col(col).isNotNull())
              .select(F.col(group),
                      F.least(F.greatest(b, F.lit(0)),
                              F.lit(bins - 1)).alias("bin"))
              .groupBy(group, "bin")
              .agg(F.count(F.lit(1)).alias("cnt")))


def hist_quantiles_fixed(binned: DataFrame, group: str,
                         probabilities: tuple[float, ...] = (2500, 5000,
                                                             9000, 9900),
                         lo: float = 0.0, width: float = 2.0) -> DataFrame:
    """Quantile read-off over a fixed-edge (group, bin, cnt) table from
    :func:`hist_bins_fixed` — however that table was maintained (batch
    pass, streaming update-mode sum, or a merge of persisted
    histograms). Probabilities are integer basis points; same
    exact-integer threshold + one conditional-min aggregate as
    :func:`hist_quantiles`."""
    wcum = W.partitionBy(group).orderBy("bin") \
            .rowsBetween(W.unboundedPreceding, W.currentRow)
    wtot = W.partitionBy(group)
    cum = (binned.withColumn("cum", F.sum("cnt").over(wcum))
                 .withColumn("_n", F.sum("cnt").over(wtot)))
    qbins = [F.min(F.when(F.lit(10_000) * F.col("cum")
                          >= F.lit(int(bp)) * F.col("_n"), F.col("bin")))
              .alias(f"_qbin{int(bp)}") for bp in probabilities]
    sel = (cum.groupBy(group)
           .agg(F.first("_n").alias("n"), *qbins))
    return (sel.select(
                group, "n",
                *[F.round(F.lit(lo) + F.col(f"_qbin{int(bp)}")
                          * F.lit(width), 6).alias(f"p{int(bp)}")
                  for bp in probabilities])
            .orderBy(group))
