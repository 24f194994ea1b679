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

from pyspark.sql import Column, DataFrame, functions as F

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
