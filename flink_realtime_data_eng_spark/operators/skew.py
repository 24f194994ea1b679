"""Skew-mitigation operators: salted two-stage aggregation.

AQE's skew-join splitting (enabled in session._COMMON) handles skewed
JOINS at runtime; skewed AGGREGATION keys need restructuring — a hot key
funnels its entire partition through one reducer. Salting splits each key
into ``salt`` sub-keys for a partial aggregate, then merges the partials
in a second (tiny) aggregate:

    stage 1:  groupBy(keys…, salt = pmod(hash(row-id-ish), N))  ← N-way split
    stage 2:  groupBy(keys…)  over the ≤N partial rows per key

Works for any DECOMPOSABLE aggregate (sum/count/min/max — the only
aggregates the reference uses, SURVEY §2.4). Catalyst already does map-side
partial aggregation, which handles *moderate* skew; explicit salting is for
the pathological case where even the shuffled partition for one key exceeds
an executor (think: one user_id owning 10% of 100 TB). Cost: one extra
(cheap) shuffle over ~keys×salt rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(df: DataFrame, keys: Sequence[str],
               partials: Sequence[tuple[Column, str]],
               finals: Sequence[tuple[str, str]],
               salt: int = 32,
               salt_on: str | Column | None = None) -> DataFrame:
    """Two-stage salted aggregation.

    partials: (aggregate expression, partial column name) for stage 1.
    finals:   (merge function name — 'sum'/'min'/'max', partial name) for
              stage 2; the output column keeps the partial's name.
    salt_on:  column whose hash spreads a key's rows over salt buckets
              (default: a uniform random salt — fine for decomposable aggs;
              pass a column for deterministic tests).
    """
    salt_col = (F.pmod(F.hash(F.col(salt_on) if isinstance(salt_on, str) else salt_on),
                       F.lit(salt))
                if salt_on is not None
                else F.floor(F.rand(seed=42) * salt).cast("int"))
    stage1 = (df.withColumn("_salt", salt_col)
                .groupBy(*keys, "_salt")
                .agg(*[expr.alias(name) for expr, name in partials]))
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    return (stage1.groupBy(*keys)
            .agg(*[merge[fn](name).alias(name) for fn, name in finals]))


def salted_count(df: DataFrame, keys: Sequence[str], salt: int = 32,
                 out_col: str = "cnt") -> DataFrame:
    """Skew-proof keyed count: count partials per (key, salt), sum partials.
    Result is identical to ``groupBy(keys).count()`` for ANY salt."""
    return salted_agg(df, keys,
                      partials=[(F.count(F.lit(1)), out_col)],
                      finals=[("sum", out_col)],
                      salt=salt)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Hot-key equi-join mitigation by explicit salting: the big side
    scatters each row into one of ``salt`` sub-keys, the small side
    replicates ``salt``× with every sub-key, and the join runs on
    (key, salt) — a single hot key's rows now spread across ``salt``
    reducers instead of one.

    Use when AQE's skew-join split can't apply (it only splits
    shuffle-stage partitions of sort-merge joins; a hot key joined
    through an aggregation boundary, or a skew so extreme one split
    still overflows, wants the explicit form). Cost: small side ×salt
    (keep it dim-sized), one extra int column on the shuffle key.

    The scatter uses a hash of the big side's entire row (via
    ``F.hash(*columns)``), not rand(): deterministic across retries —
    a re-executed task re-salts identically, so no duplicate/lost rows
    under speculative execution, and results are reproducible.
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    scatter = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    big_s = big.withColumn("_salt", scatter)
    salts = F.array(*[F.lit(i) for i in range(salt)])
    small_s = small.withColumn("_salt", F.explode(salts))
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
