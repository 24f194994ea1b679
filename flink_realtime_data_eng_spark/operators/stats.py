"""Distribution statistics operators.

Exact quantiles are per-group sorts; Spark's ``percentile`` aggregate
does the sort inside the aggregation buffer of each group after the
one hash shuffle on the group key — no global sort, no second pass.
(For quantiles over a single giant group at 100 TB, switch to
``percentile_approx`` — a t-digest style mergeable sketch — and accept
the approximation; the exact form here is the oracle-checkable path.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def exact_group_quantiles(df: DataFrame, group: Sequence[str], value: str,
                          qs: Sequence[float] = (0.25, 0.5, 0.9, 0.99),
                          ) -> DataFrame:
    """Exact linear-interpolation quantiles of ``value`` per group, one
    column per requested quantile (``p25``, ``p50``, ...), rounded to
    6 dp so both engines' interpolation arithmetic hashes identically.
    """
    names = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q}")
        pct = round(q * 100, 6)  # 0.25->p25, 0.5->p50, 1.0->p100, 0.999->p99_9
        names.append(f"p{int(pct)}" if pct == int(pct)
                     else "p" + str(pct).replace(".", "_"))
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantiles in {qs}")
    aggs = [
        F.round(F.percentile(value, F.lit(float(q))), 6).alias(name)
        for q, name in zip(qs, names)]
    return df.groupBy(*group).agg(
        F.count(value).cast("bigint").alias("n"), *aggs)


def json_props_stats(df: DataFrame, json_col: str = "props",
                     field: str = "k", group_col: str = "event_type") -> DataFrame:
    """Semi-structured extraction: pull an integer field out of a JSON
    string column and aggregate it per group.

    ``from_json`` with an explicit schema is the scale path — it parses
    once into a typed struct inside whole-stage codegen (a JSON scan with
    schema inference would read the data twice; repeated
    ``get_json_object`` calls re-parse the string per field). Extraction is
    map-side; the only shuffle is the final low-cardinality aggregate.
    """
    parsed = F.from_json(F.col(json_col), f"{field} BIGINT")
    return (df.select(F.col(group_col), parsed[field].alias("_v"))
              .groupBy(group_col)
              .agg(F.count("_v").alias("n_present"),
                   F.sum("_v").alias("sum_v"),
                   F.min("_v").alias("min_v"),
                   F.max("_v").alias("max_v"))
              .orderBy(group_col))


def pivot_counts(df: DataFrame, row_key: str, pivot_col: str,
                 pivot_values: Sequence[str]) -> DataFrame:
    """Pivot (long → wide) with an EXPLICIT pivot-value list: one hash
    aggregate producing one conditional-count column per value.

    The explicit list matters at scale: ``pivot`` without values first runs
    a distinct-collect job over 100 TB to discover columns (and can blow
    the 10k-column default cap on high-cardinality keys); with values the
    plan is a single aggregate, identical to hand-written CASE WHEN sums —
    which is also exactly what the SQL oracle writes.
    """
    return (df.groupBy(row_key)
              .pivot(pivot_col, list(pivot_values))
              .count()
              .na.fill(0, list(pivot_values))
              .orderBy(row_key))


def unpivot_counts(df: DataFrame, row_key: str, value_cols: Sequence[str],
                   var_name: str = "event_type",
                   value_name: str = "cnt") -> DataFrame:
    """Unpivot (wide → long), the inverse of :func:`pivot_counts`: melt
    the named value columns back into (row_key, var, value) rows via
    ``DataFrame.unpivot`` — a pure map-side expand (each input row emits
    ``len(value_cols)`` rows from one projection, no shuffle, no UDF).
    Zero cells survive as explicit rows, so
    ``unpivot(pivot(x)) == x ∪ zero-filled combinations`` — the exact
    round-trip contract the oracle checks.
    """
    return (df.unpivot(row_key, list(value_cols), var_name, value_name)
              .withColumn(value_name, F.col(value_name).cast("bigint"))
              .orderBy(row_key, var_name))


def key_skew_profile(df: DataFrame, cols: Sequence[str],
                     k: int = 10) -> DataFrame:
    """Heavy-hitter / skew report for candidate shuffle keys: for each
    column, its top-``k`` values with counts, the value's share of rows,
    and a per-column skew ratio (top-share × n_distinct; 1.0 ⇒ uniform,
    ≫1 ⇒ salt this key before shuffling on it).

    Scale shape — no per-column funnel anywhere: rows fan out map-side to
    (col, value) pairs, ONE (col, value) aggregate counts them; per-column
    total/distinct is a tiny (n_cols-row) aggregate that broadcasts back;
    and top-k is TWO-LEVEL — rank inside (col, hash-bucket) partitions
    first (≤ buckets×k candidates per column survive), then rank that tiny
    candidate set per column. A billion-distinct-key column never passes
    through a single partition. This is the diagnostic that decides where
    ``operators.skew.salted_agg`` is worth its extra pass.

    Output: col, key (string form), cnt, share (6 dp), n_distinct,
    skew_ratio (6 dp), rank.
    """
    from pyspark.sql import Window as W
    if not cols:
        raise ValueError("at least one column to profile")
    buckets = 64
    # NULL keys become an explicit sentinel so they group/rank identically
    # in every engine (NULLS FIRST/LAST defaults differ across engines).
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col"),
                 F.coalesce(F.col(c).cast("string"),
                            F.lit("<NULL>")).alias("key"))
        for c in cols])).alias("p")).select("p.col", "p.key")
    # Materialize ONCE: col_stats and the candidate ranking both consume
    # the counts aggregate — otherwise the source scans twice.
    counts = pairs.groupBy("col", "key").agg(
        F.count(F.lit(1)).alias("cnt")).localCheckpoint(eager=True)
    col_stats = counts.groupBy("col").agg(
        F.sum("cnt").alias("_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
    order = (F.col("cnt").desc(), F.col("key"))
    wb = W.partitionBy("col", "_b").orderBy(*order)
    cand = (counts
            .withColumn("_b", F.pmod(F.xxhash64("key"), F.lit(buckets)))
            .withColumn("_r", F.row_number().over(wb))
            .filter(F.col("_r") <= k))
    wc = W.partitionBy("col").orderBy(*order)
    return (cand.withColumn("rank", F.row_number().over(wc))
            .filter(F.col("rank") <= k)
            .join(F.broadcast(col_stats), "col")
            .select(
                "col", "key", "cnt",
                F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
                "n_distinct",
                F.round(F.col("cnt") / F.col("_total")
                        * F.col("n_distinct"), 6).alias("skew_ratio"),
                "rank"))


def variant_props_stats(df: DataFrame, json_col: str = "props",
                        field: str = "k",
                        group_col: str = "event_type") -> DataFrame:
    """Schema-free semi-structured extraction on Spark 4's VariantType:
    ``parse_json`` once into the binary variant encoding (map-side, no
    schema declaration), then typed path extraction with
    ``try_variant_get``.

    Variant is the open-schema counterpart to ``from_json`` + StructType
    (:func:`json_props_stats`): parse cost is paid once per row however
    many paths are later extracted, unknown keys are preserved, and
    extraction stays in codegen. The scale contract is the same — pure
    map-side until the final low-cardinality aggregate.
    """
    v = F.parse_json(F.col(json_col))
    k = F.try_variant_get(v, f"$.{field}", "bigint")
    return (df.select(F.col(group_col), k.alias("_v"),
                      F.col(json_col).isNotNull().alias("_present"))
              .groupBy(group_col)
              .agg(F.count(F.when(F.col("_present"), 1)).alias("n_rows"),
                   F.count("_v").alias("n_typed"),
                   F.sum("_v").alias("sum_v"),
                   F.min("_v").alias("min_v"),
                   F.max("_v").alias("max_v"))
              .orderBy(group_col))


def iqr_outliers(df: DataFrame, group: str, value: str,
                 factor: float = 1.5) -> DataFrame:
    """Tukey-fence outlier counts per group: rows outside
    ``[q1 - factor·IQR, q3 + factor·IQR]`` of their group's exact
    quartiles — the standard numeric data-quality gate.

    Plan shape: ONE exact-quantile aggregate per group (group cardinality
    is small by assumption — these are event types / sources, not user
    ids), broadcast back onto the fact scan for a map-side flag + count.
    The fact table shuffles once for the final count aggregate; fences
    round to 6 dp so both engines compare against identical bounds.
    """
    q = (df.groupBy(group)
           .agg(F.round(F.percentile(value, F.lit(0.25)), 6).alias("q1"),
                F.round(F.percentile(value, F.lit(0.75)), 6).alias("q3")))
    fence_lo = F.round(F.col("q1") - factor * (F.col("q3") - F.col("q1")), 6)
    fence_hi = F.round(F.col("q3") + factor * (F.col("q3") - F.col("q1")), 6)
    fences = q.select(group, fence_lo.alias("lo"), fence_hi.alias("hi"))
    flagged = (df.join(F.broadcast(fences), group)
                 .select(F.col(group),
                         ((F.col(value) < F.col("lo"))
                          | (F.col(value) > F.col("hi"))).alias("is_out")))
    return (flagged.groupBy(group)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("is_out").cast("bigint")).alias("n_outliers"))
            .orderBy(group))


def global_prefix_sum(df: DataFrame, value_col: str, order_col: str,
                      out_col: str = "running_total",
                      num_ranges: int = 32) -> DataFrame:
    """Corpus-wide running total WITHOUT a single-partition window — the
    two-phase distributed prefix sum:

    1. range-partition rows by ``order_col`` (boundaries from a sample,
       as in any global sort) and cumsum WITHIN each partition;
    2. aggregate one row per partition (its total), cumsum THOSE on the
       driver-small frame, and broadcast each partition's starting offset
       back onto phase 1's rows.

    A plain ``SUM() OVER (ORDER BY …)`` funnels 100 TB through ONE task;
    this shape keeps both passes fully parallel and adds only a
    partition-count-sized broadcast. Requires ``order_col`` values unique
    (they order the prefix sum deterministically).

    Output: input columns + ``out_col`` (inclusive running total).
    """
    from pyspark.sql import Window as W
    ranged = (df.repartitionByRange(num_ranges, F.col(order_col))
                .withColumn("_pid", F.spark_partition_id()))
    w_local = (W.partitionBy("_pid").orderBy(order_col)
                .rowsBetween(W.unboundedPreceding, W.currentRow))
    local = ranged.withColumn("_local", F.sum(value_col).over(w_local))
    # one row per partition; ordering partitions by their key range =
    # ordering by min(order_col) since ranges are disjoint
    ptotals = (local.groupBy("_pid")
               .agg(F.min(order_col).alias("_min_key"),
                    F.sum(value_col).alias("_ptotal")))
    offsets = ptotals.withColumn(
        "_offset",
        F.coalesce(F.sum("_ptotal").over(
            W.orderBy("_min_key").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)))
    return (local.join(F.broadcast(offsets.select("_pid", "_offset")), "_pid")
            .withColumn(out_col, (F.col("_local") + F.col("_offset"))
                        .cast("bigint"))
            .drop("_pid", "_local"))


def global_prefix_max(df: DataFrame, value_col: str, order_col: str,
                      out_col: str = "running_max",
                      inclusive: bool = True,
                      num_ranges: int = 32,
                      group_cols: Sequence[str] = ()) -> DataFrame:
    """Corpus-wide running maximum without a single-partition window — the
    prefix-MAX twin of :func:`global_prefix_sum` (max is associative and
    commutative, so the same two-phase shape applies): local running max
    per range partition, then each partition's start offset = max of all
    EARLIER partitions' maxima, broadcast back and combined with
    ``greatest``.

    ``inclusive=False`` gives the strict prefix (max over rows strictly
    before the current one, NULL for the global first row) — the form the
    event-time disorder profile needs (``x_disorder_stats``'s running-max
    regression at 100 TB). Requires ``order_col`` values unique.

    ``group_cols`` gives the PER-GROUP running max with the identical
    shape: range-partition by (group…, order) so each group's rows stay
    contiguous across partitions, run the local window per
    (partition, group), and compute each (partition, group) slice's start
    offset from earlier slices of the SAME group. A plain
    ``MAX OVER (PARTITION BY group ORDER BY …)`` funnels every group
    through one task — fatal when a group is corpus-scale (five event
    types over 100 TB); here the offsets window runs on the
    (num_ranges × groups-per-boundary)-row totals frame, never the data.
    """
    from pyspark.sql import Window as W
    gcols = [F.col(c) for c in group_cols]
    ranged = (df.repartitionByRange(num_ranges, *gcols, F.col(order_col))
                .withColumn("_pid", F.spark_partition_id()))
    upper = W.currentRow if inclusive else -1
    w_local = (W.partitionBy("_pid", *group_cols).orderBy(order_col)
                .rowsBetween(W.unboundedPreceding, upper))
    local = ranged.withColumn("_local", F.max(value_col).over(w_local))
    ptotals = (local.groupBy("_pid", *group_cols)
               .agg(F.min(order_col).alias("_min_key"),
                    F.max(value_col).alias("_pmax")))
    offsets = ptotals.withColumn(
        "_offset",
        F.max("_pmax").over(
            W.partitionBy(*group_cols).orderBy("_min_key")
             .rowsBetween(W.unboundedPreceding, -1)))
    join_keys = ["_pid", *group_cols]
    return (local.join(F.broadcast(offsets.select(*join_keys, "_offset")),
                       join_keys)
            .withColumn(out_col, F.greatest("_local", "_offset"))
            .drop("_pid", "_local", "_offset"))


def rank_normalize(df: DataFrame, group: str, value: str,
                   id_col: str = "event_id") -> DataFrame:
    """Percent-rank (quantile) normalization per group — the rank
    transform feature pipelines apply to heavy-tailed columns:
    pct = (#rows strictly below) / (n - 1), i.e. SQL ``percent_rank``.

    Scale shape: the ranking window runs over DISTINCT (group, value)
    rows (cardinality-bounded), never over the raw rows — a naive
    ``percent_rank().over(partitionBy(group))`` serializes every row of
    a group through one task, which dies on the first billion-row group.
    Here: one (group, value) count aggregate, a cumulative window on the
    collapsed frame, and one equi-join back — all shuffles keyed and
    partial-aggregated. The DuckDB oracle runs the BUILTIN percent_rank,
    pinning the decomposition to the textbook definition.

    Output: (id, group, pct6) for non-null values; a single-row group
    normalizes to 0 (the SQL convention).
    """
    from pyspark.sql import Window as W
    rows = df.filter(F.col(value).isNotNull()).select(id_col, group, value)
    counts = rows.groupBy(group, value).agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy(group).orderBy(value)
    cum = counts.withColumn("below", F.sum("c").over(w) - F.col("c"))
    totals = rows.groupBy(group).agg(F.count(F.lit(1)).alias("n"))
    pct = (F.when(F.col("n") > 1,
                  F.round(F.col("below").cast("double")
                          / (F.col("n") - 1), 6))
            .otherwise(F.lit(0.0)))
    return (rows.join(cum, [group, value]).join(totals, group)
                .select(id_col, group, pct.alias("pct6"))
                .orderBy(id_col))


def target_encode_loo(df: DataFrame, category: str, target: str,
                      id_col: str = "event_id",
                      smoothing: int = 10) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing
    (Micci-Barreca, SIGKDD Expl. 2001): each row's category becomes the
    mean target of the OTHER rows in its category, shrunk toward the
    global mean — enc_i = (sum_cat - y_i + m*prior) / (n_cat - 1 + m).
    Excluding the row's own target is what stops the feature from
    leaking its label into training.

    Determinism contract: all sums in e6 fixed-point BIGINT (the repo's
    money contract), prior = global_sum div global_n (truncating integer
    division, identical in Spark ``div`` and DuckDB ``//``); the one
    float division happens last on identical integers and rounds to 6 dp.

    Scale shape: category totals are a |categories|-bounded aggregate
    broadcast back onto the rows — one map-side join, no raw-row
    re-shuffle; the global prior is a 1-row scalar cross join.
    """
    y6 = F.round(F.col(target) * 1_000_000).cast("bigint")
    rows = (df.filter(F.col(target).isNotNull())
              .select(id_col, category, y6.alias("y6")))
    cat = rows.groupBy(category).agg(F.sum("y6").alias("sum6"),
                                     F.count(F.lit(1)).alias("n"))
    glob = rows.agg(F.expr("sum(y6) div count(*)").alias("prior6"))
    enc = ((F.col("sum6") - F.col("y6")
            + F.lit(smoothing) * F.col("prior6")).cast("double")
           / (F.col("n") - 1 + smoothing))
    return (rows.join(F.broadcast(cat), category).crossJoin(glob)
                .select(id_col, category,
                        F.round(enc / 1_000_000, 6).alias("enc6"))
                .orderBy(id_col))


def winsorize(df: DataFrame, group: str, value: str,
              id_col: str = "event_id",
              lo: float = 0.05, hi: float = 0.95) -> DataFrame:
    """Winsorization: clip each value into its group's [p_lo, p_hi]
    exact-quantile band — the outlier treatment that keeps the row (vs
    IQR filtering, operators/stats.iqr_outliers, which drops it).

    Quantiles use the same linear-interpolation definition as
    :func:`exact_group_quantiles` (percentile_cont semantics, identical
    in DuckDB's quantile_cont), computed per group once and joined back
    broadcast — the raw rows shuffle only for the |groups|-bounded
    quantile aggregate, and the clip itself is map-side.

    Output: (id, group, clipped6).
    """
    rows = df.filter(F.col(value).isNotNull()).select(id_col, group, value)
    # Clip against the 6-dp-ROUNDED quantiles (exact_group_quantiles'
    # cross-engine contract): the raw interpolated double can differ in
    # the last ulp between engines, the rounded one cannot.
    q = (rows.groupBy(group)
             .agg(F.round(F.percentile(value, F.lit(lo)), 6).alias("q_lo"),
                  F.round(F.percentile(value, F.lit(hi)), 6).alias("q_hi")))
    clipped = F.least(F.greatest(F.col(value), F.col("q_lo")), F.col("q_hi"))
    return (rows.join(F.broadcast(q), group)
                .select(id_col, group,
                        F.round(clipped, 6).alias("clipped6"))
                .orderBy(id_col))


def roc_auc(df: DataFrame, label: str, score: str,
            group: str | None = None) -> DataFrame:
    """Exact ROC-AUC of a score against a boolean label via the
    Mann-Whitney U rank-sum identity — the classifier-eval number for
    quality filters (does the cheap score actually separate keep from
    drop?): AUC = P(score_pos > score_neg) + ½·P(tie).

    Determinism contract: the decomposition stays in INTEGERS until the
    final division — per distinct score s, with ``np(s)``/``nn(s)``
    positive/negative counts and ``below(s)`` negatives strictly below,
    ``2U = Σ np(s)·(2·below(s) + nn(s))`` is an exact BIGINT (the ½-tie
    credit folded in without floats), and ``auc6 = round(2U / (2PN), 6)``
    divides identical integers in both engines.

    Scale shape: the :func:`rank_normalize` recipe — one (group, score)
    count aggregate, a cumulative window over the DISTINCT-score frame
    (cardinality-bounded, never the raw rows), one |groups|-bounded final
    aggregate. No global sort of rows anywhere.

    Output: (group, n_pos, n_neg, u2, auc6); auc6 NULL when a class is
    empty (AUC undefined).
    """
    from pyspark.sql import Window as W
    gcols = [group] if group else []
    rows = (df.filter(F.col(score).isNotNull())
              .filter(F.col(label).isNotNull())  # a NULL label is neither
              # class — excluding it (not counting it negative) keeps AUC
              # a statement about labeled rows only, matching the oracle.
              .select(*gcols, F.col(score).alias("_s"),
                      F.col(label).cast("boolean").alias("_y")))
    counts = (rows.groupBy(*gcols, "_s")
              .agg(F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("np"),
                   F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("nn")))
    w = (W.partitionBy(*gcols) if gcols else W.partitionBy()).orderBy("_s")
    cum = counts.withColumn("below", F.sum("nn").over(w) - F.col("nn"))
    agg = (cum.groupBy(*gcols)
           .agg(F.sum("np").cast("bigint").alias("n_pos"),
                F.sum("nn").cast("bigint").alias("n_neg"),
                F.sum(F.col("np") * (2 * F.col("below") + F.col("nn")))
                 .cast("bigint").alias("u2")))
    auc = (F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                  F.round(F.col("u2")
                          / (2.0 * F.col("n_pos") * F.col("n_neg")), 6)))
    return (agg.select(*gcols, "n_pos", "n_neg", "u2", auc.alias("auc6"))
               .orderBy(*gcols) if gcols else
            agg.select("n_pos", "n_neg", "u2", auc.alias("auc6")))


def ols_trend(df: DataFrame, group: str, x: str, y: str) -> DataFrame:
    """Exact least-squares trend per group — slope / intercept / R² of
    integer ``y`` on integer ``x`` from ONE aggregate pass of exact
    BIGINT sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy), combined in
    a single closed-form double expression (the :func:`x_correlation`
    contract: IEEE multiply/divide on identical integer inputs is
    deterministic, so even the float step hash-matches cross-engine).

    Callers pre-scale: x small (e.g. days since a FIXED epoch constant,
    never a data-dependent min — that would need a second pass) and y in
    a fixed-point unit sized so Σy² fits BIGINT at target scale.

    Scale shape: map-side partial aggregation to |groups| rows; no
    centering pass, no per-row doubles, no window.

    Output: (group, n, slope6, intercept6, r2_6) in y-units per x-unit;
    degenerate groups (constant x or y) report slope 0 / r² 0.
    """
    s = (df.groupBy(group)
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).alias("sx"), F.sum(y).alias("sy"),
              F.sum(F.col(x) * F.col(x)).alias("sxx"),
              F.sum(F.col(y) * F.col(y)).alias("syy"),
              F.sum(F.col(x) * F.col(y)).alias("sxy")))
    return ols_combine(s, group)


def ols_combine(s: DataFrame, group: str) -> DataFrame:
    """Closed-form OLS over an already-aggregated sufficient-statistics
    frame (group, n, sx, sy, sxx, syy, sxy) — split out so the STREAMING
    maintenance path (update-mode running sums) shares the identical
    combine expression with the batch one-pass form."""
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") \
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") \
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    deny = nd * F.col("syy").cast("double") \
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    slope = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    intercept = (F.col("sy").cast("double") - slope
                 * F.col("sx").cast("double")) / nd
    r2 = F.when((den > 0) & (deny > 0),
                (num * num) / (den * deny)).otherwise(F.lit(0.0))
    return (s.select(group, F.col("n").cast("bigint").alias("n"),
                     F.round(slope, 6).alias("slope6"),
                     F.round(intercept, 6).alias("intercept6"),
                     F.round(r2, 6).alias("r2_6"))
             .orderBy(group))


# Poisson(1) CDF split points scaled to 2^32, for the hash-bootstrap
# resample weights: P(W=k) for k=0..3 plus a truncated >=4 tail (~0.37%
# of draws) — floor(cdf_k * 2^32), exact integer literals so Spark and
# any SQL engine draw identical weights from identical hashes.
_POISSON1_T = (1580030168, 3160060337, 3950075421, 4213413783)


def bootstrap_ci(df: DataFrame, value: str, group: str,
                 id_col: str, replicas: int = 32) -> DataFrame:
    """Poisson bootstrap CI for the per-group mean — uncertainty
    quantification for corpus statistics at scale (Chamandy et al. 2012,
    "Estimating Uncertainty for Massive Data Streams" — the Google
    poisson-bootstrap recipe): each row joins replica b with weight ~
    Poisson(1) drawn DETERMINISTICALLY from md5(b, id), so resamples
    never materialize, never shuffle the corpus twice, and replay
    identically in any engine (weights from integer threshold compares,
    means as exact e6-integer ``div``).

    The CI is rank-based on the replica means (2nd and 31st order
    statistics of 32 — a ~93.75% interval): order statistics of exact
    integers are engine-independent where an interpolated percentile
    would not be.

    Scale shape: the ``replicas``× row fan-out is map-side (explode)
    and collapses in the same partial aggregate that computes it —
    the shuffle carries |groups|·replicas cells, not rows. One final
    window over the replicas-per-group frame.

    Output: (group, n, mean_e6, boot_lo_e6, boot_hi_e6).
    """
    from pyspark.sql import Window as W
    t0, t1, t2, t3 = _POISSON1_T
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit("boot"), F.col("_b").cast("string"),
                       F.lit(":"), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("bigint")
    w_expr = (F.when(h < t0, 0).when(h < t1, 1).when(h < t2, 2)
               .when(h < t3, 3).otherwise(4)).cast("bigint")
    rows = df.select(group, id_col, F.col(value).cast("bigint").alias("_y"))
    rep = (rows.withColumn(
        "_b", F.explode(F.array(*[F.lit(b) for b in range(replicas)])))
        .withColumn("_w", w_expr))
    per_rep = (rep.groupBy(group, "_b")
               .agg(F.sum(F.col("_w") * F.col("_y")).alias("_wy"),
                    F.sum("_w").alias("_w")))
    mean_rep = per_rep.select(
        group, "_b",
        F.when(F.col("_w") > 0, F.expr("_wy div _w"))
         .otherwise(F.lit(0)).cast("bigint").alias("_m"))
    wr = W.partitionBy(group).orderBy("_m", "_b")
    ranked = mean_rep.withColumn("_rk", F.row_number().over(wr))
    ci = (ranked.groupBy(group)
          .agg(F.max(F.when(F.col("_rk") == 2, F.col("_m")))
                .alias("boot_lo_e6"),
               F.max(F.when(F.col("_rk") == replicas - 1, F.col("_m")))
                .alias("boot_hi_e6")))
    base = (rows.groupBy(group)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.expr("sum(_y) div count(*)").cast("bigint")
                  .alias("mean_e6")))
    return (base.join(ci, group)
            .select(group, "n", "mean_e6", "boot_lo_e6", "boot_hi_e6")
            .orderBy(group))


def kaplan_meier(df: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts", censor_days: int = 7) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes — the churn curve
    product-limit estimator (Kaplan & Meier, JASA 1958), the standard
    answer to "what fraction of users is still active after d days"
    under right-censoring: a user's observation = [first event, last
    event]; a user whose last event falls within ``censor_days`` of the
    corpus horizon is CENSORED (still active — their true lifetime is
    only known to exceed the observed one), everyone else is a churn
    event at duration (last - first) in whole days.

    At each distinct duration d with at least one churn:
    ``S(d) = prod_{d' <= d} (1 - events(d') / at_risk(d'))``,
    computed in the repo's exact-replay style: each factor rounds ONCE
    to an e6 log-space BIGINT (ln of a ratio of exact integers), the
    cumulative sum is integer-exact, and the final survival double is
    one exp + one 6 dp round. at_risk(d) is a DESCENDING-duration
    running sum — no corpus-total scalar needed. Factors where
    at_risk == events (curve extinction) are not representable in log
    space (-inf); such durations are excluded from the output support,
    the standard presentation (the curve is reported while positive).

    Scale shape: one (user) aggregate over the event stream, then ALL
    remaining work happens on the distinct-duration frame — value-
    cardinality bounded (<= observation-window days), the x_ks_test
    argument — so the global windows ride a bounded input at any SF.
    The horizon is a 1-row broadcast (the sanctioned scalar).

    Output: (duration_days, n_at_risk, n_events, surv_lle6, survival).
    """
    from pyspark.sql import Window as W
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    day_ms = 86_400_000
    per_user = (df.select(F.col(user_col).alias("u"), ms.alias("ms"))
                .groupBy("u")
                .agg(F.min("ms").alias("first_ms"),
                     F.max("ms").alias("last_ms")))
    horizon = per_user.agg(F.max("last_ms").alias("h_ms"))
    pu = (per_user.crossJoin(F.broadcast(horizon))
          .select(F.expr(f"(last_ms - first_ms) div {day_ms}")
                  .alias("duration_days"),
                  (F.col("last_ms")
                   < F.col("h_ms") - F.lit(censor_days * day_ms))
                  .alias("churned")))
    byd = (pu.groupBy("duration_days")
           .agg(F.count(F.lit(1)).alias("n_at_d"),
                F.sum(F.when(F.col("churned"), 1).otherwise(0))
                 .alias("n_events")))
    # Both unpartitioned windows below ride `byd`, the distinct-duration
    # AGGREGATE (<= observation-window days at any SF) — safe by
    # construction despite Spark's "moving all data to a single
    # partition" log line; whitelisted with this boundedness argument in
    # tests/test_plan_lint.py GLOBAL_WINDOW_OK.
    w_desc = (W.orderBy(F.col("duration_days").desc())
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    risk = byd.withColumn("n_at_risk", F.sum("n_at_d").over(w_desc))
    step = F.when(
        (F.col("n_events") > 0) & (F.col("n_at_risk") > F.col("n_events")),
        F.round(F.log((F.col("n_at_risk") - F.col("n_events"))
                      .cast("double") / F.col("n_at_risk"))
                * 1_000_000).cast("bigint")).otherwise(F.lit(0))
    w_asc = (W.orderBy("duration_days")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    curve = (risk.withColumn("step_lle6", step)
             .withColumn("surv_lle6",
                         F.sum("step_lle6").over(w_asc).cast("bigint")))
    return (curve
            .filter((F.col("n_events") > 0)
                    & (F.col("n_at_risk") > F.col("n_events")))
            .select(F.col("duration_days").cast("bigint"),
                    F.col("n_at_risk").cast("bigint"),
                    F.col("n_events").cast("bigint"),
                    "surv_lle6",
                    F.round(F.exp(F.col("surv_lle6").cast("double")
                                  / 1_000_000.0), 6).alias("survival"))
            .orderBy("duration_days"))
