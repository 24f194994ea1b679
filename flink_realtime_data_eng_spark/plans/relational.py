"""TPC-H-style relational queries over the driver tables (bench headliners).

The reference has no SQL layer at all (SURVEY §3) — these queries exercise and
benchmark the engine's relational core (multi-agg groupBy, star joins, top-k).
Plans are written so Catalyst produces the 100 TB shape: filters adjacent to
scans (parquet pushdown), small dims explicitly broadcast, aggregations
partial/final, AQE free to re-plan.

Float determinism: monetary measures are converted per-row to exact integer
fixed-point (×10⁴, BIGINT) *before* summing. Per-row double arithmetic is
bit-deterministic across engines (same IEEE expression tree); only the SUM
ordering is not — integer sums make the result byte-identical to the DuckDB
oracle regardless of partitioning, and make ORDER BY ties impossible to
mis-rank. Averages divide two exact integers (one double division → exact
match), rounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..operators.ranking import top_k_per_group
from ..schemas import load_table


def _e4(col: Column) -> Column:
    """Exact fixed-point: round(value * 10000) as BIGINT (per-row, then sum)."""
    return F.round(col * 10000).cast("bigint")


def pricing_summary(spark: SparkSession, sf_dir: str,
                    cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate groupBy on lineitem.
    One shuffle on 2 low-cardinality keys; all 8 measures partial-aggregated
    map-side. Monetary sums are *_e4 fixed-point BIGINTs."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
         .groupBy("l_returnflag", "l_linestatus")
         .agg(F.sum(_e4(F.col("l_quantity"))).alias("sum_qty_e4"),
              F.sum(_e4(F.col("l_extendedprice"))).alias("sum_base_price_e4"),
              F.sum(_e4(disc_price)).alias("sum_disc_price_e4"),
              F.sum(_e4(charge)).alias("sum_charge_e4"),
              F.count(F.lit(1)).alias("count_order"))
         .select("l_returnflag", "l_linestatus",
                 "sum_qty_e4", "sum_base_price_e4", "sum_disc_price_e4",
                 "sum_charge_e4", "count_order",
                 F.round(F.col("sum_qty_e4") / F.col("count_order") / 1e4, 6)
                  .alias("avg_qty"),
                 F.round(F.col("sum_base_price_e4") / F.col("count_order") / 1e4, 6)
                  .alias("avg_price"))
         .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(spark: SparkSession, sf_dir: str,
                      segment: str = "BUILDING",
                      date: str = "1998-03-15") -> DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with selective filters.
    customer is SF-scaled, so its join strategy is left to AQE (broadcast
    at small SF, shuffle at 100 TB); lineitem⋈orders is the big shuffle."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(date).cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(date).cast("timestamp"))
    rev = F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_e4")
    return (
        li.join(o.join(c, o.o_custkey == c.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(rev)
          .select(F.col("l_orderkey"),
                  # parquet dates read as TIMESTAMP_NTZ; session tz is UTC so
                  # the cast is instant-preserving and unix_millis resolves.
                  F.unix_millis(F.col("o_orderdate").cast("timestamp"))
                   .alias("o_orderdate_ms"),
                  F.col("o_orderpriority"), F.col("revenue_e4"))
          .orderBy(F.col("revenue_e4").desc(), "o_orderdate_ms", "l_orderkey")
          .limit(10)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str,
                          region: str = "ASIA",
                          date_from: str = "1996-01-01",
                          date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H Q5 shape: 6-table star join → revenue per nation. Truly-tiny
    dims (nation⋈region, supplier at these SFs) broadcast; customer is
    SF-scaled (~150k × SF rows) so it is NEVER force-broadcast — the
    orders⋈customer join shuffles on custkey and AQE is free to pick
    broadcast at small SFs. The supplier-nation = customer-nation equality
    applies post-join (per spec)."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    # nation⋈region: 25-row dim, broadcast-safe at any SF. customer joins it
    # broadcast, but the customer side itself shuffles into orders.
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    dim = c.join(F.broadcast(nr), c.c_nationkey == F.col("n_nationkey"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .join(dim, F.col("o_custkey") == dim.c_custkey)
          .join(s,
                (li.l_suppkey == s.s_suppkey)
                & (s.s_nationkey == F.col("c_nationkey")))
          .groupBy("n_name")
          .agg(F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .alias("revenue_e4"))
          .orderBy(F.col("revenue_e4").desc())
    )


def top_parts_per_brand(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k revenue parts per brand: lineitem agg first (shrinks to one row
    per part), join the part dim (AQE picks broadcast while part fits, a
    shuffle join at 100 TB — both sides are partkey-scaled), then windowed
    row_number ≤ k — partition-local TopK, no global sort. Exact BIGINT
    revenue → deterministic ranks."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (li.groupBy("l_partkey")
             .agg(F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                   .alias("revenue_e4")))
    joined = rev.join(p, rev.l_partkey == p.p_partkey)
    return (top_k_per_group(joined, ["p_brand"],
                            [F.col("revenue_e4").desc(), F.col("p_partkey")], k)
            .select("p_brand", "p_partkey", "revenue_e4", "rk"))


def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation shape (reference has none — SURVEY §2.8): exact
    count-distinct per group; Catalyst expands to two-phase partial-distinct.
    At 100 TB swap in approx_count_distinct (HLL) — kept exact here for the
    oracle."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n_users"),
                  F.count(F.lit(1)).alias("n_events"))
             .orderBy("event_type"))


def two_nation_volume(spark: SparkSession, sf_dir: str,
                      nation_a: str = "NATION_1", nation_b: str = "NATION_2",
                      date_from: str = "1996-01-01",
                      date_to: str = "1998-01-01") -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.

    Supplier and customer both resolve to the 25-row nation dim (broadcast);
    the only large exchanges are lineitem⋈orders (shuffle on orderkey) and
    the supplier/customer lookups — supplier is SF-scaled but small relative
    to facts, so AQE decides its strategy from runtime stats.
    """
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey")).drop("n_nationkey")
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n.withColumnRenamed("n_name", "cust_nation")),
        F.col("c_nationkey") == F.col("n_nationkey")).drop("n_nationkey")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp")))
    pair = ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)) | \
           ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .join(s, li.l_suppkey == s.s_suppkey)
          .join(c, o.o_custkey == c.c_custkey)
          .filter(pair)
          .groupBy("supp_nation", "cust_nation",
                   F.year("l_shipdate").cast("bigint").alias("l_year"))
          .agg(F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .alias("revenue_e4"))
          .orderBy("supp_nation", "cust_nation", "l_year")
    )


def large_quantity_orders(spark: SparkSession, sf_dir: str,
                          min_quantity: float = 300.0) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a threshold.

    The HAVING subquery is a pre-aggregation of lineitem on orderkey — done
    FIRST so the expensive 3-way join runs only on qualifying orders (a
    semi-join reduction; at 100 TB the qualifying set is a tiny fraction).
    Quantities are ×100 fixed-point so the filter and sums hash exactly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = (li.groupBy("l_orderkey")
             .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
                   .alias("total_qty_e2"))
             .filter(F.col("total_qty_e2") > int(min_quantity * 100)))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (qty.join(o, qty.l_orderkey == o.o_orderkey)
               .join(c, o.o_custkey == c.c_custkey)
               .select("c_name", "c_custkey", "l_orderkey",
                       F.unix_millis(F.col("o_orderdate").cast("timestamp"))
                        .alias("o_orderdate_ms"),
                       F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
                       "total_qty_e2")
               .orderBy(F.col("o_totalprice").desc(), "o_orderdate_ms",
                        "l_orderkey")
               .limit(100))


def order_priority_check(spark: SparkSession, sf_dir: str,
                         date_from: str = "1996-01-01",
                         date_to: str = "1996-07-01") -> DataFrame:
    """TPC-H Q4 shape: orders (in a date window) having at least one
    late-shipped line, counted per priority. (The fixture lacks
    l_commitdate/l_receiptdate, so "late" = shipped after order date +30d —
    same EXISTS shape as spec Q4.)

    The EXISTS is a LEFT SEMI join: lineitem never duplicates orders, the
    join carries the orderkey equality (shuffle key) with the date
    comparison as a residual condition, and the per-priority count
    aggregates the already-deduplicated semi-join output.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # INTERVAL keeps the timestamp (date_add would truncate time-of-day and
    # silently diverge from the oracle's `+ INTERVAL 30 DAY` on intraday data)
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & \
           (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    return (o.join(li, late, "left_semi")
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("order_count"))
             .orderBy("o_orderpriority"))


def promo_revenue(spark: SparkSession, sf_dir: str,
                  date_from: str = "1996-01-01",
                  date_to: str = "1996-02-01") -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO parts in one month.

    lineitem is filtered at the scan (one month — partition pruning at
    scale); the part join shuffles on partkey with AQE free to broadcast at
    small SF. Numerator and denominator are exact e4 BIGINTs; one double
    division at the end, rounded.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp")))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = _e4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (li.join(p, li.l_partkey == p.p_partkey)
              .agg(F.sum(F.when(F.col("p_type") == "PROMO", disc)
                          .otherwise(F.lit(0).cast("bigint")))
                    .alias("promo_e4"),
                   F.sum(disc).alias("total_e4"))
              .select("promo_e4", "total_e4",
                      F.round(F.lit(100.0) * F.col("promo_e4")
                              / F.col("total_e4"), 6).alias("promo_pct")))


def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR-ed brand/size/quantity
    band predicates. The partkey equi-join is factored out of the
    disjunction (Catalyst keeps it as the join key; the OR becomes a
    residual filter), so the plan is one shuffle join + filter — not a
    union of three scans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10))
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15))
           & qty.between(20, 30)))
    return (li.join(p, li.l_partkey == p.p_partkey)
              .filter(band)
              .agg(F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                    .alias("revenue_e4"),
                   F.count(F.lit(1)).cast("bigint").alias("n_lines")))


def forecast_revenue(spark: SparkSession, sf_dir: str,
                     date_from: str = "1996-01-01",
                     date_to: str = "1997-01-01",
                     discount: float = 0.06, max_qty: float = 24.0) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum, zero joins, zero wide shuffles.
    Every predicate reaches the parquet scan (PushedFilters); the single
    aggregate is a map-side partial + one-row final — the minimal plan and
    the pushdown litmus test."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
                      & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
                      # round to 2 dp so the bounds are the same doubles the
                      # oracle's plain literals (0.05/0.07) parse to
                      & (F.col("l_discount") >= round(discount - 0.01, 2))
                      & (F.col("l_discount") <= round(discount + 0.01, 2))
                      & (F.col("l_quantity") < max_qty))
              .agg(F.sum(_e4(F.col("l_extendedprice") * F.col("l_discount")))
                    .alias("revenue_e4"),
                   F.count(F.lit(1)).cast("bigint").alias("n_lines")))


def returned_item_revenue(spark: SparkSession, sf_dir: str,
                          date_from: str = "1996-01-01",
                          date_to: str = "1996-04-01", k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in one
    quarter, top-k. Orders are date-filtered at the scan, lineitem keeps
    only returns; the lineitem⋈orders shuffle carries only qualifying rows
    and the customer lookup joins the already-aggregated per-customer rows
    (dimension joined AFTER the heavy aggregation, not before)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name",
                                                     "c_nationkey")
    rev = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_custkey")
             .agg(F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                   .alias("revenue_e4")))
    return (rev.join(c, rev.o_custkey == c.c_custkey)
               .select("c_custkey", "c_name",
                       F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
                       "revenue_e4")
               .orderBy(F.col("revenue_e4").desc(), "c_custkey")
               .limit(k))


def idle_rich_customers(spark: SparkSession, sf_dir: str,
                        since: str = "2000-01-01") -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with NO order since
    ``since`` (dormant high-value accounts), summarized per nation.

    The NOT EXISTS is a LEFT ANTI join (the third join family after inner
    and semi). The global-average comparison is exact integer arithmetic —
    ``bal_e4 * n > total_e4`` — so no float-averaging order dependence can
    flip a boundary customer between engines. The 1-row stats aggregate
    broadcasts; orders is the only big side and arrives date-filtered and
    pre-projected to its join key.
    """
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
         .select("o_custkey"))
    pos = (c.filter(F.col("c_acctbal") > 0)
            .select("c_custkey", "c_nationkey",
                    _e4(F.col("c_acctbal")).alias("bal_e4"))
            # Materialize ONCE: the stats aggregate and the rich filter both
            # consume this slice with different prunings (no exchange reuse)
            # — otherwise customer is scanned twice.
            .localCheckpoint(eager=True))
    stats = pos.agg(F.sum("bal_e4").alias("total_e4"),
                    F.count(F.lit(1)).alias("n"))
    rich = (pos.crossJoin(F.broadcast(stats))
               .filter(F.col("bal_e4") * F.col("n") > F.col("total_e4")))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (idle.groupBy(F.col("c_nationkey").cast("bigint").alias("c_nationkey"))
                .agg(F.count(F.lit(1)).alias("n_custs"),
                     F.sum("bal_e4").alias("total_bal_e4"))
                .orderBy("c_nationkey"))


def nation_market_share(spark: SparkSession, sf_dir: str,
                        region: str = "ASIA", nation: str = "NATION_2",
                        ptype: str = "ECONOMY",
                        date_from: str = "1995-01-01",
                        date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue for one part
    type, by order year.

    The share is a conditional-sum ratio inside a single aggregate — no
    second pass over the join. Part is filtered before its join (AQE
    broadcasts the type-selected slice while it fits, shuffles at scale); customer resolves region membership through
    the 25-row nation dim (broadcast twice under different aliases — the
    classic Q8 double-nation lookup); lineitem⋈orders stays the only large
    exchange. Revenue is fixed-point e4 so the share numerator/denominator
    are exact integers.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    cust_nations = (n.join(F.broadcast(r),
                           n.n_regionkey == r.r_regionkey)
                     .select(F.col("n_nationkey").alias("cn_key")))
    supp_nations = n.select(F.col("n_nationkey").alias("sn_key"),
                            F.col("n_name").alias("supp_nation"))
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_type") == ptype).select("p_partkey"))
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(supp_nations), F.col("s_nationkey") == F.col("sn_key"))
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_key"))
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    rev = _e4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
          .join(o, li.l_orderkey == o.o_orderkey)
          .join(c, o.o_custkey == c.c_custkey)
          .join(s, li.l_suppkey == s.s_suppkey)
          .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
          .agg(F.sum(F.when(F.col("supp_nation") == nation, rev)
                      .otherwise(F.lit(0))).alias("nation_rev_e4"),
               F.sum(rev).alias("total_rev_e4"))
          .select("o_year", "nation_rev_e4", "total_rev_e4",
                  F.round(F.col("nation_rev_e4") / F.col("total_rev_e4"), 6)
                   .alias("mkt_share"))
          .orderBy("o_year")
    )


def product_type_profit(spark: SparkSession, sf_dir: str,
                        name_like: str = "%red%") -> DataFrame:
    """TPC-H Q9 shape (no partsupp table in the corpus, so profit = revenue
    net of discount rather than net of supply cost): revenue from parts whose
    name matches, grouped by supplier nation and order year.

    Part is name-filtered (AQE broadcasts the slice while it fits, shuffles
    at 100 TB); nation broadcasts; the shuffles are
    lineitem⋈orders and the supplier lookup. Group keys arrive via dims, so
    the aggregate runs on the joined fact exactly once.
    """
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation"))
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_name").like(name_like)).select("p_partkey"))
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
          .join(o, li.l_orderkey == o.o_orderkey)
          .join(s, li.l_suppkey == s.s_suppkey)
          .groupBy("nation",
                   F.year("o_orderdate").cast("bigint").alias("o_year"))
          .agg(F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .alias("profit_e4"),
               F.count(F.lit(1)).alias("n_lines"))
          .orderBy("nation", F.col("o_year").desc())
    )


def ship_lag_priority(spark: SparkSession, sf_dir: str,
                      date_from: str = "1996-01-01",
                      date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H Q12 shape (corpus lineitem carries no shipmode/commit/receipt
    columns, so the classification axis is the ship LAG — days from order to
    ship date, bucketed): per lag band, how many lines belong to urgent
    orders vs not.

    One fact-fact shuffle (lineitem⋈orders), then a single aggregate on the
    derived band — the band expression is pure integer datediff arithmetic,
    identical in Spark and DuckDB on midnight-aligned timestamps.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp")))
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (F.when(lag < 0, "before_order")
             .when(lag <= 90, "0-90d")
             .when(lag <= 365, "91-365d")
             .otherwise("over_1y"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .groupBy(band.alias("lag_band"))
          .agg(F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint")
                .alias("high_line_count"),
               F.sum(F.when(urgent, 0).otherwise(1)).cast("bigint")
                .alias("low_line_count"))
          .orderBy("lag_band")
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str,
                                exclude_priority: str = "4-NOT SPECIFIED",
                                since: str | None = None) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many qualifying
    orders they placed — including zero (the LEFT OUTER join is the point;
    an inner join would silently drop the no-order customers).

    Two cascaded aggregations: per-customer count (shuffle on custkey), then
    the tiny distribution aggregate on the count value. The order-side
    filter sits in the join's ON clause, not a WHERE, so non-matching
    customers survive with count 0.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") != exclude_priority)
         .select("o_orderkey", "o_custkey", "o_orderdate"))
    if since is not None:
        o = o.filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
    o = o.select("o_orderkey", "o_custkey")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left_outer")
                 .groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
                    .agg(F.count(F.lit(1)).alias("custdist"))
                    .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


def top_supplier(spark: SparkSession, sf_dir: str,
                 date_from: str = "1996-01-01",
                 date_to: str = "1996-04-01") -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a quarter.

    The per-supplier revenue aggregate (one shuffle on the already
    date-pruned lineitem) is computed ONCE: the max arrives via an
    unpartitioned window over the AGGREGATED rows (8-byte key + 8-byte sum
    per supplier active in the quarter), not via a second aggregate branch —
    Spark does not reuse the aggregate's exchange across branches, so the
    broadcast-join-the-max formulation re-scans the fact table (verified in
    the plan). If supplier cardinality itself ever outgrows one partition,
    persist the aggregate and broadcast the 1-row max instead. Fixed-point
    revenue makes 'equal to max' an exact integer comparison (float revenue
    would make the tie set engine-dependent).
    """
    from pyspark.sql import Window as W
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp")))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (li.groupBy("l_suppkey")
             .agg(F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                   .alias("total_rev_e4")))
    with_max = rev.withColumn(
        "max_rev_e4", F.max("total_rev_e4").over(W.partitionBy()))
    return (with_max
            .filter(F.col("total_rev_e4") == F.col("max_rev_e4"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .select(F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
                    "s_name", "total_rev_e4")
            .orderBy("s_suppkey"))


def small_quantity_revenue(spark: SparkSession, sf_dir: str,
                           brand: str = "Brand#1") -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below half
    the average quantity for their part (one brand's parts).

    The correlated scalar subquery becomes a per-part aggregate joined back
    — computed on the brand-pruned fact slice, so the 'correlation' costs
    one extra small shuffle instead of a per-row subquery. The half-average
    comparison is exact integer cross-multiplication
    (2 * qty * n < sum_qty), immune to float-division rounding.
    """
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_brand") == brand).select("p_partkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .join(p, F.col("l_partkey") == F.col("p_partkey"))
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount"))
    per_part = (li.groupBy(F.col("l_partkey").alias("ag_partkey"))
                  .agg(F.sum(_e4(F.col("l_quantity"))).alias("sum_qty_e4"),
                       F.count(F.lit(1)).alias("n_qty")))
    return (li.join(per_part, F.col("l_partkey") == F.col("ag_partkey"))
              .filter(2 * _e4(F.col("l_quantity")) * F.col("n_qty")
                      < F.col("sum_qty_e4"))
              .agg(F.sum(_e4(F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))))
                    .alias("revenue_e4"),
                   F.count(F.lit(1)).alias("n_lines")))


def returns_cube(spark: SparkSession, sf_dir: str,
                 cutoff: str = "1998-09-02") -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping sets — per
    pair, per flag, per status, grand total — in ONE aggregate pass.

    Spark plans CUBE as a single Expand + hash aggregate (each input row
    fans out to its grouping sets map-side, partials combine as usual), so
    the cost is ~|sets| × one aggregate, never |sets| scans. ``grouping_id``
    disambiguates a real NULL key from a rolled-up one — required for the
    oracle hash, since both engines render rolled-up keys as NULL.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (l.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
             .cube("l_returnflag", "l_linestatus")
             .agg(F.grouping_id().cast("bigint").alias("gid"),
                  F.sum(_e4(F.col("l_quantity"))).alias("sum_qty_e4"),
                  F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                   .alias("sum_disc_price_e4"),
                  F.count(F.lit(1)).alias("n_lines"))
             .orderBy("gid", "l_returnflag", "l_linestatus"))


def min_cost_supplier(spark: SparkSession, sf_dir: str,
                      size: int = 15, region: str = "EUROPE") -> DataFrame:
    """TPC-H Q2 shape (no partsupp table in the corpus, so the part↔supplier
    cost relation is derived from lineitem: a supplier's cost for a part is
    its best observed unit price): for every part of the given size, the
    region's cheapest supplier(s).

    The defining pattern is the correlated scalar MIN subquery; here it is
    the window rewrite — one shuffle on p_partkey computes the per-part
    minimum and the argmin filter in the same exchange, instead of a
    self-join back onto the aggregated subquery. Unit price folds to
    fixed-point e4 per row *before* the MIN as exact tie-free integer
    arithmetic — price in cents (round of an integer-valued double, no
    tie possible on 2-decimal source data) times 100, floor-divided by
    the integer quantity — so equality at the minimum is exact integer
    comparison in both engines. The previous `round(price/qty * 1e4)`
    form landed 1676 sf0.01 rows on an exact .5 tie, where DuckDB builds
    differ in tie direction (the x_bucketed_join r6 driver red, latent
    here under the MIN). Ties keep all suppliers at
    the minimum (Q2 semantics). nation⋈region broadcasts; part/supplier
    slices join under AQE's choice (broadcast while they fit); lineitem is the only large input and arrives pre-aggregated
    per (part, supplier) before the window.
    """
    from pyspark.sql import Window as W
    n = load_table(spark, sf_dir, "nation")
    r = (load_table(spark, sf_dir, "region")
         .filter(F.col("r_name") == region))
    s = (load_table(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
         .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_size") == size)
         .select("p_partkey", "p_name", "p_type"))
    li = load_table(spark, sf_dir, "lineitem")
    unit_e4 = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT) * 100 "
                     "DIV CAST(l_quantity AS BIGINT)")
    costs = (li.join(p, F.col("l_partkey") == F.col("p_partkey"))
               .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
               .groupBy("p_partkey", "p_name", "p_type",
                        "s_suppkey", "s_name", "s_acctbal", "n_name")
               .agg(F.min(unit_e4).alias("cost_e4")))
    min_w = F.min("cost_e4").over(W.partitionBy("p_partkey"))
    return (costs.withColumn("_min", min_w)
                 .filter(F.col("cost_e4") == F.col("_min"))
                 .select("s_acctbal", "s_name", "n_name", "p_partkey",
                         "p_name", "cost_e4")
                 .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                          "p_partkey"))


def important_parts(spark: SparkSession, sf_dir: str,
                    nation: str = "NATION_1",
                    fraction_permille: int = 1) -> DataFrame:
    """TPC-H Q11 shape (lineitem value in place of partsupp stock value):
    parts whose revenue through one nation's suppliers exceeds a fixed
    fraction of that nation's total.

    The defining pattern is HAVING-against-a-global-scalar: the same
    aggregate feeds both sides, the grand total collapses to one row and
    broadcasts, and the threshold test is exact integer cross-multiplication
    (val_e4 * 1000 > total_e4 * permille) — no float fraction to disagree
    on at the boundary. One shuffle for the per-part aggregate; the total
    derives from it without rescanning lineitem.
    """
    n = (load_table(spark, sf_dir, "nation")
         .filter(F.col("n_name") == nation))
    s = (load_table(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey"))
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
                  .groupBy("l_partkey")
                  .agg(F.sum(_e4(F.col("l_extendedprice"))).alias("val_e4"))
                  # Materialize ONCE: the HAVING branch and the grand-total
                  # branch both consume this aggregate, but column pruning
                  # makes their subtrees differ so Spark cannot reuse the
                  # exchange — without this, lineitem is scanned twice.
                  # The per-part table is parts-sized, not lineitem-sized.
                  .localCheckpoint(eager=True))
    total = per_part.agg(F.sum("val_e4").alias("total_e4"))
    return (per_part.crossJoin(F.broadcast(total))
                    .filter(F.col("val_e4") * 1000
                            > F.col("total_e4") * fraction_permille)
                    .select("l_partkey", "val_e4")
                    .orderBy(F.col("val_e4").desc(), "l_partkey"))


def supplier_part_counts(spark: SparkSession, sf_dir: str,
                         excl_brand: str = "Brand#1",
                         sizes: tuple = (1, 15, 22, 30, 49)) -> DataFrame:
    """TPC-H Q16 shape (lineitem as the part↔supplier relation; suppliers
    with negative balance stand in for the complaints exclusion): distinct
    supplier count per (brand, type, size) outside one brand.

    The defining pattern is NOT IN → LEFT ANTI join (the exclusion list is
    a supplier slice — AQE broadcasts it while it fits) feeding a
    COUNT(DISTINCT). The distinct is planned
    as Spark's two-phase expand aggregate: partial distinct on
    (brand,type,size,suppkey) map-side, exact count final — no row set ever
    collects to one node. The part slice joins under AQE's choice;
    lineitem is the only large side.
    """
    bad = (load_table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    p = (load_table(spark, sf_dir, "part")
         .filter((F.col("p_brand") != excl_brand)
                 & F.col("p_size").isin(*sizes))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    li = load_table(spark, sf_dir, "lineitem")
    return (li.join(p, F.col("l_partkey") == F.col("p_partkey"))
              .join(bad, F.col("l_suppkey") == F.col("s_suppkey"),
                    "left_anti")
              .groupBy("p_brand", "p_type",
                       F.col("p_size").cast("bigint").alias("p_size"))
              .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
              .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                       "p_size"))


def prolific_suppliers(spark: SparkSession, sf_dir: str,
                       name_like: str = "%red%",
                       year_from: str = "1997-01-01",
                       year_to: str = "1998-01-01",
                       min_qty: int = 40) -> DataFrame:
    """TPC-H Q20 shape (shipped quantity in place of available stock):
    suppliers that moved more than ``min_qty`` units of any name-matched
    part inside one year.

    The defining pattern is the nested semi-join chain: part-name filter →
    per-(supplier, part) quantity aggregate → HAVING → LEFT SEMI into
    supplier. The semi join deduplicates supplier keys inside the join
    (no distinct pass) and nothing from the big side survives past it.
    Quantity threshold is exact fixed-point (sum_qty_e4 > min_qty*1e4).
    """
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_name").like(name_like)).select("p_partkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(year_from).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(year_to).cast("timestamp"))))
    movers = (li.join(p, F.col("l_partkey") == F.col("p_partkey"))
                .groupBy("l_suppkey", "l_partkey")
                .agg(F.sum(_e4(F.col("l_quantity"))).alias("qty_e4"))
                .filter(F.col("qty_e4") > min_qty * 10_000)
                .select("l_suppkey"))
    n = load_table(spark, sf_dir, "nation")
    s = (load_table(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")))
    return (s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
             .select("s_suppkey", "s_name", "n_name")
             .orderBy("s_suppkey"))


def waiting_orders(spark: SparkSession, sf_dir: str,
                   late_days: int = 90, k: int = 100) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped more than ``late_days`` after the
    order date, standing in for receipt-past-commit): suppliers who were
    the SOLE late supplier on a finalized multi-supplier order.

    The reference pattern is EXISTS (another supplier on the order) plus
    NOT EXISTS (another LATE supplier); here both collapse into per-order
    window aggregates over the (order, supplier) late flags — n_supp and
    n_late computed in the flags' own partitioning, no self-join back, no
    per-order side table: qualify when late ∧ n_supp ≥ 2 ∧ n_late = 1.
    Three narrow shuffles total (flags composite key, window on order key,
    final supplier rollup) replace two correlated self-joins over lineitem
    — the 100 TB shape. The oracle states the EXISTS/NOT EXISTS form
    directly, proving the rewrite equivalent. Top-k via
    TakeOrderedAndProject (no global sort).
    """
    from pyspark.sql import Window as W
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {int(late_days)} DAYS")
    flags = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
               .groupBy("l_orderkey", "l_suppkey")
               .agg(F.max(late.cast("int")).alias("late")))
    w = W.partitionBy("l_orderkey")
    sole = (flags.withColumn("n_supp", F.count(F.lit(1)).over(w))
                 .withColumn("n_late", F.sum("late").over(w))
                 .filter((F.col("late") == 1) & (F.col("n_supp") >= 2)
                         & (F.col("n_late") == 1)))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (sole.groupBy("l_suppkey")
                .agg(F.count(F.lit(1)).alias("numwait"))
                .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
                .select("s_name", "numwait")
                .orderBy(F.col("numwait").desc(), "s_name")
                .limit(k))
