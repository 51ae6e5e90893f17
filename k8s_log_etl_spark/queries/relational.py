"""Relational query surface over the TPC-H-ish star schema (SURVEY.md
§2b/§2c): joins (broadcast / sort-merge / semi / anti / as-of / range),
the aggregation matrix (distinct, rollup, cube, grouping_id), window
functions (ranking, running frames, lag), sort/limit/top-k, and set
operations. The reference implements none of these (SURVEY.md §2b) —
this module is the §2c extension surface, all pure built-in DataFrame
ops so Catalyst owns join strategy, pushdown, and partial aggregation.

Determinism contract with the DuckDB oracle: money sums are computed in
DECIMAL (exact, order-insensitive; double sums differ in ulps between
engines), averages as round(decimal_sum/count, 6), and every LIMIT is
fully tie-broken by a unique key.

Scale notes (100 TB): dimension joins (region/nation/customer) are
broadcast; fact-fact joins shuffle on their keys with AQE handling skew;
windows partition by high-cardinality keys (custkey/user_id) so state
per partition stays small; the as-of join is the union+window linear
pattern (no range explosion); the range join pre-bins time to turn an
inequality join into an equi-join plus residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k8s_log_etl_spark.functions import xengine as X
from k8s_log_etl_spark.functions.textops import ngram_indices
from k8s_log_etl_spark.plans.registry import register
from k8s_log_etl_spark.tables import (
    ensure_min_parallelism,
    load_table,
    spill_checkpoint,
)


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# aggregations
# ---------------------------------------------------------------------------

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_SQL, tags=("agg",), bench=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: single-pass grouped aggregation
    with partial (map-side) aggregation; DECIMAL money math for
    cross-engine exactness, cast to double only at the output boundary
    (the driver canonicalizes through pandas, where Spark Decimals and
    DuckDB float64 render differently: '256.00' vs '256.0')."""
    l = load_table(spark, sf_dir, "lineitem")
    disc = _dec("l_discount")
    price = _dec("l_extendedprice")
    # ensure_min_parallelism AFTER the pushed-down filter (round-13,
    # guide §2.5 input skew): the driver parquet is one row-group, so
    # scan + partial DECIMAL aggregation otherwise run on ONE core —
    # the whole head was measured scan-task-bound. A no-op at
    # production scale (splits >> cores); DECIMAL sums are exact and
    # order-insensitive, so redistribution cannot change results.
    return (
        ensure_min_parallelism(
            l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")),
            spark,
            "l_orderkey",
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + _dec("l_tax"))).cast("double").alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(disc).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_ROLLUP_SQL = """
SELECT year(o_orderdate) AS order_year, o_orderpriority,
       GROUPING(year(o_orderdate), o_orderpriority) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
"""


@register("agg_rollup_orders", oracle=_ROLLUP_SQL, tags=("agg",))
def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP with grouping_id — subtotals per year and
    grand total in one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate"))
        .rollup("order_year", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .select("order_year", "o_orderpriority", "gid", "n_orders", "total_price")
    )


_CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority, o_orderstatus) AS gid,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@register("agg_cube_orders", oracle=_CUBE_SQL, tags=("agg",))
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over two low-cardinality dimensions."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n_orders")
    )


_DISTINCT_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(DISTINCT o_custkey), 6) AS price_per_customer
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_distinct_customers", oracle=_DISTINCT_SQL, tags=("agg",))
def agg_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate mixed with plain aggregates (expand-based
    two-phase plan under the hood)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(_dec("o_totalprice")).cast("double") / F.countDistinct("o_custkey"), 6
        ).alias("price_per_customer"),
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

_Q3_SQL = """
SELECT l.l_orderkey AS orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o.o_orderdate AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


@register("q3_top_unshipped", oracle=_Q3_SQL, tags=("join",), bench=True)
def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped join+agg+top-k: customer (segment-filtered) ⋈
    orders ⋈ lineitem, grouped revenue, deterministic top 10 (DECIMAL
    revenue ties broken by orderkey). TakeOrderedAndProject avoids a
    global sort. The customer side is a constant fraction of a
    scale-proportional table, so it carries no forced broadcast hint —
    AQE broadcasts it only when the runtime size fits."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
        .select("orderkey", F.col("revenue").cast("double").alias("revenue"), "orderdate")
    )


_Q5_SQL = """
SELECT n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@register("q5_regional_revenue", oracle=_Q5_SQL, tags=("join",), bench=True)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join onto the fact-fact lineitem⋈orders
    shuffle join: nation/region (fixed 25/5 rows) are force-broadcast;
    customer and supplier are scale-proportional so they carry no
    forced hint — AQE picks broadcast at small SF and a keyed shuffle
    join when they outgrow the threshold."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double").alias("revenue"))
    )


_Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
  AND CAST(l_quantity AS DECIMAL(18,2)) < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_SQL, tags=("agg",))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecasting-revenue-change: one scan, three
    pushed-down predicates, one scalar DECIMAL aggregate — the
    pure-pushdown shape whose entire cost at 100 TB is how much of the
    scan the predicates (and their parquet min/max stats) eliminate.
    Discount compared in DECIMAL so the 0.05/0.07 bounds are exact
    (a double literal comparison can flip rows sitting exactly on the
    boundary). Completes the TPC-H shape coverage expressible over the
    provided 8-table subset (q2/q9/q11/q16/q20 need partsupp, which
    the driver fixtures do not include)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & _dec("l_discount").between(
                F.lit("0.05").cast("decimal(18,2)"), F.lit("0.07").cast("decimal(18,2)")
            )
            & (_dec("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


@register("join_semi_customers", oracle=_SEMI_SQL, tags=("join",))
def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one urgent order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("join_anti_customers", oracle=_ANTI_SQL, tags=("join",))
def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all. Oracle uses
    NOT EXISTS (not NOT IN) for NULL-safe anti-join semantics matching
    left_anti."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_HAVING_SQL = """
SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey, s.total_qty
FROM orders o
JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250) s
  ON o.o_orderkey = s.l_orderkey
"""


@register("having_large_orders", oracle=_HAVING_SQL, tags=("join", "agg"))
def having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped HAVING + join-back: aggregate first (shrinks the
    fact table ~100×), then join the survivors to orders."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

_WTOPK_SQL = """
SELECT * FROM (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


@register("window_topk_per_customer", oracle=_WTOPK_SQL, tags=("window",), bench=True)
def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders by price per customer (rank ties
    broken by orderkey). Catalyst turns rn<=3 into a WindowGroupLimit
    push-down, so no full per-partition sort materializes."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            "rn",
        )
    )


_WRUN_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


@register("window_running_total", oracle=_WRUN_SQL, tags=("window",))
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame: per-customer running spend (DECIMAL-exact,
    deterministic ordering by date then key)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


_WLAG_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS days_since_prev
FROM orders
"""


@register("window_lag_gap", oracle=_WLAG_SQL, tags=("window",))
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days since the customer's previous order (NULL for the
    first)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# sort / limit / set ops
# ---------------------------------------------------------------------------

_TOPK_SQL = """
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice, o_orderdate AS orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


@register("topk_global_orders", oracle=_TOPK_SQL, tags=("sort",))
def topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject
    (per-partition heaps + driver merge), never a full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderdate").alias("orderdate"),
        )
    )


_SETOPS_SQL = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT 'both' AS tag, o_custkey AS custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT 'only_1995' AS tag, o_custkey AS custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
UNION ALL
SELECT 'only_1996' AS tag, o_custkey AS custkey FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
"""


@register("set_ops_customers", oracle=_SETOPS_SQL, tags=("setop",))
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one query: 1995-vs-1996 customer
    cohorts."""
    o = load_table(spark, sf_dir, "orders")

    def cohort(year: int) -> DataFrame:
        return o.filter(F.year("o_orderdate") == year).select("o_custkey").distinct()

    y95, y96 = cohort(1995), cohort(1996)
    both = y95.intersect(y96).select(F.lit("both").alias("tag"), F.col("o_custkey"))
    only95 = y95.exceptAll(y96).select(F.lit("only_1995").alias("tag"), F.col("o_custkey"))
    only96 = y96.exceptAll(y95).select(F.lit("only_1996").alias("tag"), F.col("o_custkey"))
    return both.unionAll(only95).unionAll(only96).withColumnRenamed("o_custkey", "custkey")


# ---------------------------------------------------------------------------
# skew-resilient join (salting) — charter scale technique, driver-checked
# ---------------------------------------------------------------------------

_SALTED_SQL = """
SELECT n_name AS nation, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("join_skew_salted", oracle=_SALTED_SQL, tags=("join", "scale"))
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation order tallies computed through an EXPLICITLY SALTED
    fact⋈dim join (functions.skew.salted_join): the orders side gets a
    random salt in [0, 8), the customer side is exploded 8× with every
    salt, and the join key becomes (custkey, salt) — a hot customer's
    rows spread across 8 shuffle partitions instead of serializing one
    straggler task. Row multiplicity is unchanged, so the result is
    EXACTLY the plain join (the oracle is the unsalted SQL — the
    driver's hash check is the equivalence proof, which is the whole
    point of registering the technique as a query).

    At 100 TB this is the manual fallback when AQE's skew-join split
    can't help (e.g. a skewed key feeding an aggregation, or a
    non-sort-merge plan); the 8× dim duplication is the price, which
    is why the exploded side must be the bounded one. The salt uses a
    fixed seed so reruns are deterministic; correctness never depends
    on WHICH salt a row draws, only on the (key, salt) equi-match."""
    from k8s_log_etl_spark.functions.skew import salted_join

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        salted_join(o, c, "o_custkey", salt=8)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# temporal joins (as-of, range) — §2c custom operators
# ---------------------------------------------------------------------------

_ASOF_SQL = """
SELECT e.event_id AS error_id, e.user_id AS user_id, p.event_id AS last_purchase_id
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


@register("join_asof_last_purchase", oracle=_ASOF_SQL, tags=("join", "temporal"), bench=True)
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no native Spark operator): for each error event, the
    same user's most recent purchase at or before it.

    Implemented as the union+window linear scan: tag both sides, union,
    then last_value(purchase_id) IGNORE NULLS over (user, ts) ordering
    with purchases sorted before errors at equal ts (>= semantics).
    One shuffle on user_id, state = one value per partition row — scales
    linearly where a range join would explode. Tie contract: equal
    purchase timestamps resolve to the larger event_id (DuckDB ASOF
    picks one row arbitrarily; the synthetic data has no exact ties).
    """
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id"), F.lit(None).cast("long").alias("purchase_id")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("error_id"), F.col("event_id").alias("purchase_id")
    )
    unioned = err.unionByName(pur)
    # side 0 = purchase first at equal ts (>= semantics); event_id breaks
    # exact-ts ties among purchases deterministically.
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts"),
            F.when(F.col("purchase_id").isNotNull(), 0).otherwise(1),
            F.coalesce("purchase_id", F.lit(-1)),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_purchase_id", F.last("purchase_id", ignorenulls=True).over(w))
        .filter(F.col("error_id").isNotNull())
        .select("error_id", "user_id", "last_purchase_id")
    )


_RANGE_SQL = """
SELECT p.event_id AS purchase_id,
       count(e.event_id) AS errors_next_hour
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
GROUP BY p.event_id
"""


@register("join_range_binned", oracle=_RANGE_SQL, tags=("join", "temporal"))
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join via time binning: errors within 1 hour after
    each purchase, per user.

    A naive inequality join is a per-user cross product; binning ts to
    the 1-hour range width turns it into an equi-join on
    (user_id, hour_bin) — each purchase probes exactly two bins — with
    the precise range predicate as a residual filter. Scales as an
    ordinary shuffle join keyed by (user, bin).
    """
    ev = load_table(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.floor(F.unix_timestamp("ts") / 3600).alias("bin"),
    )
    # Each purchase probes its own bin and the next one.
    pur2 = pur.withColumn(
        "bin", F.explode(F.array(F.floor(F.unix_timestamp("p_ts") / 3600),
                                 F.floor(F.unix_timestamp("p_ts") / 3600) + 1))
    )
    joined = pur2.join(
        err,
        (pur2.user_id == err.e_user)
        & (pur2.bin == err.bin)
        & (err.e_ts >= pur2.p_ts)
        & (err.e_ts < pur2.p_ts + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(F.count("err_id").alias("errors_next_hour"))


_GSETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority, o_orderstatus) AS gid,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


@register("agg_grouping_sets", oracle=_GSETS_SQL, tags=("agg",))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under rollup/cube):
    per-priority, per-status, and grand-total groups in one Expand +
    shuffle."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               grouping_id(o_orderpriority, o_orderstatus) AS gid,
               count(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


_EV_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type, ts FROM events
"""


@register("dedup_events_exact", oracle=_EV_DEDUP_SQL, tags=("dedup",))
def dedup_events_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact event dedup via dropDuplicates on the identity key
    (user_id, event_type, ts) — one hash-aggregate shuffle on the key;
    output restricted to the key columns so results are deterministic
    (dropDuplicates keeps an arbitrary survivor's other columns)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.dropDuplicates(["user_id", "event_type", "ts"]).select(
        "user_id", "event_type", "ts"
    )


@register("agg_approx_events", tags=("agg", "approx"))
def agg_approx_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (absent from the reference, SURVEY §2b):
    HLL++ distinct users and t-digest-style percentiles of value per
    event type. No DuckDB oracle — sketch internals are engine-specific
    (driver records the weaker rows-only check); tests/test_approx.py
    bounds the estimates against exact answers instead."""
    ev = load_table(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    # Scalar output columns only: the driver's pandas canonicalizer
    # cannot hash array cells (round-1 harness error).
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        pcts.getItem(0).alias("value_p50"),
        pcts.getItem(1).alias("value_p95"),
        pcts.getItem(2).alias("value_p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


_PIVOT_SQL = """
SELECT year(o_orderdate) AS order_year,
       count(*) FILTER (o_orderstatus = 'O') AS status_o,
       count(*) FILTER (o_orderstatus = 'F') AS status_f,
       count(*) FILTER (o_orderstatus = 'P') AS status_p
FROM orders GROUP BY 1
"""


@register("pivot_status_by_year", oracle=_PIVOT_SQL, tags=("agg",))
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per status spread into columns, one row per
    year. Explicit value list so the plan is a single aggregate (an
    unlisted pivot needs an extra distinct-values job first)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "order_year",
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


_UNPIVOT_SQL = """
SELECT o_orderkey AS orderkey, metric, val FROM (
  SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
) WHERE orderkey < 100
"""


@register("unpivot_order_metrics", oracle=_UNPIVOT_SQL, tags=("agg",))
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide order columns to (key, metric, value) rows —
    a narrow Expand, no shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.unpivot(
        ids=[F.col("o_orderkey").alias("orderkey")],
        values=[
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        ],
        variableColumnName="metric",
        valueColumnName="val",
    )


_STATS_SQL = """
SELECT event_type,
       round(stddev_samp(value), 6) AS sd_value,
       round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_value_user,
       round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_value_user,
       round(quantile_cont(value, 0.5), 6) AS median_value
FROM events GROUP BY event_type
"""


@register("agg_stats_events", oracle=_STATS_SQL, tags=("agg",))
def agg_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev, correlation, covariance, exact
    interpolated median — single shuffle, all JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.corr(F.col("value"), u), 6).alias("corr_value_user"),
        F.round(F.covar_samp(F.col("value"), u), 6).alias("covar_value_user"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
    )


_FULL_OUTER_SQL = """
WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
           FROM customer GROUP BY 1),
s AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      FROM supplier GROUP BY 1)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


@register("join_full_outer_nations", oracle=_FULL_OUTER_SQL, tags=("join",))
def join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join on pre-aggregated sides (customers vs suppliers
    per nation) — completes the join-type matrix (inner / semi / anti /
    left / full / cross all covered)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    j = c.join(s, c.nationkey == s.s_nationkey, "full_outer")
    return j.select(
        F.coalesce("nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# DuckDB min_by/max_by take scalar ordering keys only, so ties are
# broken through lexicographically-sortable string composites that
# order exactly like Spark's (value, orderkey) structs.
_DATE_KEY_SQL = "strftime(o_orderdate, '%Y%m%d%H%M%S') || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')"
_PRICE_KEY_SQL = "printf('%018.2f', o_totalprice) || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')"

_MINMAXBY_SQL = f"""
SELECT o_custkey AS custkey,
       min_by(o_orderkey, {_DATE_KEY_SQL}) AS first_orderkey,
       max_by(o_orderkey, {_DATE_KEY_SQL}) AS last_orderkey,
       max_by(o_orderkey, {_PRICE_KEY_SQL}) AS priciest_orderkey
FROM orders
WHERE o_custkey < 100
GROUP BY o_custkey
"""


@register("agg_minmax_by", oracle=_MINMAXBY_SQL, tags=("agg",))
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by argmin-argmax aggregates: first/last/priciest order
    per customer. Ties on the ordering value are broken by composing an
    artificial (value, key) struct so both engines pick the same row."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    date_key = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    price_key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min_by("o_orderkey", date_key).alias("first_orderkey"),
        F.max_by("o_orderkey", date_key).alias("last_orderkey"),
        F.max_by("o_orderkey", price_key).alias("priciest_orderkey"),
    )


_Q13_SQL = """
SELECT n_orders, count(*) AS n_customers FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY n_orders
"""


@register("q13_order_distribution", oracle=_Q13_SQL, tags=("join", "agg"))
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: LEFT join with an extra join predicate, count
    per customer (zero-order customers kept), then the distribution of
    those counts — two shuffles, the second over tiny data."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


_NOT_EXISTS_SQL = """
SELECT c.c_custkey AS custkey, c.c_name AS name
FROM customer c
WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995
      )
  AND EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1996
      )
"""


@register("correlated_not_exists", oracle=_NOT_EXISTS_SQL, tags=("join", "subquery"))
def correlated_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subqueries (customers who skipped
    1995 but ordered in 1996), written in Spark SQL so Catalyst's
    subquery decorrelation rewrites them into semi/anti joins."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey, c.c_name AS name
        FROM customer_sq c
        WHERE NOT EXISTS (
                SELECT 1 FROM orders_sq o
                WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995
              )
          AND EXISTS (
                SELECT 1 FROM orders_sq o
                WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1996
              )
        """
    )


_SCALAR_SUBQ_SQL = """
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
FROM orders
WHERE o_totalprice > 3 * (SELECT avg(o_totalprice) FROM orders)
"""


@register("scalar_subquery_outliers", oracle=_SCALAR_SUBQ_SQL, tags=("subquery",))
def scalar_subquery_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above 3x the global average
    price (the subquery executes once and broadcasts as a literal).
    Double comparison only — no cross-engine float arithmetic lands in
    the output."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ss")
    return spark.sql(
        """
        SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
        FROM orders_ss
        WHERE o_totalprice > 3 * (SELECT avg(o_totalprice) FROM orders_ss)
        """
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (ntile quartiles over per-customer metrics)
# ---------------------------------------------------------------------------

_RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS monetary
  FROM orders GROUP BY o_custkey
),
anchor AS (SELECT max(o_orderdate) AS max_date FROM orders),
metrics AS (
  SELECT o_custkey, frequency, monetary,
         date_diff('day', last_order, max_date) AS recency_days
  FROM per_cust, anchor
),
cuts AS (
  SELECT quantile_cont(recency_days, 0.25) AS r25,
         quantile_cont(recency_days, 0.50) AS r50,
         quantile_cont(recency_days, 0.75) AS r75,
         quantile_cont(frequency, 0.25) AS f25,
         quantile_cont(frequency, 0.50) AS f50,
         quantile_cont(frequency, 0.75) AS f75,
         quantile_cont(monetary, 0.25) AS m25,
         quantile_cont(monetary, 0.50) AS m50,
         quantile_cont(monetary, 0.75) AS m75
  FROM metrics
),
scored AS (
  SELECT s.monetary, s.recency_days,
         1 + CAST(s.recency_days > c.r25 AS INT)
           + CAST(s.recency_days > c.r50 AS INT)
           + CAST(s.recency_days > c.r75 AS INT) AS r,
         1 + CAST(s.frequency < c.f75 AS INT)
           + CAST(s.frequency < c.f50 AS INT)
           + CAST(s.frequency < c.f25 AS INT) AS f,
         1 + CAST(s.monetary < c.m75 AS INT)
           + CAST(s.monetary < c.m50 AS INT)
           + CAST(s.monetary < c.m25 AS INT) AS m
  FROM metrics s, cuts c
)
SELECT concat(CAST(r AS VARCHAR), CAST(f AS VARCHAR), CAST(m AS VARCHAR)) AS segment,
       count(*) AS n_customers,
       round(avg(monetary), 6) AS avg_monetary,
       round(avg(recency_days), 6) AS avg_recency_days
FROM scored GROUP BY 1
"""


def _quartile_asc(metric: str, cuts: tuple[str, str, str]):
    """1..4 bucket by exact quartile cut-points, ascending (low metric →
    bucket 1). Equal-to-cut values fold down, so ties share a bucket —
    the cut-point semantics both engines compute identically."""
    c25, c50, c75 = cuts
    return (
        F.lit(1)
        + (F.col(metric) > F.col(c25)).cast("int")
        + (F.col(metric) > F.col(c50)).cast("int")
        + (F.col(metric) > F.col(c75)).cast("int")
    )


def _quartile_desc(metric: str, cuts: tuple[str, str, str]):
    """1..4 bucket, descending (high metric → bucket 1)."""
    c25, c50, c75 = cuts
    return (
        F.lit(1)
        + (F.col(metric) < F.col(c75)).cast("int")
        + (F.col(metric) < F.col(c50)).cast("int")
        + (F.col(metric) < F.col(c25)).cast("int")
    )


@register("rfm_segments", oracle=_RFM_SQL, tags=("relational",), bench=True)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation via quartile CUT-POINTS, not ntile: per-customer
    recency/frequency/monetary metrics, one tiny 9-value exact-percentile
    aggregate (Spark `percentile` ≡ DuckDB `quantile_cont`, same
    linear-interpolation definition, so cut-points agree bit-for-bit),
    broadcast back and scored with map-side comparisons, then rolled up
    per composite segment. NO global window sort anywhere — the earlier
    ntile draft planned three single-partition total orders over all
    customers, a one-task bottleneck at scale; cut-point scoring is a
    broadcast + narrow projection. Exact `percentile` partial-aggregates
    map-side over distinct values; at extreme cardinality swap it for
    `percentile_approx` (same call shape, mergeable sketch, bounded
    memory) and accept approximate boundaries. Monetary sums in DECIMAL,
    cast double and rounded at the boundary; interpolated cut-points
    land strictly between adjacent order statistics, so comparisons
    cannot flip on engine-rounding differences."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice").cast("double"), 2).alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("max_date"))
    metrics = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        "frequency",
        "monetary",
        F.datediff(F.col("max_date"), F.col("last_order")).alias("recency_days"),
    )
    cuts = metrics.agg(
        *[
            F.percentile(F.col(col), F.lit(q)).alias(f"{pre}{int(q * 100)}")
            for col, pre in (("recency_days", "r"), ("frequency", "f"), ("monetary", "m"))
            for q in (0.25, 0.50, 0.75)
        ]
    )
    scored = metrics.crossJoin(F.broadcast(cuts)).select(
        "monetary",
        "recency_days",
        _quartile_asc("recency_days", ("r25", "r50", "r75")).alias("r"),
        _quartile_desc("frequency", ("f25", "f50", "f75")).alias("f"),
        _quartile_desc("monetary", ("m25", "m50", "m75")).alias("m"),
    )
    seg = F.concat(
        F.col("r").cast("string"), F.col("f").cast("string"), F.col("m").cast("string")
    )
    return scored.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("monetary"), 6).alias("avg_monetary"),
        F.round(F.avg("recency_days"), 6).alias("avg_recency_days"),
    )


# ---------------------------------------------------------------------------
# multi-join volume shipping (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


@register("q7_volume_shipping", oracle=_Q7_SQL, tags=("join", "agg"), bench=True)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: lineitem→orders→customer
    and lineitem→supplier, each side resolved to its nation, revenue per
    (supplier nation, customer nation, ship year) for cross-nation
    flows. The canonical many-join shape: the lineitem↔orders fact-fact
    join shuffles on orderkey (AQE splits skew); supplier, customer, and
    both nation legs are broadcast dims; the date filter is pushed to
    the scan so only two ship-years are read. DECIMAL revenue for
    cross-engine exactness."""
    # ensure_min_parallelism after the pushed-down 2-year filter: the
    # one-row-group driver parquet otherwise runs scan + the fact-fact
    # join's map side on ONE core (same rationale as q1; no-op at
    # production scale, DECIMAL agg order-insensitive).
    l = ensure_min_parallelism(
        load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        ),
        spark,
        "l_orderkey",
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("s_nk") != F.col("c_nk"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(revenue.cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# returned-items customer ranking (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_SQL, tags=("join", "agg", "topk"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped lost-revenue ranking: customers who returned
    items in one quarter, ranked by returned revenue, top 20. Both
    selective predicates (quarter, returnflag) are pushed to the scans
    BEFORE the fact-fact join, so the orderkey shuffle carries only the
    returned slice; nation is broadcast (customer, scale-proportional,
    is left to AQE); the global top-20
    is TakeOrderedAndProject (per-partition heads, no total sort).
    DECIMAL revenue makes the ordering — and therefore the LIMIT
    frontier — identical across engines; ties broken by c_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# promo revenue share (TPC-H Q14 shape: conditional aggregation)
# ---------------------------------------------------------------------------

_Q14_SQL = """
SELECT round(
         CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         * 100.0
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-02-01'
"""


@register("promo_revenue_share", oracle=_Q14_SQL, tags=("join", "agg"))
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo share: percentage of one month's revenue
    coming from PROMO-type parts — conditional aggregation (CASE inside
    sum) over a part join (scale-proportional part side left to AQE),
    one scalar out. The month predicate
    prunes the scan; both sums ride the same single aggregate pass.
    DECIMAL sums, division at the output boundary."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(promo).cast("double") * 100.0 / F.sum(rev).cast("double"), 6
            ).alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------------
# disjunctive predicate revenue (TPC-H Q19 shape)
# ---------------------------------------------------------------------------

_Q19_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_SQL, tags=("join", "agg"))
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: an OR of three
    brand/size/quantity conjunctions spanning both join sides. Catalyst
    extracts the common-subexpression parts of the disjunction that
    reference only one side (brand/size → part scan, quantity bounds →
    lineitem scan) and pushes them below the join as coarse filters,
    keeping the residual OR above — the textbook CNF-extraction case.
    Part (scale-proportional) is left to AQE; one scalar aggregate
    out."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & q.between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(5, 25)
            & q.between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 40)
            & q.between(20, 50)
        )
    )
    rev = F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(rev.cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


CMS_D = 5       # depth: P(over-count > eps*N) <= e^-D ~ 0.7%
CMS_W = 2048    # width: eps = e / W ~ 0.00133
CMS_EPS = 2.718281828459045 / CMS_W   # over-count bound: eps * stream size
CMS_CONF = 1.0 - 0.006737946999085467  # 1 - e^-CMS_D

# Row-i bucket of event_type, shared definition (i in 0..CMS_D-1): the
# md5_long of "i:<type>" mod width — deterministic in both engines, so
# the full register table is a pure function of the data.
_CMS_H = (
    "CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':' || event_type),"
    " 1, 15)) AS BIGINT)"
)

_CMS_SQL = f"""
WITH hb AS (
  SELECT event_type, CAST(i AS INTEGER) AS i, {_CMS_H} % {CMS_W} AS b
  FROM events, unnest(range({CMS_D})) AS t(i)
),
reg AS (
  SELECT i, b, CAST(count(*) AS BIGINT) AS cnt FROM hb GROUP BY i, b
),
th AS (
  SELECT DISTINCT event_type, i, b FROM hb
),
est AS (
  SELECT t.event_type, min(r.cnt) AS est_count
  FROM th t JOIN reg r ON t.i = r.i AND t.b = r.b
  GROUP BY t.event_type
),
exact AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS exact_count
  FROM events GROUP BY event_type
)
SELECT e.event_type, est_count, exact_count,
       est_count - exact_count AS over_count
FROM est e JOIN exact x ON e.event_type = x.event_type
"""


def cms_hashed(df: DataFrame, col: str = "event_type") -> DataFrame:
    """(value, i, b) rows: each input row exploded to its CMS_D
    (row, bucket) coordinates — the shared front half of the batch
    sketch and its streaming twin (streaming/sketches.py)."""
    return df.select(
        F.col(col).alias("event_type"),
        F.posexplode(
            F.array(
                *[
                    (
                        X.md5_long(F.concat(F.lit(f"{i}:"), F.col(col)))
                        % CMS_W
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("i", "b"),
    )


def cms_registers(hashed: DataFrame) -> DataFrame:
    """The register table: counter[i][b] as an order-free integer sum —
    bounded at CMS_D * CMS_W rows regardless of stream size, mergeable
    by pure addition (complete-mode streaming state stays tiny
    forever)."""
    return hashed.groupBy("i", "b").agg(F.count(F.lit(1)).alias("cnt"))


def cms_point_estimates(reg: DataFrame, hashed: DataFrame) -> DataFrame:
    """Read-side point queries: the distinct value->bucket map probed
    against the (broadcast) register table, min over the CMS_D row
    counters per value."""
    th = hashed.select("event_type", "i", "b").distinct()
    return (
        th.join(F.broadcast(reg), ["i", "b"])
        .groupBy("event_type")
        .agg(F.min("cnt").alias("est_count"))
    )


@register("agg_countmin_events", oracle=_CMS_SQL, tags=("agg", "approx"))
def agg_countmin_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries (Cormode & Muthukrishnan 2005) —
    hand-rolled like agg_hll_events so the ENTIRE sketch state is a
    deterministic pure function of the data and DuckDB can replay it
    value-exactly (round-6 verdict #3; previously this used Spark's
    built-in count_min_sketch + a JVM-side probe, whose serialized
    register layout is engine-specific and forced a rows-only check).

    Registers: counter[i][b] = #rows whose row-i hash lands in bucket
    b, i < CMS_D, b = md5_long("i:" || event_type) mod CMS_W — an
    order-free integer SUM over deterministic md5 bucket hashes, hence
    mergeable by pure addition (the same property that lets a 100 TB
    run build per-partition D*W register blocks map-side and combine
    them associatively; the materialized sketch is <= D*W = 10,240
    rows regardless of stream size). Point estimate = min over the D
    row counters — never under-counts, over-counts > eps*N with
    probability <= e^-D (bounds kept pinned in tests/test_approx.py;
    the oracle additionally pins exact register equality).

    Plan: one posexplode(D) + hash-agg builds the registers (map-side
    partials collapse to <= D*W rows per partition); the probe joins
    the distinct type->bucket map against the tiny register table
    (broadcast) and min-reduces per type."""
    ev = load_table(spark, sf_dir, "events")
    hashed = cms_hashed(ev)
    est = cms_point_estimates(cms_registers(hashed), hashed)
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count")).alias("over_count"),
    )


# ---------------------------------------------------------------------------
# deterministic HyperLogLog: the ORACLED sketch
# ---------------------------------------------------------------------------

HLL_P = 12                    # 2^12 = 4096 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# scaled numerator: alpha * m^2 * 2^49 (registers are summed as exact
# integers scaled by 2^49, so the estimate is ONE double division)
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << 49)

_HLL_H = X.md5_long_sql("CAST(user_id AS VARCHAR)")

_HLL_SQL = f"""
WITH hb AS (
  SELECT event_type,
         {_HLL_H} % {HLL_M} AS b,
         {_HLL_H} // {HLL_M} AS t
  FROM events
),
r AS (
  SELECT event_type, b,
         max(CASE WHEN t = 0 THEN 49 ELSE 49 - length(bin(t)) END) AS reg
  FROM hb GROUP BY event_type, b
),
a AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS used_buckets,
         CAST(sum(1::BIGINT << CAST(49 - reg AS INT)) AS BIGINT) AS dp
  FROM r GROUP BY event_type
),
e AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT a.event_type, used_buckets,
       dp + ({HLL_M} - used_buckets) * (1::BIGINT << 49) AS denom_scaled,
       exact_distinct,
       round({HLL_NUM!r} / (dp + ({HLL_M} - used_buckets) * (1::BIGINT << 49)), 3)
         AS est_raw
FROM a JOIN e ON a.event_type = e.event_type
"""


def hll_registers(df: DataFrame, keys: list[str], value: F.Column) -> DataFrame:
    """Deterministic HLL register table over `value` per key group:
    bucket = md5_long(value) mod 2^p, rho = leading-zero count of the
    remaining 48 hash bits + 1 (computed EXACTLY via length(bin(t)) —
    no float log), register = max(rho). Returns one row per
    (keys..., used_buckets, denom_scaled): the harmonic denominator is
    kept as the exact integer sum of 2^(49-rho) (scaled by 2^49, max
    4096 * 2^49 = 2^61 < 2^63), so the sketch state is engine-exact
    and mergeable by construction (max over registers, sum rewritten
    from merged registers)."""
    h = X.md5_long(value.cast("string"))
    bucket = (h % HLL_M).alias("b")
    t = F.floor((h - h % HLL_M) / HLL_M).cast("bigint")
    rho = F.when(t == 0, F.lit(49)).otherwise(F.lit(49) - F.length(F.bin(t)))
    regs = (
        df.select(*keys, bucket, rho.alias("rho"))
        .groupBy(*keys, "b")
        .agg(F.max("rho").alias("reg"))
    )
    return regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("used_buckets"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - reg AS INT))"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << 49)
        ).alias("denom_scaled"),
    )


@register("agg_hll_events", oracle=_HLL_SQL, tags=("agg", "approx"))
def agg_hll_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled HyperLogLog distinct-user sketch per event type —
    the ORACLED sketch: unlike agg_approx_events / agg_countmin_events
    / agg_heavyhitters_events (engine-specific internals, bounded in
    tests only), these registers are a deterministic pure function of
    the input under the cross-engine md5_long hash, so the ENTIRE
    sketch state hash-matches DuckDB: bucket = low p=12 hash bits,
    rho = leading-zero rank of the remaining 48 bits via exact integer
    length(bin(t)) arithmetic, harmonic denominator as the exact
    integer sum of 2^(49-rho). est_raw is the one double division
    (alpha·m²/denominator); the small-range linear-counting correction
    uses ln() whose last-ulp behavior is libm-specific, so it is
    asserted in tests/test_approx.py (err <= 5%) rather than oracled.

    Scale shape (100 TB): registers are the canonical mergeable
    distinct-count state — per-partition partial max per (key, bucket)
    means the shuffle carries at most |keys|·4096 rows regardless of
    input volume; the exact_distinct column (for error audit) is the
    only corpus-cardinality aggregate, and a production pipeline
    drops it."""
    ev = load_table(spark, sf_dir, "events")
    sk = hll_registers(ev, ["event_type"], F.col("user_id"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return sk.join(exact, "event_type").select(
        "event_type",
        "used_buckets",
        "denom_scaled",
        "exact_distinct",
        F.round(F.lit(HLL_NUM) / F.col("denom_scaled"), 3).alias("est_raw"),
    )


# ---------------------------------------------------------------------------
# deterministic AMS F2 / tug-of-war sketch: self-join size estimation
# ---------------------------------------------------------------------------

AMS_D = 7    # odd estimator count: the median is the exact middle
#              order statistic (no averaging, so it stays integer)
AMS_W = 256  # buckets per estimator row: relative std ~ sqrt(2/W) ~ 9%

# One md5 per (row i, record) supplies BOTH coordinates: sign from the
# low bit, bucket from the next 8 bits — the CMS/HLL hash discipline.
_AMS_H = (
    "CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':' ||"
    " CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
)

_AMS_SQL = f"""
WITH hb AS (
  SELECT event_type, CAST(i AS INTEGER) AS i,
         ({_AMS_H} // 2) % {AMS_W} AS b,
         CASE WHEN {_AMS_H} % 2 = 0 THEN -1 ELSE 1 END AS s
  FROM events, unnest(range({AMS_D})) AS t(i)
),
reg AS (
  SELECT event_type, i, b, CAST(sum(s) AS BIGINT) AS c
  FROM hb GROUP BY event_type, i, b
),
est AS (
  SELECT event_type, i, CAST(sum(c * c) AS BIGINT) AS f2_i
  FROM reg GROUP BY event_type, i
),
med AS (
  SELECT event_type, f2_i AS f2_est FROM (
    SELECT event_type, f2_i,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY f2_i, i) AS rn
    FROM est)
  WHERE rn = {(AMS_D + 1) // 2}
),
exact AS (
  SELECT event_type, CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact FROM (
    SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type, user_id)
  GROUP BY event_type
)
SELECT m.event_type, f2_est, f2_exact, f2_est - f2_exact AS err
FROM med m JOIN exact x ON m.event_type = x.event_type
"""


def ams_registers(df: DataFrame, keys: list[str], value) -> DataFrame:
    """AMS tug-of-war register table over `value` per key group:
    counter[i][b] = sum of sign_i(v) over rows hashed to bucket b —
    an order-free INTEGER sum over deterministic md5 coordinates
    (sign = low hash bit, bucket = next bits mod AMS_W), hence
    mergeable by pure addition like the CMS/HLL registers and exactly
    replayable by DuckDB. At most |keys| * AMS_D * AMS_W rows
    regardless of stream size."""
    hs = [
        X.md5_long(F.concat(F.lit(f"{i}:"), value.cast("string")))
        for i in range(AMS_D)
    ]
    hashed = df.select(
        *keys,
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        # shiftright == // 2 for the non-negative hash:
                        # float division would lose bits past 2^53
                        (F.shiftright(h, 1) % AMS_W).alias("b"),
                        F.when(h % 2 == 0, F.lit(-1))
                        .otherwise(F.lit(1))
                        .alias("s"),
                    )
                    for h in hs
                ]
            )
        ).alias("i", "bs"),
    ).select(*keys, "i", F.col("bs.b").alias("b"), F.col("bs.s").alias("s"))
    return hashed.groupBy(*keys, "i", "b").agg(
        F.sum("s").cast("bigint").alias("c")
    )


def ams_f2_estimates(reg: DataFrame, keys: list[str]) -> DataFrame:
    """Read-side F2 estimates off an AMS register table (the shared
    back half of the batch sketch and its streaming twin,
    streaming/sketches.py): per-row estimate = sum_b c^2, reported
    estimate = the exact middle order statistic over the AMS_D rows
    (rank (AMS_D+1)/2, ties to row index) — integer end to end."""
    est = reg.groupBy(*keys, "i").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_i")
    )
    w = Window.partitionBy(*keys).orderBy(F.asc("f2_i"), F.asc("i"))
    return (
        est.select(*keys, "f2_i", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == (AMS_D + 1) // 2)
        .select(*keys, F.col("f2_i").alias("f2_est"))
    )


@register("agg_ams_f2_events", oracle=_AMS_SQL, tags=("agg", "approx"))
def agg_ams_f2_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment (F2) sketch — the tug-of-war estimator of
    Alon, Matias & Szegedy (STOC 1996) in its bucketed fast-AMS form
    (Thorup & Zhang 2004; the CountSketch layout): per event_type,
    estimate the SELF-JOIN SIZE on user_id (F2 = sum over users of
    f_u^2 — the quantity a cost-based optimizer wants before picking
    a join strategy, and the canonical second frequency moment)
    against the exact value. Completes the oracled sketch family
    (HLL distincts = F0, CountMin point counts, KMV, quantile rank)
    with the moment the others can't give.

    Sketch state: counter[i][b] = sum of +-1 signs (i < AMS_D rows,
    b = next-8-hash-bits buckets) — an order-free integer sum over
    deterministic md5 coordinates, so unlike Misra-Gries the ENTIRE
    state is a pure function of the data multiset: mergeable by pure
    addition, engine-exact, and the DuckDB oracle replays it
    value-identically (the agg_countmin_events graduation discipline,
    round-6 verdict #3). Estimator per row i: sum_b c^2 (E = F2,
    Var <= 2*F2^2/AMS_W); the reported estimate is the exact MEDIAN
    over the AMS_D=7 rows — an odd count, so the median is the
    middle order statistic (rank (D+1)/2, ties to row index), never
    an average, and stays integer end to end.

    Plan: one posexplode(D) + two hash-aggs build registers and
    per-row estimates (map-side partials collapse each partition to
    <= |types|*D*W register rows); the median is a window over D=7
    rows per type; exact F2 is a two-level hash-agg. Everything is
    data-linear with sketch-sized state — at 100 TB the registers
    stream map-side exactly like the CMS/HLL tables. Overflow bound:
    f2 ~ N_type^2 must stay under 2^63, i.e. N_type <= ~3e9 rows per
    group; past that, shard the key domain (F2 is additive over
    disjoint key shards) or lift the squares to DECIMAL(38,0).

    Reference basis: public sketch literature only (no reference-repo
    analogue — the log ETL has no approximate aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    reg = ams_registers(ev, ["event_type"], F.col("user_id"))
    med = ams_f2_estimates(reg, ["event_type"])
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("event_type")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("f2_exact"))
    )
    return med.join(exact, "event_type").select(
        "event_type",
        "f2_est",
        "f2_exact",
        (F.col("f2_est") - F.col("f2_exact")).alias("err"),
    )


# ---------------------------------------------------------------------------
# z-order layout: multi-dimension scan pruning vs a single-sort layout
# ---------------------------------------------------------------------------

ZO_BITS = 8                  # 8 bits per dimension -> 16-bit Morton code
ZO_FILES = 64                # files per layout (z // 1024, x // 4)
ZO_X_LO, ZO_X_HI = 40, 47    # probe predicate on the user dimension
ZO_Y_LO, ZO_Y_HI = 96, 103   # probe predicate on the time dimension

# x = user_id mod 256; y = 4-hour bucket since 2024-01-01 (720 h / 4 =
# 180 < 256, monotone, no wrap). Interleave terms are generated once
# and spelled identically (integer shifts) in both engines.
_ZO_EPOCH0 = 1704067200  # 2024-01-01 00:00:00 UTC

_ZO_SPARK_X = "CAST(user_id % 256 AS BIGINT)"
_ZO_SPARK_Y = f"CAST(floor((unix_timestamp(ts) - {_ZO_EPOCH0}) / 14400) % 256 AS BIGINT)"
_ZO_DUCK_X = "CAST(user_id % 256 AS BIGINT)"
_ZO_DUCK_Y = f"CAST(floor((epoch(ts) - {_ZO_EPOCH0}) / 14400) % 256 AS BIGINT)"


def _morton_spark(x: str, y: str) -> str:
    terms = []
    for i in range(ZO_BITS):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i + 1})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i})")
    return " + ".join(terms)


def _morton_duck(x: str, y: str) -> str:
    terms = []
    for i in range(ZO_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


_ZO_SQL = f"""
WITH dims AS (
  SELECT {_ZO_DUCK_X} AS x, {_ZO_DUCK_Y} AS y FROM events
),
placed AS (
  SELECT 'zorder' AS layout,
         ({_morton_duck('x', 'y')}) // 1024 AS fid, x, y FROM dims
  UNION ALL
  SELECT 'linear_x' AS layout, x // 4 AS fid, x, y FROM dims
),
files AS (
  SELECT layout, fid,
         min(x) AS min_x, max(x) AS max_x,
         min(y) AS min_y, max(y) AS max_y,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM placed GROUP BY layout, fid
)
SELECT layout,
  CAST(count(*) AS BIGINT) AS files_total,
  CAST(sum(CASE WHEN max_x >= {ZO_X_LO} AND min_x <= {ZO_X_HI} THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned_x,
  CAST(sum(CASE WHEN max_y >= {ZO_Y_LO} AND min_y <= {ZO_Y_HI} THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned_y,
  CAST(sum(CASE WHEN max_x >= {ZO_X_LO} AND min_x <= {ZO_X_HI} THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned_x,
  CAST(sum(CASE WHEN max_y >= {ZO_Y_LO} AND min_y <= {ZO_Y_HI} THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned_y
FROM files GROUP BY layout
"""


@register("layout_zorder_stats", oracle=_ZO_SQL, tags=("warehouse", "layout"))
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-LAYOUT operator: compare Z-ORDER (Morton-interleaved
    user × time-bucket) file clustering against a single-column sort
    layout by the min/max zone maps each produces — the mechanism
    behind Delta/Iceberg OPTIMIZE ZORDER and parquet row-group
    skipping. Every event is assigned a file under both layouts
    (z-order: 16-bit Morton code split into 64 equal-width z ranges —
    pure map-side integer shifts, NO global sort; linear: x // 4), the
    per-file min/max zone maps are one hash-agg, and two probe
    predicates (a user slice, a time slice) are evaluated against the
    zone maps alone. The z-order layout prunes on BOTH dimensions;
    the linear layout prunes only on its sort key and must scan every
    file for the time predicate — the measured rows_scanned_y gap IS
    the reason multi-dimensional clustering exists at 100 TB.

    Scale shape: dimension extraction and Morton interleave are
    map-side integer expressions; the only shuffles are the
    (layout, fid) zone-map hash-agg (≤ 2·64 groups after partial
    aggregation) and the final 2-row layout tally. A production
    writer would follow the fid assignment with repartitionByRange on
    z before write — the stats here cost nothing at any scale."""
    ev = load_table(spark, sf_dir, "events")
    dims = ev.select(
        F.expr(_ZO_SPARK_X).alias("x"), F.expr(_ZO_SPARK_Y).alias("y")
    )
    z = F.expr(_morton_spark("x", "y"))
    placed = dims.select(
        F.lit("zorder").alias("layout"),
        F.floor(z / 1024).cast("bigint").alias("fid"),
        "x",
        "y",
    ).unionByName(
        dims.select(
            F.lit("linear_x").alias("layout"),
            F.floor(F.col("x") / 4).cast("bigint").alias("fid"),
            "x",
            "y",
        )
    )
    files = placed.groupBy("layout", "fid").agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    hit_x = (F.col("max_x") >= ZO_X_LO) & (F.col("min_x") <= ZO_X_HI)
    hit_y = (F.col("max_y") >= ZO_Y_LO) & (F.col("min_y") <= ZO_Y_HI)
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).alias("files_total"),
        F.sum(F.when(hit_x, 1).otherwise(0)).alias("files_scanned_x"),
        F.sum(F.when(hit_y, 1).otherwise(0)).alias("files_scanned_y"),
        F.sum(F.when(hit_x, F.col("n_rows")).otherwise(0)).alias("rows_scanned_x"),
        F.sum(F.when(hit_y, F.col("n_rows")).otherwise(0)).alias("rows_scanned_y"),
    )


# ---------------------------------------------------------------------------
# order-priority check (TPC-H Q4 shape: EXISTS semi-join + tally)
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_SQL, tags=("join", "agg"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped priority check: orders from one quarter having at
    least one line item shipped after the order date, tallied by
    priority. The EXISTS becomes a LeftSemi join keyed on orderkey with
    the l_shipdate > o_orderdate residual riding the join — the quarter
    predicate prunes the orders scan first, so the semi join probes only
    one quarter's keys. One shuffle + a tiny priority tally."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# late-shipment share (TPC-H Q12 shape: join + two conditional tallies)
# ---------------------------------------------------------------------------

LATE_DAYS = 90

_Q12_SQL = f"""
SELECT o_orderpriority,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_items,
       count(*) AS total_items,
       round(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS late_share
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("q12_late_shipments", oracle=_Q12_SQL, tags=("join", "agg"))
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-SLA report: per order priority, the
    share of line items shipped more than LATE_DAYS after their order
    date. Fact-fact equi-join on orderkey (AQE handles skew), both
    tallies in one conditional-aggregation pass — exact timestamp
    interval arithmetic, integer counts, division at the boundary."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS"),
        1,
    ).otherwise(0)
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late).alias("late_items"),
            F.count(F.lit(1)).alias("total_items"),
            F.round(F.sum(late) / F.count(F.lit(1)), 6).alias("late_share"),
        )
    )


# ---------------------------------------------------------------------------
# exact grouped percentiles
# ---------------------------------------------------------------------------

_PCTL_SQL = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


@register("orders_price_percentiles", oracle=_PCTL_SQL, tags=("agg",))
def orders_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of order value per priority — Spark's
    percentile() and DuckDB's quantile_cont share the same linear-
    interpolation definition, so the values hash-match exactly (the
    same equivalence rfm_segments' cut-points rely on). Exact grouped
    percentiles sort within each group; at 100 TB swap in
    percentile_approx per group (mergeable sketch) exactly as
    agg_approx_events does globally."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# ranking-function matrix completion (dense_rank / percent_rank)
# ---------------------------------------------------------------------------

_DENSE_SQL = """
SELECT s_nationkey, s_suppkey,
       dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
         AS balance_rank,
       round(percent_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey), 6)
         AS balance_pct_rank
FROM supplier
"""


@register("supplier_rank_dense", oracle=_DENSE_SQL, tags=("window",))
def supplier_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank + percent_rank per nation — completes the ranking-
    function matrix beside row_number (topk), lag (gap), and ntile
    (superseded by cut-points in rfm). Window partitioned by the
    nation key; fully tie-broken ordering makes both ranks
    engine-exact."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.dense_rank().over(w).alias("balance_rank"),
        F.round(F.percent_rank().over(w), 6).alias("balance_pct_rank"),
    )


# ---------------------------------------------------------------------------
# year-over-year growth (lag over an aggregated frame)
# ---------------------------------------------------------------------------

_YOY_SQL = """
WITH yearly AS (
  SELECT n_name, year(o_orderdate) AS order_year,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, order_year, revenue,
       round(CASE WHEN lag(revenue) OVER w IS NULL OR lag(revenue) OVER w = 0
                  THEN 0.0
                  ELSE (revenue - lag(revenue) OVER w) / lag(revenue) OVER w END, 6)
         AS yoy_growth
FROM yearly
WINDOW w AS (PARTITION BY n_name ORDER BY order_year)
"""


@register("nation_revenue_yoy", oracle=_YOY_SQL, tags=("window", "agg"))
def nation_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation: the lag
    window runs over the ALREADY-AGGREGATED (nation, year) frame —
    |nations|·|years| rows — not raw orders, so the window cost is
    trivial at any scale; the heavy lifting is one broadcast-dim join +
    hash-aggregate. DECIMAL sums make lag inputs engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    yearly = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("order_year")
    prev = F.lag("revenue").over(w)
    growth = F.when(
        prev.isNull() | (prev == 0), F.lit(0.0)
    ).otherwise((F.col("revenue") - prev) / prev)
    return yearly.select(
        "n_name", "order_year", "revenue", F.round(growth, 6).alias("yoy_growth")
    )


# ---------------------------------------------------------------------------
# robust outliers via median absolute deviation
# ---------------------------------------------------------------------------

MAD_K = 3.0

_MAD_SQL = f"""
WITH med AS (
  SELECT p_type, quantile_cont(p_retailprice, 0.5) AS med
  FROM part GROUP BY p_type
),
dev AS (
  SELECT p.p_type, p.p_partkey, p.p_retailprice, m.med,
         abs(p.p_retailprice - m.med) AS adev
  FROM part p JOIN med m ON p.p_type = m.p_type
),
mad AS (
  SELECT p_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY p_type
)
SELECT d.p_type,
       count(*) AS n_parts,
       CAST(sum(CASE WHEN d.adev > {MAD_K} * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m ON d.p_type = m.p_type
GROUP BY d.p_type
"""


@register("part_price_outliers_mad", oracle=_MAD_SQL, tags=("agg",))
def part_price_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: median absolute deviation per part type
    (immune to the very outliers a mean/stddev z-score absorbs —
    the robust sibling of events_anomaly_zscore). Two exact-percentile
    aggregates over tiny key spaces, both stat frames broadcast back,
    flagging is map-side. Spark percentile() ≡ DuckDB quantile_cont
    keeps medians engine-exact."""
    p = load_table(spark, sf_dir, "part")
    med = p.groupBy("p_type").agg(
        F.expr("percentile(p_retailprice, 0.5)").alias("med")
    )
    dev = p.join(F.broadcast(med), "p_type").withColumn(
        "adev", F.abs(F.col("p_retailprice") - F.col("med"))
    )
    mad = dev.groupBy("p_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "p_type")
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(
                F.when(F.col("adev") > MAD_K * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# top-revenue supplier via aggregate-max scalar (TPC-H Q15 shape)
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN rev r ON s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
"""


@register("q15_top_supplier", oracle=_Q15_SQL, tags=("join", "agg", "subquery"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: quarterly revenue per supplier,
    keep the supplier(s) achieving the global maximum (the reference's
    pipeline has no aggregate-derived scalar anywhere — SURVEY.md §2b).
    One hash-agg on l_suppkey (partial map-side), then the 1-row max is
    broadcast back as a cross-join literal and the equality filter runs
    map-side over the |suppliers|-row agg frame — no second shuffle, no
    total sort. DECIMAL revenue keeps the max frontier engine-exact
    (a double max could tie differently across engines)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias(
            "total_rev"
        )
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# small-quantity revenue with a correlated per-group average (TPC-H Q17)
# ---------------------------------------------------------------------------

_Q17_SQL = """
WITH avgq AS (
  SELECT l_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
FROM lineitem l
JOIN part ON p_partkey = l.l_partkey
JOIN avgq a ON a.l_partkey = l.l_partkey
WHERE p_brand = 'Brand#12'
  AND CAST(l.l_quantity AS DECIMAL(18,2)) * a.cnt * 5 < a.sum_qty
"""


@register("q17_small_qty_revenue", oracle=_Q17_SQL, tags=("join", "agg", "subquery"))
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated-average filter: revenue from orders
    below 20%% of the part's average order quantity. The correlated
    scalar subquery decorrelates to one hash-agg per partkey joined back
    to lineitem on the same key — at 100 TB both sides shuffle on
    l_partkey once and AQE handles hot parts. The 20%%-of-average
    threshold is compared in exact integer/decimal cross-multiplied form
    (qty*cnt*5 < sum_qty) instead of a double average, so the inclusion
    frontier can't flip on an engine's ulp (ADVICE.md round-2 pattern).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    avgq = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(avgq, F.col("a_partkey") == F.col("l_partkey"))
        .filter(_dec("l_quantity") * F.col("cnt") * F.lit(5) < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 6
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# large-volume orders via grouped-HAVING IN subquery (TPC-H Q18 shape)
# ---------------------------------------------------------------------------

_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       CAST(b.sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN big b ON o_orderkey = b.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 100
"""


@register("q18_large_volume_orders", oracle=_Q18_SQL, tags=("join", "agg", "topk"))
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume customers: orders whose total line
    quantity exceeds 300, with buyer, ranked by order value. The IN
    (GROUP BY ... HAVING) subquery decorrelates to a hash-agg on
    l_orderkey whose surviving frontier is tiny (<1%% of orders) but
    still scale-proportional, so neither it nor the qualified
    orders slice carries a forced broadcast hint: AQE sees the
    post-filter runtime sizes and picks broadcast when they fit,
    shuffle join when they don't — a forced hint here would OOM the
    driver at large SF (round-3 ADVICE finding). Global top-100 is
    TakeOrderedAndProject (per-partition heads), tie-broken by
    o_orderkey; quantities summed in DECIMAL so the >300 frontier and
    the sort are engine-exact."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    qualified = o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
    return (
        c.join(qualified, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            _dec("o_totalprice").cast("double").alias("total_price"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# sole-late supplier on multi-supplier orders (TPC-H Q21 shape)
# ---------------------------------------------------------------------------

_Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@register("q21_sole_late_supplier", oracle=_Q21_SQL, tags=("join", "subquery", "topk"))
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped blame assignment: suppliers whose late line items
    (shipped >90 days after the order date, finished orders only) were
    the ONLY late deliveries on orders involving at least two suppliers.
    The EXISTS / NOT-EXISTS pair over the same fact table decorrelates
    into ONE per-orderkey aggregate over the already-joined lines:
    distinct-supplier count (the EXISTS becomes >= 2), distinct-LATE-
    supplier count (the NOT EXISTS becomes == 1), the sole late
    supplier's id (max over a single-element set — exact because the
    qualifying filter pins that set to size 1), and the late-line tally
    the final answer needs. No join-back, no correlated re-scan: the
    fact table is read once, pays one orderkey shuffle (the join), and
    the per-order frame collapses to one row — at 100 TB that is one
    shuffle + one agg where the naive decorrelation re-reads lineitem
    three times. Oracle keeps the literal EXISTS/NOT EXISTS form to pin
    the rewrite's equivalence. Top-10 tie-broken by supplier name."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lf = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("is_late"),
        )
    )
    late_supp = F.when(F.col("is_late"), F.col("l_suppkey"))
    per_order = lf.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(late_supp).alias("n_late_supp"),
        F.max(late_supp).alias("late_supp"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late_lines"),
    )
    qualified = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        qualified.groupBy("late_supp")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .join(s, F.col("late_supp") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# dormant high-balance customers (TPC-H Q22 shape)
# ---------------------------------------------------------------------------

_Q22_CODES = ("01", "12", "23", "34", "45", "56", "67")

_Q22_SQL = f"""
WITH coded AS (
  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         right(c_name, 2) AS cntrycode
  FROM customer
  WHERE right(c_name, 2) IN {_Q22_CODES!r}
),
avgbal AS (
  SELECT sum(bal) AS sum_bal, count(*) AS cnt
  FROM coded WHERE bal > 0
)
SELECT cntrycode, count(*) AS numcust,
       CAST(sum(bal) AS DOUBLE) AS totacctbal
FROM coded, avgbal
WHERE bal * cnt > sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY cntrycode
"""


@register("q22_dormant_customers", oracle=_Q22_SQL, tags=("join", "subquery"))
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped sales opportunity: customers in selected country
    codes (last two digits of the customer name — the schema has no
    phone column) with above-average positive balances and no orders in
    the final 14 months (every customer in the test data has SOME order,
    so literal Q22 "no orders ever" is vacuously empty — dormancy since
    a cutoff keeps the anti-join shape AND a non-trivial result). Three
    classic shapes in one query: a substring-derived group key, a
    global-scalar threshold (1-row sum/count frame broadcast via cross
    join, compared exactly as bal*cnt > sum to avoid double-avg ulps),
    and NOT EXISTS as a left-anti join against the date-pruned orders
    slice — at 100 TB the anti join shuffles both sides on custkey once,
    each side pre-filtered (code set / date pushdown) first."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
    )
    coded = c.filter(
        F.expr("right(c_name, 2)").isin(*_Q22_CODES)
    ).select(
        "c_custkey",
        _dec("c_acctbal").alias("bal"),
        F.expr("right(c_name, 2)").alias("cntrycode"),
    )
    avgbal = coded.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("sum_bal"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        coded.join(F.broadcast(avgbal))
        .filter(F.col("bal") * F.col("cnt") > F.col("sum_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# national market share within a region (TPC-H Q8 shape)
# ---------------------------------------------------------------------------

_Q8_SQL = """
WITH sales AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM sales
GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_SQL, tags=("join", "agg"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: one nation's fraction of regional
    revenue for one part type, per order year — the share-of-total
    pattern as a single grouped conditional aggregation (no second pass
    over the data for the denominator). Plan shape at 100 TB: the
    selective part filter broadcasts into lineitem so the fact table is
    pruned before its only shuffle (orderkey, against the date-pruned
    orders slice); supplier, both nation legs, and region are broadcast
    dims. The region-restricted customer side is scale-proportional
    (a constant fraction of all customers), so it carries NO forced
    hint — AQE broadcasts it only when the runtime size fits,
    otherwise it joins on the custkey shuffle (round-3 ADVICE
    finding). Numerator and denominator are exact DECIMAL sums,
    divided once per output row."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust_in_region = (
        c.join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("volume", volume)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", F.col("volume"))
                    .otherwise(F.lit(0).cast("decimal(18,2)"))
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# whole-partition window aggregate: each order vs the customer's others
# ---------------------------------------------------------------------------

_PEER_SQL = """
WITH w AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         sum(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (PARTITION BY o_custkey) AS cust_sum,
         count(*) OVER (PARTITION BY o_custkey) AS cust_n
  FROM orders
)
SELECT o_orderkey, o_custkey,
       CAST(price AS DOUBLE) AS price,
       cust_n,
       round(CAST(price * (cust_n - 1) AS DOUBLE)
             / CAST(cust_sum - price AS DOUBLE), 6) AS peer_ratio
FROM w
WHERE cust_n > 1 AND price * (cust_n - 1) > 2 * (cust_sum - price)
"""


@register("orders_vs_peer_avg", oracle=_PEER_SQL, tags=("window", "agg"))
def orders_vs_peer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out peer comparison: orders worth more than twice the
    average of the SAME customer's other orders. The whole-partition
    window frame (PARTITION BY custkey, no ORDER BY — every row sees the
    full partition aggregate) is the one window shape the suite didn't
    yet pin: no sort is required, so Spark plans a WindowExec whose
    frame is unbounded-to-unbounded over a hash-partitioned exchange —
    state per partition is one sum+count, and partitions are
    per-customer small at any scale. The leave-one-out average is
    compared cross-multiplied in DECIMAL (price*(n-1) > 2*(sum-price)),
    so the frontier is engine-exact; the reported ratio is the only
    double."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    price = _dec("o_totalprice")
    df = o.select(
        "o_orderkey",
        "o_custkey",
        price.alias("price"),
        F.sum(price).over(w).alias("cust_sum"),
        F.count(F.lit(1)).over(w).alias("cust_n"),
    )
    return df.filter(
        (F.col("cust_n") > 1)
        & (F.col("price") * (F.col("cust_n") - 1) > 2 * (F.col("cust_sum") - F.col("price")))
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("price").cast("double").alias("price"),
        "cust_n",
        F.round(
            (F.col("price") * (F.col("cust_n") - 1)).cast("double")
            / (F.col("cust_sum") - F.col("price")).cast("double"),
            6,
        ).alias("peer_ratio"),
    )


# ---------------------------------------------------------------------------
# multiset set operations (INTERSECT ALL / EXCEPT ALL on bags)
# ---------------------------------------------------------------------------

_SETOPS_ALL_SQL = """
WITH h1 AS (SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'),
h2 AS (SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate <  TIMESTAMP '1998-01-01')
SELECT 'intersect_all' AS op, o_custkey, count(*) AS n
FROM (SELECT o_custkey FROM h1 INTERSECT ALL SELECT o_custkey FROM h2)
GROUP BY o_custkey
UNION ALL
SELECT 'except_all' AS op, o_custkey, count(*) AS n
FROM (SELECT o_custkey FROM h1 EXCEPT ALL SELECT o_custkey FROM h2)
GROUP BY o_custkey
"""


@register("set_ops_multiset_orders", oracle=_SETOPS_ALL_SQL, tags=("setop",))
def set_ops_multiset_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — INTERSECT ALL (per-customer order
    count matched across two years: min of multiplicities) and EXCEPT
    ALL (multiplicity difference) over NON-distinct custkey streams.
    set_ops_customers covers the distinct-set variants; these are the
    multiset forms, which Spark plans as a count-aggregate + generate
    (no distinct collapse) — per-key state is two counts, scale-safe.
    Output is re-aggregated per custkey so the result is scalar-stable
    regardless of row multiplicity."""
    o = load_table(spark, sf_dir, "orders")

    def slice_year(y0: str, y1: str) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
        ).select("o_custkey")

    h1 = slice_year("1996-01-01", "1997-01-01")
    h2 = slice_year("1997-01-01", "1998-01-01")
    inter = (
        h1.intersectAll(h2)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "o_custkey", "n")
    )
    exc = (
        h1.exceptAll(h2)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "o_custkey", "n")
    )
    return inter.unionAll(exc)


# ---------------------------------------------------------------------------
# market-basket co-purchase mining (association pairs with lift)
# ---------------------------------------------------------------------------

BASKET_TOP = 20

_BASKET_SQL = f"""
WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM po a JOIN po b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
cnt AS (SELECT pa, pb, count(*) AS n_co FROM pairs GROUP BY pa, pb),
pc AS (SELECT l_partkey, count(*) AS n_ord FROM po GROUP BY l_partkey),
tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM po)
SELECT pa, pb, n_co,
       round(n_co * 1.0 * t.n / (ca.n_ord * cb.n_ord), 6) AS lift
FROM cnt
JOIN pc ca ON pa = ca.l_partkey
JOIN pc cb ON pb = cb.l_partkey, tot t
ORDER BY n_co DESC, pa, pb
LIMIT {BASKET_TOP}
"""


@register("parts_copurchased", oracle=_BASKET_SQL, tags=("agg", "topk"))
def parts_copurchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining: part pairs most often bought in the same
    order, with lift (observed co-rate over the independence rate). The
    pair generation is NOT a self-join: per-order sorted part arrays
    expand their pairs MAP-SIDE (explode of a per-row pair list) — the
    same grouped-expansion discipline as dedup.posting_pairs, bounded
    by the per-order line cap (TPC-H ≤ 7 lines ⇒ ≤ 21 pairs/order), so
    at 100 TB it is one orderkey shuffle + one pair-count aggregate
    where the naive self-join re-shuffles the posting stream twice.
    The oracle keeps the literal self-join to pin the equivalence.
    Lift divides exact integer counts — deterministic; top-20 frontier
    tie-broken by (pa, pb)."""
    # Round-14: same single-row-group scan fix as the graph edge build
    # (guide §2.5) — the per-order collect_set's map-side half ran on
    # one core; no-op at scale.
    l = ensure_min_parallelism(
        load_table(spark, sf_dir, "lineitem"), spark, "l_orderkey"
    )
    # Round-13 (guide §2.4 / §1.2(1)): the former po.distinct() shared
    # by three consumers cost a full (orderkey, partkey) shuffle AND
    # re-ran scan+distinct once per consumer. collect_set dedups per
    # order (so per_order needs no distinct pre-pass), and the other
    # two consumers derive from per_order itself: exploding the sorted
    # part sets re-yields each (order, part) exactly once for the
    # per-part order counts, and the order total is per_order's row
    # count (every lineitem order has >= 1 part). ONE orderkey shuffle
    # + a lazy checkpoint replace 3 scan+distinct executions.
    per_order = (
        l.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .transform(lambda df: spill_checkpoint(df, eager=False))
    )
    ps = F.col("ps")
    pair_list = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.size(ps)),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    cnt = (
        per_order.select(F.explode(pair_list).alias("p"))
        .select(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    pc = (
        per_order.select(F.explode(ps).alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_ord"))
    )
    tot = per_order.agg(F.count(F.lit(1)).alias("n"))
    ca = pc.select(F.col("l_partkey").alias("ka"), F.col("n_ord").alias("na"))
    cb = pc.select(F.col("l_partkey").alias("kb"), F.col("n_ord").alias("nb"))
    return (
        cnt.join(ca, F.col("pa") == F.col("ka"))
        .join(cb, F.col("pb") == F.col("kb"))
        .join(F.broadcast(tot))
        .select(
            "pa",
            "pb",
            "n_co",
            F.round(
                F.col("n_co") * F.lit(1.0) * F.col("n") / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_co"), F.asc("pa"), F.asc("pb"))
        .limit(BASKET_TOP)
    )


# ---------------------------------------------------------------------------
# analytic window-function matrix completion
# ---------------------------------------------------------------------------

_WINDOW_ANALYTICS_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(first_value(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER w AS DOUBLE) AS first_price,
       CAST(nth_value(CAST(o_totalprice AS DECIMAL(18,2)), 2)
            OVER w AS DOUBLE) AS second_price,
       CAST(lead(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER w AS DOUBLE) AS next_price,
       round(cume_dist() OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey
       ), 6) AS price_cume
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
"""


@register("orders_window_analytics", oracle=_WINDOW_ANALYTICS_SQL, tags=("window",))
def orders_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the analytic-function matrix (alongside row_number /
    rank / dense_rank / percent_rank / lag elsewhere): first_value and
    nth_value over an explicit running ROWS frame, lead, and cume_dist
    — each customer's order history annotated with their first and
    second order value, the next order's value, and the cumulative
    price-rank fraction. Both windows share the custkey partitioning
    (one exchange, two sorts); per-partition state is bounded by
    orders-per-customer, so at 100 TB this is one shuffle on a
    high-cardinality key. Every ordering fully tie-broken (orderdate /
    price, then orderkey) and money in DECIMAL so frame contents — and
    therefore first/nth/lead picks — are engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    price = _dec("o_totalprice")
    w_hist = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy("o_custkey").orderBy(
        price.asc(), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first(price).over(w_hist).cast("double").alias("first_price"),
        F.nth_value(price, 2).over(w_hist).cast("double").alias("second_price"),
        F.lead(price).over(
            Window.partitionBy("o_custkey").orderBy(
                F.asc("o_orderdate"), F.asc("o_orderkey")
            )
        ).cast("double").alias("next_price"),
        F.round(F.cume_dist().over(w_rank), 6).alias("price_cume"),
    )


# ---------------------------------------------------------------------------
# NULL-semantics matrix (grouping, counting, and null-safe equality)
# ---------------------------------------------------------------------------

_NULL_AGG_SQL = """
WITH t AS (
  SELECT o_orderkey,
         nullif(o_orderpriority, '3-MEDIUM') AS p,
         nullif(o_custkey % 5, 0) AS b
  FROM orders
)
SELECT p,
       count(*) AS n_rows,
       count(b) AS n_b_nonnull,
       count(DISTINCT b) AS nd_b,
       CAST(sum(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_b_null
FROM t
GROUP BY p
"""


@register("agg_null_semantics", oracle=_NULL_AGG_SQL, tags=("agg",))
def agg_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics matrix for aggregation — the corner every engine
    pair disagrees on somewhere: grouping BY a nullable key (the NULL
    group is a real group in both engines), count(*) vs count(col)
    (the latter skips NULLs), count(DISTINCT col) (NULL never counted),
    and an explicit IS NULL tally. Nullable columns are derived with
    nullif since the synthetic tables ship NULL-free. One map-side
    partial aggregate; nothing here shuffles more than the group
    count."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("p"),
        F.nullif(F.col("o_custkey") % 5, F.lit(0)).alias("b"),
    )
    return t.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("b").alias("n_b_nonnull"),
        F.count_distinct("b").alias("nd_b"),
        F.sum(F.when(F.col("b").isNull(), 1).otherwise(0)).alias("n_b_null"),
    )


_NULL_JOIN_SQL = """
WITH a AS (
  SELECT doc_id, nullif(lang, 'en') AS k FROM documents WHERE doc_id < 50
),
b AS (
  SELECT doc_id, nullif(lang, 'en') AS k FROM documents
  WHERE doc_id >= 50 AND doc_id < 200
)
SELECT 'null_safe' AS op, count(*) AS n_matched
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
UNION ALL
SELECT 'plain' AS op, count(*) AS n_matched
FROM a JOIN b ON a.k = b.k
"""


@register("join_null_safe", oracle=_NULL_JOIN_SQL, tags=("join",))
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM) vs plain
    equality on a nullable key: the null-safe form matches NULL to NULL
    (so the NULL partitions join each other), the plain form drops every
    NULL row from both sides — the difference IS the query's output.
    Spark plans <=> as an ordinary hash join (null-safe keys hash like
    values); nothing degenerates to a nested loop (plan-contract
    CartesianProduct ban applies here like everywhere)."""
    d = load_table(spark, sf_dir, "documents")
    k = F.nullif(F.col("lang"), F.lit("en"))
    a = d.filter(F.col("doc_id") < 50).select(k.alias("ka"))
    b = d.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 200)).select(
        k.alias("kb")
    )
    safe = a.join(b, F.col("ka").eqNullSafe(F.col("kb"))).agg(
        F.count(F.lit(1)).alias("n_matched")
    ).select(F.lit("null_safe").alias("op"), "n_matched")
    plain = a.join(b, F.col("ka") == F.col("kb")).agg(
        F.count(F.lit(1)).alias("n_matched")
    ).select(F.lit("plain").alias("op"), "n_matched")
    return safe.unionAll(plain)


# ---------------------------------------------------------------------------
# data-quality constraint checks (the DQ gate of a pipeline)
# ---------------------------------------------------------------------------

_DQ_SQL = """
SELECT 'lineitem_orphan_orderkey' AS rule,
       CAST(count(*) AS BIGINT) AS n_violations
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_orphan_custkey',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders_nonpositive_price',
       CAST(count(*) AS BIGINT)
FROM orders WHERE o_totalprice <= 0
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_discount < 0 OR l_discount > 1
UNION ALL
SELECT 'events_ts_out_of_range',
       CAST(count(*) AS BIGINT)
FROM events WHERE ts < TIMESTAMP '1990-01-01' OR ts > TIMESTAMP '2035-01-01'
UNION ALL
SELECT 'documents_nchars_mismatch',
       CAST(count(*) AS BIGINT)
FROM documents WHERE n_chars <> length(text)
"""


@register("dq_constraint_checks", oracle=_DQ_SQL, tags=("agg", "join"))
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate: one row per constraint with its
    violation count — referential integrity as LEFT-ANTI joins (the
    scalable FK check: both sides shuffle on the key once; no
    row-at-a-time lookups), domain ranges and a derived-column
    consistency check as map-side predicates. A real pipeline runs this
    between landing and promotion and fails the batch on any non-zero
    row; at 100 TB every rule here is one scan + at most one keyed
    shuffle, and rules over the same table share the scan via plan
    reuse. (The synthetic tables are expected to be clean — the SHAPE
    of the checks is the operator; the n_chars rule is a genuine
    derived-column invariant of the fixture generator.)"""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")

    def one(rule: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(rule).alias("rule"), "n_violations"
        )

    checks = [
        one(
            "lineitem_orphan_orderkey",
            l.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"),
        ),
        one(
            "orders_orphan_custkey",
            o.join(c, F.col("o_custkey") == F.col("c_custkey"), "left_anti"),
        ),
        one("orders_nonpositive_price", o.filter(F.col("o_totalprice") <= 0)),
        one(
            "lineitem_discount_range",
            l.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
        ),
        one(
            "events_ts_out_of_range",
            ev.filter(
                (F.col("ts") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("ts") > F.lit("2035-01-01").cast("timestamp"))
            ),
        ),
        one(
            "documents_nchars_mismatch",
            d.filter(F.col("n_chars") != F.length("text")),
        ),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionAll(chk)
    return out


# ---------------------------------------------------------------------------
# k-anonymity audit (Sweeney 2002) — the privacy face of the DQ gate
# ---------------------------------------------------------------------------

KANON_K = 5              # the k in k-anonymity
KANON_BUCKET_CENTS = 100_000   # quasi-identifier balance bucket: $1000
# c_acctbal >= -1000.00, so offsetting cents by 1e7 keeps every bucket
# argument positive — integer division then agrees between Spark's
# `div` (truncates toward zero) and DuckDB's `//` (floors), which
# diverge on negatives.
_KANON_OFFSET = 10_000_000

_KANON_SQL = f"""
WITH classes AS (
  SELECT c_mktsegment, c_nationkey,
         (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           + {_KANON_OFFSET})
           // {KANON_BUCKET_CENTS} AS bal_bucket,
         CAST(count(*) AS BIGINT) AS k
  FROM customer GROUP BY 1, 2, 3
)
SELECT c_mktsegment,
       CAST(sum(k) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(sum(CASE WHEN k < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_k,
       CAST(sum(CASE WHEN k < {KANON_K} THEN k ELSE 0 END) AS BIGINT)
         AS rows_below_k,
       CAST((sum(CASE WHEN k < {KANON_K} THEN k ELSE 0 END) * 1000000)
            // sum(k) AS BIGINT) AS risk_ppm
FROM classes GROUP BY c_mktsegment
"""


@register("dq_k_anonymity", oracle=_KANON_SQL, tags=("relational", "agg"))
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the customer
    quasi-identifier tuple (nation, market segment, $1000 balance
    bucket): an equivalence class smaller than KANON_K rows means
    those customers are re-identifiable by joining the QI against an
    external dataset — the audit a privacy review runs before a table
    ships to analysts. Per segment: row/class counts, the smallest
    class (k_min — the table's k-anonymity level), and the count and
    ppm share of rows sitting in sub-k classes.

    Determinism: the balance bucket is pure integer arithmetic on
    rounded cents (offset positive so trunc-vs-floor integer division
    agrees cross-engine — see _KANON_OFFSET); risk_ppm is an integer
    division. Scale shape: ONE hash-agg over the QI tuple (map-side
    partials collapse the table to |classes| rows) followed by a tiny
    per-segment re-agg — the same double-agg discipline as
    profile_key_skew; no joins, no window, 100 TB-safe by
    construction."""
    c = load_table(spark, sf_dir, "customer")
    # cents via the DECIMAL(18,2) cast (_dec discipline), not
    # round(double * 100): half-up vs half-even rounding is the one
    # documented cross-engine trap on exact-.5 doubles (round-8 ADVICE)
    bucket = F.expr(
        f"(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
        f" + {_KANON_OFFSET})"
        f" div {KANON_BUCKET_CENTS}"
    )
    classes = c.groupBy(
        "c_mktsegment", "c_nationkey", bucket.alias("bal_bucket")
    ).agg(F.count(F.lit(1)).alias("k"))
    below = F.when(F.col("k") < KANON_K, F.col("k")).otherwise(F.lit(0))
    return classes.groupBy("c_mktsegment").agg(
        F.sum("k").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("k").alias("k_min"),
        F.sum(F.when(F.col("k") < KANON_K, 1).otherwise(0)).alias(
            "classes_below_k"
        ),
        F.sum(below).alias("rows_below_k"),
        F.expr(
            f"(sum(CASE WHEN k < {KANON_K} THEN k ELSE 0 END) * 1000000)"
            " div sum(k)"
        ).alias("risk_ppm"),
    )


# ---------------------------------------------------------------------------
# Benford's-law first-digit audit (Newcomb 1881, Benford 1938) — the
# fraud/synthetic-data screen beside the k-anonymity privacy audit
# ---------------------------------------------------------------------------

_BENFORD_SQL = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM digits)
SELECT d.digit,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST((count(*) * 1000000) // t.n AS BIGINT) AS share_ppm,
       CAST(round(ln((d.digit + 1) * 1.0 / d.digit) / ln(10) * 1000000)
            AS BIGINT) AS benford_ppm,
       CAST((count(*) * 1000000) // t.n
            - round(ln((d.digit + 1) * 1.0 / d.digit) / ln(10) * 1000000)
            AS BIGINT) AS delta_ppm
FROM digits d, tot t
GROUP BY d.digit, t.n
"""


@register("dq_benford_first_digit", oracle=_BENFORD_SQL, tags=("relational", "agg"))
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals —
    the classic screen for fabricated or synthetically-generated
    amounts (real multiplicative-process data follows
    P(d) = log10(1 + 1/d); uniform generators don't). One row per
    digit with the observed count, observed share, the Benford
    expectation, and the deviation, all in integer ppm.

    Determinism: the first digit comes from the STRING of the exact
    DECIMAL(18,2)-cast cents integer (no float log10 thresholding at
    power-of-ten boundaries, and no half-up-vs-half-even round(double)
    ambiguity — the decimal cast quantizes identically in both engines
    before any digit is read); shares are integer floor
    divisions; the Benford expectation is one ln ratio per digit
    (the established single-expression ln discipline). TPC-H-style
    uniform prices should FAIL this audit — the interesting output is
    the delta column, not a pass flag.

    Scale shape: one narrow scan + one 9-key hash-agg with map-side
    partials, plus a broadcast total scalar. Nothing to optimize at
    any scale."""
    o = load_table(spark, sf_dir, "orders")
    # cents via the DECIMAL(18,2) cast (_dec discipline) — see
    # dq_k_anonymity's bucket note on the round(double*100) trap
    digit = F.substring(
        (_dec("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    digits = o.filter(F.col("o_totalprice") > 0).select(digit.alias("digit"))
    tot = digits.agg(F.count(F.lit(1)).alias("n"))
    benford_ppm = F.round(
        F.log((F.col("digit") + 1) * 1.0 / F.col("digit")) / F.log(F.lit(10.0))
        * 1_000_000
    ).cast("bigint")
    return (
        digits.crossJoin(F.broadcast(tot))
        .groupBy("digit", "n")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            F.expr("(n_orders * 1000000) div n").alias("share_ppm"),
            benford_ppm.alias("benford_ppm"),
            (
                F.expr("(n_orders * 1000000) div n") - benford_ppm
            ).alias("delta_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# pagination (LIMIT + OFFSET) and value-based numeric RANGE frames
# ---------------------------------------------------------------------------

PAGE_SIZE = 20

_PAGE_SQL = f"""
SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM orders
ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
LIMIT {PAGE_SIZE} OFFSET {PAGE_SIZE}
"""


@register("orders_page_offset", oracle=_PAGE_SQL, tags=("sort", "topk"))
def orders_page_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: the SECOND page of the price-ranked order list
    (LIMIT with OFFSET — the one sort/limit shape the suite didn't yet
    pin). Spark plans offset+limit together as a single
    TakeOrderedAndProject-style frontier of OFFSET+LIMIT rows (tiny),
    never a global sort; at scale pagination deeper than a few pages
    should switch to keyset pagination (WHERE price < last_seen), which
    is what the fully tie-broken ordering here makes possible. DECIMAL
    ordering keeps both page boundaries engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    price = _dec("o_totalprice")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            price.alias("price_d"),
        )
        .orderBy(F.desc("price_d"), F.asc("o_orderkey"))
        .offset(PAGE_SIZE)
        .limit(PAGE_SIZE)
        .select(
            "o_orderkey", "o_custkey", F.col("price_d").cast("double").alias("price")
        )
    )


_KEYSET_SQL = f"""
WITH cur AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS cp, o_orderkey AS ck
  FROM orders
  ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
  LIMIT 1 OFFSET {PAGE_SIZE - 1}
)
SELECT o_orderkey, o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM orders, cur
WHERE CAST(o_totalprice AS DECIMAL(18,2)) < cur.cp
   OR (CAST(o_totalprice AS DECIMAL(18,2)) = cur.cp AND o_orderkey > cur.ck)
ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
LIMIT {PAGE_SIZE}
"""


@register("orders_page_keyset", oracle=_KEYSET_SQL, tags=("sort", "topk"))
def orders_page_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET (seek) pagination — the deep-page shape
    orders_page_offset's docstring promises: instead of an
    OFFSET+LIMIT frontier (whose per-partition heaps hold
    OFFSET+LIMIT rows — the known deep-page killer once OFFSET is
    page_n * PAGE_SIZE), the client carries the fully-tie-broken
    cursor of the last row it saw and the next page is
    WHERE (price, key) AFTER cursor ORDER BY ... LIMIT PAGE_SIZE —
    cost O(PAGE_SIZE) per page at ANY depth. Here the cursor (the
    PAGE_SIZE-th row) is derived in-query so the result provably
    equals offset-pagination's page 2: a TakeOrderedAndProject top-K
    reduced to its last row (max of the inverted sort struct), then a
    one-row broadcast into the scan-side filter.

    Scale shape: BOTH the cursor derivation and the page fetch are
    TakeOrderedAndProject (per-partition K-row heaps + driver merge,
    no rangepartitioning exchange anywhere — contract-pinned); the
    cursor rides a BroadcastNestedLoopJoin of one row, and at page N
    the fetch-side predicate prunes everything above the cursor at
    the scan (a real deployment additionally gets parquet min/max
    pruning on the sort column). DECIMAL keys keep both the cursor
    row and the page boundary engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    price = _dec("o_totalprice")
    base = o.select(
        "o_orderkey", "o_custkey", price.alias("price_d")
    )
    top = base.orderBy(F.desc("price_d"), F.asc("o_orderkey")).limit(PAGE_SIZE)
    cur = top.agg(
        F.max(F.struct((-F.col("price_d")).alias("np"), F.col("o_orderkey"))).alias(
            "c"
        )
    ).select((-F.col("c.np")).alias("cp"), F.col("c.o_orderkey").alias("ck"))
    after = (F.col("price_d") < F.col("cp")) | (
        (F.col("price_d") == F.col("cp")) & (F.col("o_orderkey") > F.col("ck"))
    )
    return (
        base.crossJoin(F.broadcast(cur))
        .filter(after)
        .orderBy(F.desc("price_d"), F.asc("o_orderkey"))
        .limit(PAGE_SIZE)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("price_d").cast("double").alias("price"),
        )
    )


PRICE_BAND = 100

_PRICE_RANGE_SQL = f"""
SELECT o_orderkey, o_custkey,
       CAST(count(*) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
         RANGE BETWEEN {PRICE_BAND} PRECEDING AND {PRICE_BAND} FOLLOWING
       ) AS BIGINT) AS n_similar_price
FROM orders
WHERE o_custkey < 200
"""


@register("orders_price_range_frame", oracle=_PRICE_RANGE_SQL, tags=("window",))
def orders_price_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based numeric RANGE frame (the non-temporal sibling of
    events_rolling_1h's time RANGE): for each order, how many of the
    same customer's orders are priced within ±PRICE_BAND of it. The
    frame is defined by the ORDER-BY VALUE, not row positions, so ties
    need no tie-break — every row with the same price sees the same
    frame — and DECIMAL ordering makes the band edges engine-exact.
    One shuffle on custkey; per-partition state is a sliding window
    over the customer's sorted prices."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    price = _dec("o_totalprice")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(price)
        .rangeBetween(-PRICE_BAND, PRICE_BAND)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    )


# ---------------------------------------------------------------------------
# ordered string aggregation (roster strings per group)
# ---------------------------------------------------------------------------

ROSTER_K = 3

_ROSTER_SQL = f"""
WITH ranked AS (
  SELECT n_name, c_name, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         row_number() OVER (
           PARTITION BY c_nationkey
           ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_name
         ) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, count(*) AS n_listed,
       string_agg(c_name, ',' ORDER BY bal DESC, c_name) AS roster
FROM ranked WHERE rn <= {ROSTER_K}
GROUP BY n_name
"""


@register("nation_top_customer_roster", oracle=_ROSTER_SQL, tags=("agg", "window"))
def nation_top_customer_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — the report-rendering aggregate the
    suite didn't yet pin: each nation's top-ROSTER_K customers by
    balance, joined into ONE ordered comma string (DuckDB string_agg
    with ORDER BY ≡ Spark sort_array(collect_list(struct)) + transform
    + concat_ws — Spark has no ordered string_agg, so the deterministic
    ordering rides a sortable struct key: negated DECIMAL balance then
    name, both exact). WindowGroupLimit prunes to K rows per nation
    before any aggregation; the roster list per group is bounded by K,
    so collect_list state is O(K) — the always-bounded form of the
    otherwise dangerous collect aggregate."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    bal = _dec("c_acctbal")
    w = Window.partitionBy("c_nationkey").orderBy(bal.desc(), F.asc("c_name"))
    ranked = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ROSTER_K)
    )
    key = F.struct((-bal).alias("negbal"), F.col("c_name").alias("name"))
    return ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_listed"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(key)), lambda s: s["name"]
            ),
        ).alias("roster"),
    )


# ---------------------------------------------------------------------------
# fact-to-SCD2-dimension temporal join (price-in-effect revenue)
# ---------------------------------------------------------------------------

SCD2_DIM_CUTOFF = "1998-01-01"   # every 3rd part re-prices here (+10%)
SCD2_DIM_MIN = "1990-01-01"
SCD2_DIM_OPEN = "9999-01-01"


def scd2_part_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic two-version part-price dimension
    (p_partkey, price_cents, valid_from, valid_to): every 3rd part
    re-prices +10% (integer cents, (c*110) div 100) at the cutoff.
    Shared by join_scd2_dimension and the streaming enrichment twin
    (tests/test_streaming.py), so batch and stream join the SAME
    versioned frame."""
    p = load_table(spark, sf_dir, "part")
    c0 = F.round(F.col("p_retailprice") * 100).cast("long")
    ts = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    base = p.select(
        "p_partkey",
        c0.alias("price_cents"),
        ts(SCD2_DIM_MIN).alias("valid_from"),
        F.when(F.col("p_partkey") % 3 == 0, ts(SCD2_DIM_CUTOFF))
        .otherwise(ts(SCD2_DIM_OPEN))
        .alias("valid_to"),
    )
    reprices = (
        p.filter(F.col("p_partkey") % 3 == 0)
        .select(
            "p_partkey",
            F.expr(
                "CAST(CAST(round(p_retailprice * 100) AS BIGINT) * 110 div 100 AS BIGINT)"
            ).alias("price_cents"),
            ts(SCD2_DIM_CUTOFF).alias("valid_from"),
            ts(SCD2_DIM_OPEN).alias("valid_to"),
        )
    )
    return base.unionByName(reprices)

_SCD2_DIM_SQL = f"""
WITH cents AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS c0
  FROM part
),
dim AS (
  SELECT p_partkey, c0 AS price_cents,
         TIMESTAMP '{SCD2_DIM_MIN}' AS valid_from,
         CASE WHEN p_partkey % 3 = 0 THEN TIMESTAMP '{SCD2_DIM_CUTOFF}'
              ELSE TIMESTAMP '{SCD2_DIM_OPEN}' END AS valid_to
  FROM cents
  UNION ALL
  SELECT p_partkey, (c0 * 110) // 100,
         TIMESTAMP '{SCD2_DIM_CUTOFF}', TIMESTAMP '{SCD2_DIM_OPEN}'
  FROM cents WHERE p_partkey % 3 = 0
)
SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l.l_quantity) AS BIGINT) * d.price_cents) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN dim d ON d.p_partkey = l.l_partkey
          AND d.valid_from <= l.l_shipdate AND l.l_shipdate < d.valid_to
GROUP BY 1
"""


@register("join_scd2_dimension", oracle=_SCD2_DIM_SQL, tags=("join", "warehouse"))
def join_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse temporal join the SCD2 fold exists to serve: each
    fact row (lineitem) joins the dimension VERSION valid at its event
    time — revenue priced at the price in effect on the ship date,
    across a deterministic two-version dimension (every 3rd part
    re-prices +10% at the cutoff). Distinct from join_asof (nearest
    previous event) and corpus_scd2_as_of (one global AS-OF instant):
    here every fact row carries its own AS-OF point.

    Exactness: prices in integer cents ((c*110) div 100 for the new
    version), quantities floored to BIGINT, revenue an exact integer
    sum — both engines bit-identical.

    Scale shape: a keyed equi-join on partkey with the validity
    interval as a post-join filter — per fact row the join fans out to
    that key's VERSION COUNT (bounded by re-price frequency, ~2 here),
    then the filter keeps exactly one; the classic fact-to-dimension
    temporal join plan (at 100 TB the dim side is orders of magnitude
    smaller and broadcast or shuffled keyed — never a range
    cross-product). One hash-aggregate on ship_year afterwards."""
    li = load_table(spark, sf_dir, "lineitem")
    dim = scd2_part_dim(spark, sf_dir)
    j = (
        li.select("l_partkey", "l_shipdate", "l_quantity")
        .join(dim, F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.col("valid_from") <= F.col("l_shipdate"))
            & (F.col("l_shipdate") < F.col("valid_to"))
        )
    )
    qty = F.floor(F.col("l_quantity")).cast("long")
    return j.groupBy(F.year("l_shipdate").cast("long").alias("ship_year")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(qty * F.col("price_cents")).alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# the five remaining TPC-H shapes (Q2/Q9/Q11/Q16/Q20), completed on a
# DERIVED supplier-part catalog: the driver provisions no partsupp
# table, so ps_supplycost / ps_availqty are derived deterministically
# from lineitem (min unit price in integer cents; total shipped
# quantity) — the SHAPES (correlated-min subquery, profit expression,
# HAVING-vs-scalar-subquery, NOT IN + count distinct, doubly-nested IN
# with a correlated aggregate threshold) are the point, and the
# integer-cents units keep every comparison engine-exact.
# ---------------------------------------------------------------------------

_SPCAT_SQL = """spcat AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)
             // CAST(floor(l_quantity) AS BIGINT)) AS ps_supplycost_cents,
         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)"""


def _spcat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived supplier-part catalog (== the oracle's spcat CTE)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("ec"),
            F.floor("l_quantity").cast("long").alias("q"),
        )
        .withColumn("unit", F.expr("ec div q"))
        .groupBy("ps_partkey", "ps_suppkey")
        .agg(
            F.min("unit").alias("ps_supplycost_cents"),
            F.sum("q").alias("ps_availqty"),
        )
    )


Q2_SIZE = 15
Q2_TYPE = "SMALL"
Q2_REGION = "ASIA"

_Q2_SQL = f"""
WITH {_SPCAT_SQL},
rs AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
),
rcat AS (
  SELECT ps.ps_partkey, ps.ps_supplycost_cents, rs.s_name, rs.s_acctbal, rs.n_name
  FROM spcat ps JOIN rs ON ps.ps_suppkey = rs.s_suppkey
)
SELECT r.s_acctbal, r.s_name, r.n_name, p.p_partkey, r.ps_supplycost_cents AS cost_cents
FROM part p JOIN rcat r ON p.p_partkey = r.ps_partkey
WHERE p.p_size = {Q2_SIZE} AND p.p_type = '{Q2_TYPE}'
  AND r.ps_supplycost_cents = (
    SELECT min(r2.ps_supplycost_cents) FROM rcat r2
    WHERE r2.ps_partkey = p.p_partkey)
ORDER BY r.s_acctbal DESC, r.n_name, r.s_name, p.p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=_Q2_SQL, tags=("join", "subquery"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for parts of one size/type, the supplier(s)
    achieving the MINIMUM regional supply cost — the classic
    correlated-min-equality subquery over a 4-way dim join. The oracle
    keeps the literal correlated subquery; the Spark plan decorrelates
    it the way Catalyst's rewrite would: a per-part min window over the
    regional catalog, then an equality filter — one extra window over
    a frame already partitioned by part, no second scan of the
    catalog. LIMIT rides a fully tie-broken ORDER BY
    (TakeOrderedAndProject, no global sort)."""
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rs = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r.filter(F.col("r_name") == Q2_REGION), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    rcat = _spcat(spark, sf_dir).join(
        F.broadcast(rs), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("ps_partkey")
    best = rcat.withColumn(
        "min_cost", F.min("ps_supplycost_cents").over(w)
    ).filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
    return (
        p.filter((F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE))
        .join(best, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("ps_supplycost_cents").alias("cost_cents"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q9_TOKEN = "red"

_Q9_SQL = f"""
WITH {_SPCAT_SQL}
SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                - ps.ps_supplycost_cents
                  * CAST(floor(l.l_quantity) AS BIGINT) * 100) AS BIGINT)
         AS profit_u
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN spcat ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
WHERE p.p_name LIKE '%{Q9_TOKEN}%'
GROUP BY 1, 2
"""


@register("q9_product_profit", oracle=_Q9_SQL, tags=("join", "agg"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line (parts whose name
    carries a token) per supplier nation per year — the 5-way join
    with a compound profit expression. Units are exact integers
    (cents x percent for revenue, cost scaled to match), so the sum is
    order-free and bit-identical across engines. Scale shape: the
    part-name filter prunes BEFORE the joins (pushed to the part
    scan), supplier/nation broadcast, the catalog joins keyed on
    (part, supp); one (nation, year) hash-aggregate at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains(Q9_TOKEN))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            _spcat(spark, sf_dir),
            (li.l_partkey == F.col("ps_partkey")) & (li.l_suppkey == F.col("ps_suppkey")),
        )
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    cost = F.col("ps_supplycost_cents") * F.floor("l_quantity").cast("long") * 100
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("l_shipdate").cast("long").alias("o_year"),
    ).agg(F.sum(rev - cost).alias("profit_u"))


Q11_NATION = "NATION_3"
Q11_FRACTION_DEN = 1000   # keep parts holding > 1/1000 of national value

_Q11_SQL = f"""
WITH {_SPCAT_SQL},
nat AS (
  SELECT ps.ps_partkey, ps.ps_supplycost_cents * ps.ps_availqty AS v
  FROM spcat ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{Q11_NATION}'
)
SELECT ps_partkey AS part, CAST(sum(v) AS BIGINT) AS value_u
FROM nat
GROUP BY 1
HAVING sum(v) * {Q11_FRACTION_DEN} > (SELECT sum(v) FROM nat)
"""


@register("q11_important_stock", oracle=_Q11_SQL, tags=("agg", "subquery"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's stock value — group-by HAVING against a scalar subquery
    over the SAME derived frame. Spark plan: the national catalog is
    checkpoint-free but single-derived (one keyed join chain), the
    total is a one-row broadcast crossed onto the per-part aggregate,
    and the share test is exact integer (value x 1000 > total). The
    oracle keeps the literal HAVING-subquery form."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    nat = (
        _spcat(spark, sf_dir)
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                          .select("s_suppkey")),
              F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = nat.groupBy(F.col("ps_partkey").alias("part")).agg(
        F.sum("v").alias("value_u")
    )
    total = nat.agg(F.sum("v").alias("tot"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_u") * Q11_FRACTION_DEN > F.col("tot"))
        .select("part", "value_u")
    )


Q16_EXCL_BRAND = "Brand#9"
Q16_EXCL_TYPE_PREFIX = "ECONOMY"
Q16_SIZES = (1, 4, 7, 10, 15, 22, 36, 49)

_Q16_SQL = f"""
WITH {_SPCAT_SQL}
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM spcat ps JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
  AND p.p_type NOT LIKE '{Q16_EXCL_TYPE_PREFIX}%'
  AND p.p_size IN ({', '.join(str(x) for x in Q16_SIZES)})
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


@register("q16_supplier_counts", oracle=_Q16_SQL, tags=("agg", "subquery"))
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type,
    size) bucket, excluding a brand, a type prefix, and a denylisted
    supplier set (negative account balance standing in for Q16's
    complaint-comment scan — no comment column exists) — the NOT IN +
    count(DISTINCT) taxonomy entry. Spark expresses NOT IN as a
    left-anti join (null-safe here: keys are non-null), keeps the
    part-side predicates on the scan, and lets the distinct-count
    aggregate partial map-side."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (~F.col("p_type").startswith(Q16_EXCL_TYPE_PREFIX))
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    deny = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("ps_suppkey"))
    return (
        _spcat(spark, sf_dir)
        .join(F.broadcast(deny), "ps_suppkey", "left_anti")
        .join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


Q20_NATION = "NATION_5"
Q20_NAME_PREFIX = "small"
Q20_YEAR = 1997
Q20_SHARE_NUM = 4   # keep (part, supp) whose 1997 demand x 4 > all-time

_Q20_SQL = f"""
WITH {_SPCAT_SQL}
SELECT s.s_name, s.s_acctbal
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = '{Q20_NATION}'
  AND s.s_suppkey IN (
    SELECT ps.ps_suppkey FROM spcat ps
    WHERE ps.ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%')
      AND (SELECT CAST(coalesce(sum(CAST(floor(l.l_quantity) AS BIGINT)), 0) AS BIGINT)
           FROM lineitem l
           WHERE l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
             AND l.l_shipdate >= TIMESTAMP '{Q20_YEAR}-01-01'
             AND l.l_shipdate < TIMESTAMP '{Q20_YEAR + 1}-01-01')
          * {Q20_SHARE_NUM} > ps.ps_availqty
  )
ORDER BY s.s_name
"""


@register("q20_recent_demand_suppliers", oracle=_Q20_SQL, tags=("join", "subquery"))
def q20_recent_demand_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation holding a filtered
    part whose RECENT demand dominates its history (1997 shipments x 4
    exceed all-time — the direction is surrogate for Q20's excess-
    stock test, the doubly-nested IN with a correlated aggregate
    threshold is the shape). Spark decorrelates the inner aggregate
    the standard way: pre-aggregate the year's shipments per
    (part, supp), join onto the catalog, compare exact integers; both
    IN subqueries become keyed semi-joins. The oracle keeps the
    literal nested-IN + correlated-subquery text."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    ).select(F.col("p_partkey").alias("ps_partkey"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == Q20_NATION)
    y97 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(f"{Q20_YEAR}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{Q20_YEAR + 1}-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.sum(F.floor("l_quantity").cast("long")).alias("qty_y"))
    )
    hot = (
        _spcat(spark, sf_dir)
        .join(p, "ps_partkey", "leftsemi")
        .join(y97, ["ps_partkey", "ps_suppkey"], "left")
        .filter(
            F.coalesce(F.col("qty_y"), F.lit(0)) * Q20_SHARE_NUM
            > F.col("ps_availqty")
        )
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(hot, F.col("s_suppkey") == F.col("ps_suppkey"), "leftsemi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# join-key skew diagnostics (run BEFORE you shuffle 100 TB on a key)
# ---------------------------------------------------------------------------

SKEW_TOP = 10

_SKEW_SQL = f"""
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows FROM c)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS BIGINT) AS rank,
         user_id, cnt,
         cnt * 1000000 // t.n_rows AS share_ppm,
         (cnt * t.n_keys * 1000000) // t.n_rows AS hot_ratio_ppm,
         t.n_rows, t.n_keys
  FROM c, t
) WHERE rank <= {SKEW_TOP}
"""


@register("profile_key_skew", oracle=_SKEW_SQL, tags=("agg", "relational"))
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the profiling pass a 100 TB
    pipeline runs BEFORE shuffling on a key (join_skew_salted is the
    remedy; this is the instrument that tells you whether you need
    it): per-key frequency tally, then the SKEW_TOP hottest keys with
    integer-exact shares — share_ppm (key's fraction of all rows, in
    parts per million) and hot_ratio_ppm (key count over the MEAN key
    count, in ppm — 1_000_000 means perfectly uniform; a straggler
    task at ratio R takes ~R× the mean task's time, so this column IS
    the salting-factor estimate).

    Scale shape: one map-side-partial hash-agg over the fact table
    (the only pass over data), a 1-row totals frame broadcast back,
    global top-k via TakeOrderedAndProject (per-partition heaps, no
    global sort), and the rank window runs AFTER the limit — over
    SKEW_TOP rows, never the key space. All ratios are BIGINT
    divisions — exact cross-engine."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("n_rows")
    )
    top = (
        c.crossJoin(F.broadcast(t))
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(SKEW_TOP)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("user_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(
            "rank",
            "user_id",
            "cnt",
            F.expr("cnt * 1000000 div n_rows").alias("share_ppm"),
            F.expr("(cnt * n_keys * 1000000) div n_rows").alias("hot_ratio_ppm"),
            "n_rows",
            "n_keys",
        )
    )


# ---------------------------------------------------------------------------
# interval overlap timeline (boundary sweep, no interval self-join)
# ---------------------------------------------------------------------------

_OVERLAP_SQL = """
WITH iv AS (
  SELECT l.l_suppkey AS suppkey, o.o_orderdate AS lo, l.l_shipdate AS hi
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
bounds AS (
  SELECT suppkey, lo AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT suppkey, hi + INTERVAL 1 DAY, -1 FROM iv
),
daily AS (
  SELECT suppkey, CAST(d AS DATE) AS d, CAST(sum(delta) AS BIGINT) AS delta
  FROM bounds GROUP BY 1, 2
),
runs AS (
  SELECT suppkey, d, delta,
         sum(delta) OVER (PARTITION BY suppkey ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run,
         lead(d) OVER (PARTITION BY suppkey ORDER BY d) AS nxt
  FROM daily
),
peaked AS (
  SELECT suppkey, d, run, nxt,
         max(run) OVER (PARTITION BY suppkey) AS peak
  FROM runs
)
SELECT suppkey,
       CAST(max(peak) AS BIGINT) AS peak_concurrent,
       min(CASE WHEN run = peak THEN d END) AS first_peak_date,
       CAST(sum(CASE WHEN run > 0 AND nxt IS NOT NULL
                     THEN date_diff('day', d, nxt) ELSE 0 END) AS BIGINT)
         AS covered_days
FROM peaked GROUP BY suppkey
"""


@register("supplier_shipment_overlap", oracle=_OVERLAP_SQL, tags=("temporal", "relational"))
def supplier_shipment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap timeline per supplier — the boundary-sweep
    primitive behind "how many X are active at time t" questions
    (concurrent open order-lines here — ordered but not yet shipped;
    concurrent sessions, leases, or training jobs elsewhere): each
    [order date, ship date] interval becomes a
    +1/-1 boundary pair, a per-key running sum walks the merged
    boundary timeline, and the flattened disjoint segments yield the
    peak concurrency, its first date, and total covered days — WITHOUT
    ever joining intervals against intervals.

    Scale shape: the naive formulation is an interval self-join
    (O(n^2) per key and a NestedLoop plan — forbidden here by the
    global contract); the sweep is 2 boundary rows per interval, ONE
    hash-agg collapsing same-day boundaries, and one partitioned
    window pass (per-supplier state only). Dates stay DATE-typed
    integers end to end — no float, engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    iv = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("o_orderdate").alias("lo"),
        F.col("l_shipdate").alias("hi"),
    )
    bounds = iv.select(
        "suppkey", F.col("lo").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            "suppkey", F.date_add("hi", 1).alias("d"), F.lit(-1).alias("delta")
        )
    )
    daily = bounds.groupBy("suppkey", "d").agg(
        F.sum("delta").cast("bigint").alias("delta")
    )
    w = Window.partitionBy("suppkey").orderBy("d")
    runs = daily.select(
        "suppkey",
        "d",
        F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run"),
        F.lead("d").over(w).alias("nxt"),
    ).withColumn("peak", F.max("run").over(Window.partitionBy("suppkey")))
    return runs.groupBy("suppkey").agg(
        F.max("peak").cast("bigint").alias("peak_concurrent"),
        F.min(F.when(F.col("run") == F.col("peak"), F.col("d"))).alias(
            "first_peak_date"
        ),
        F.sum(
            F.when(
                (F.col("run") > 0) & F.col("nxt").isNotNull(),
                F.datediff("nxt", "d"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("covered_days"),
    )


# ---------------------------------------------------------------------------
# entity resolution (record linkage): dirty catalog -> canonical parts
# ---------------------------------------------------------------------------

ER_OFFSET = 5_000_000  # dirty-record ids = source partkey + offset

# corrupt(x, pk): drop ONE character — position 2..len (1-based), chosen
# by pk — so the first character always survives (the blocking key
# depends on it). Words shorter than 2 chars pass through unchanged.
_ER_CORRUPT = (
    "CASE WHEN length({x}) < 2 THEN {x} ELSE "
    "substr({x}, 1, CAST(1 + pk % (length({x}) - 1) AS INTEGER)) || "
    "substr({x}, CAST(1 + pk % (length({x}) - 1) AS INTEGER) + 2) END"
)

_ER_TRI = (
    "list_distinct(list_transform(range(1, greatest(length({nm}) - 1, 1)), "
    "i -> substr({nm}, CAST(i AS INTEGER), 3)))"
)

_ER_SQL = f"""
WITH pw AS (
  SELECT p_partkey AS pk, string_split(p_name, ' ') AS w FROM part
),
cnames AS (
  SELECT p_name AS cnm, string_split(p_name, ' ') AS w,
         min(p_partkey) AS rep_pk
  FROM part GROUP BY p_name
),
dirty AS (
  SELECT pk + {ER_OFFSET} AS did, pk AS src,
         CASE WHEN pk % 2 = 0
              THEN {_ER_CORRUPT.format(x='w[1]')} || ' ' || w[2]
              ELSE w[1] || ' ' || {_ER_CORRUPT.format(x='w[2]')} END AS dnm,
         CASE WHEN pk % 2 = 0
              THEN [{_ER_CORRUPT.format(x='w[1]')}, w[2]]
              ELSE [w[1], {_ER_CORRUPT.format(x='w[2]')}] END AS dw
  FROM pw
),
dnames AS (
  SELECT dnm, string_split(dnm, ' ') AS dw
  FROM (SELECT DISTINCT dnm FROM dirty)
),
cb AS (
  SELECT cnm, unnest([w[1] || '|' || substr(w[2], 1, 1),
                      w[2] || '|' || substr(w[1], 1, 1)]) AS bg
  FROM cnames
),
db_ AS (
  SELECT dnm, unnest([dw[1] || '|' || substr(dw[2], 1, 1),
                      dw[2] || '|' || substr(dw[1], 1, 1)]) AS bg
  FROM dnames
),
cand AS (
  SELECT DISTINCT d.dnm, c.cnm FROM db_ d JOIN cb c USING (bg)
),
scored AS (
  SELECT dnm, cnm,
         len(list_intersect({_ER_TRI.format(nm='dnm')}, {_ER_TRI.format(nm='cnm')})) * 1.0
           / len(list_distinct(list_concat({_ER_TRI.format(nm='dnm')}, {_ER_TRI.format(nm='cnm')})))
           AS score
  FROM cand
),
best AS (
  SELECT dnm, cnm, score FROM (
    SELECT dnm, cnm, score,
           row_number() OVER (PARTITION BY dnm ORDER BY score DESC, cnm) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT d.did AS dirty_id, cn.rep_pk AS matched_partkey,
       round(b.score, 6) AS score,
       (b.cnm = p2.p_name) AS is_true
FROM dirty d
JOIN best b ON d.dnm = b.dnm
JOIN cnames cn ON b.cnm = cn.cnm
JOIN part p2 ON d.src = p2.p_partkey
"""


def _er_corrupt(x: F.Column, pk: F.Column) -> F.Column:
    dp = (F.lit(1) + pk % (F.length(x) - 1)).cast("int")
    dropped = F.concat(
        x.substr(F.lit(1), dp), x.substr(dp + 2, F.length(x))
    )
    return F.when(F.length(x) < 2, x).otherwise(dropped)


@register("entity_resolve_parts", oracle=_ER_SQL, tags=("relational", "dedup"))
def entity_resolve_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage — the catalog-merge operator
    (dirty product feed -> canonical catalog; metadata reconciliation
    for a training-data registry): a manufactured DIRTY catalog (every
    2-word part name suffers one deterministic character-drop typo in
    one word, never the word's first character — the re-encoded-twin
    discipline applied to records) is matched back to the canonical
    parts by blocking + scoring + best-match selection.

    Shape (the standard sub-quadratic linkage pipeline):
      1. BLOCK on (full word, first char of the other word), both
         orientations — LOSSLESS for this corruption model (one word
         is always intact and the typo never eats a first character),
         and 26x rarer than bare-word blocking, which on a fixed
         product vocabulary degrades to quadratic candidate volume.
      2. SCORE candidates by character-trigram Jaccard over the whole
         name (typo-tolerant where word-equality is not), all inside
         codegen via array intersect/union on distinct trigram sets.
      3. RESOLVE best match per dirty record via a per-key window,
         ties (score DESC, partkey ASC) — WindowGroupLimit prunes
         map-side.
    is_true reports ENTITY-level resolution accuracy: the matched
    record carries the same canonical name as the true source (the
    synthetic catalog reuses names across partkeys, so row-identity
    would punish ties between identical entities — the match is
    correct if it lands on the right NAME). An eval the operator
    carries for free because the corruption is manufactured;
    production linkage reports score distributions instead.
    tests/test_llmprep_properties.py pins the accuracy floor."""
    pw = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        F.col("p_name").alias("nm"),
        F.split("p_name", " ").alias("w"),
    )
    cnames = (
        pw.groupBy(F.col("nm").alias("cnm"))
        .agg(F.min("pk").alias("rep_pk"))
        .withColumn("w", F.split("cnm", " "))
    )
    w1, w2 = F.col("w")[0], F.col("w")[1]
    c1 = _er_corrupt(w1, F.col("pk"))
    c2 = _er_corrupt(w2, F.col("pk"))
    dw = F.when(
        F.col("pk") % 2 == 0, F.array(c1, w2)
    ).otherwise(F.array(w1, c2))
    dirty = pw.select(
        (F.col("pk") + ER_OFFSET).alias("did"),
        F.col("pk").alias("src"),
        F.array_join(dw, " ").alias("dnm"),
    )
    dnames = dirty.select("dnm").distinct().withColumn(
        "dw", F.split("dnm", " ")
    )

    def blocked(df, wcol, name_col):
        a_, b_ = F.col(wcol)[0], F.col(wcol)[1]
        keys = F.array(
            F.concat(a_, F.lit("|"), F.substring(b_, 1, 1)),
            F.concat(b_, F.lit("|"), F.substring(a_, 1, 1)),
        )
        return df.select(name_col, F.explode(keys).alias("bg"))

    cand = (
        blocked(dnames, "dw", "dnm")
        .join(blocked(cnames, "w", "cnm"), "bg")
        .select("dnm", "cnm")
        .distinct()
    )

    def tri(nm: str) -> F.Column:
        c = F.col(nm)
        idx = F.sequence(F.lit(1), F.greatest(F.length(c) - 2, F.lit(1)))
        return F.array_distinct(
            F.transform(idx, lambda i: c.substr(i, F.lit(3)))
        )

    inter = F.size(F.array_intersect(tri("dnm"), tri("cnm")))
    union = F.size(F.array_distinct(F.concat(tri("dnm"), tri("cnm"))))
    scored = cand.select("dnm", "cnm", (inter / union).alias("score"))
    w_best = Window.partitionBy("dnm").orderBy(F.desc("score"), F.asc("cnm"))
    best = (
        scored.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("dnm", "cnm", "score")
    )
    src_names = pw.select(
        F.col("pk").alias("src"), F.col("nm").alias("s_nm")
    )
    return (
        dirty.join(F.broadcast(best), "dnm")
        .join(F.broadcast(cnames.select("cnm", "rep_pk")), "cnm")
        .join(src_names, "src")
        .select(
            F.col("did").alias("dirty_id"),
            F.col("rep_pk").alias("matched_partkey"),
            F.round("score", 6).alias("score"),
            (F.col("cnm") == F.col("s_nm")).alias("is_true"),
        )
    )


HH_K = 50  # Misra-Gries counter budget: error <= n / HH_K


@register("agg_heavyhitters_events", tags=("agg", "approx"))
def agg_heavyhitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries / SpaceSaving heavy hitters — the fourth mergeable
    sketch beside HLL++, the percentile digest and count-min: one
    Arrow-batched pass builds a k-counter Misra-Gries summary PER
    PARTITION (O(1) amortized per element, k counters of state — the
    fixed-size summary is the whole point), the per-key counter sums
    merge associatively, and the merged summary is reduced back to k
    counters by subtracting the (k+1)-th largest combined count
    (Agarwal et al. 2012, "Mergeable Summaries" — the merge that makes
    the sketch distributable). Guarantees, bounded in
    tests/test_approx.py: estimates never exceed the true count,
    undershoot by at most n/k, and every key with true frequency
    > n/k is reported. No DuckDB oracle by construction (sketch
    contents depend on partition layout); the driver records the
    rows-only check, same policy as agg_countmin_events.

    At 100 TB: the summary is k rows per partition regardless of data
    volume, the merge shuffles P*k rows, and the final trim handles a
    frame small enough to collect — the shape of every streaming
    top-k/trending pipeline."""
    from collections.abc import Iterator

    ev = ensure_min_parallelism(load_table(spark, sf_dir, "events"), spark, "event_id").select(
        "event_type"
    )

    def mg(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf["event_type"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < HH_K:
                    counters[v] = 1
                else:
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        yield pd.DataFrame(
            {"event_type": list(counters), "cnt": list(counters.values())}
        )

    summaries = ev.mapInPandas(mg, "event_type string, cnt long")
    combined = (
        summaries.groupBy("event_type")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .collect()
    )
    thresh = combined[HH_K]["cnt"] if len(combined) > HH_K else 0
    out = [
        (r["event_type"], int(r["cnt"] - thresh))
        for r in combined[:HH_K]
        if r["cnt"] - thresh > 0
    ]
    return spark.createDataFrame(out, "event_type string, est_count long")


_RI_SQL = """
WITH checks AS (
  SELECT 'orders.o_custkey->customer' AS fk,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphans
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'lineitem.l_orderkey->orders',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
  UNION ALL
  SELECT 'customer.c_nationkey->nation',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
  UNION ALL
  SELECT 'supplier.s_nationkey->nation',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
  UNION ALL
  SELECT 'nation.n_regionkey->region',
         CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT fk, n_rows, n_orphans,
       CAST(n_rows - n_orphans AS BIGINT) AS n_valid
FROM checks
"""


@register("dq_referential_integrity", oracle=_RI_SQL, tags=("relational", "agg"))
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the warehouse's entire FK
    graph — the DQ companion to dq_constraint_checks (which validates
    COLUMNS; this validates RELATIONSHIPS): per foreign key, total
    rows, orphans (child keys with no parent), and valid rows. A
    pipeline runs this after every load; a training-data registry runs
    the same shape over doc->source, chunk->doc, embedding->chunk
    edges.

    Scale shape: each check is one LEFT join keyed on the FK with the
    parent side reduced to its KEY column only (dimension parents
    broadcast; the orders parent of lineitem is the one genuinely big
    side and shuffles keys, not rows), aggregated to a single row
    before the union — the output is |edges| rows regardless of data
    volume. Counting orphans via left-join-null rather than anti-join
    keeps rows+orphans in ONE pass per edge."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("orders", "customer", "lineitem", "part", "supplier", "nation", "region")}

    def check(name, child, ckey, parent, pkey):
        p = t[parent].select(F.col(pkey).alias("_pk")).distinct()
        joined = t[child].select(F.col(ckey).alias("_ck")).join(
            p, F.col("_ck") == F.col("_pk"), "left"
        )
        return joined.agg(
            F.lit(name).alias("fk"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0)).alias(
                "n_orphans"
            ),
        )

    frames = [
        check("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        check("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        check("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        check("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        check("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        check("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        check("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select(
        "fk",
        "n_rows",
        "n_orphans",
        (F.col("n_rows") - F.col("n_orphans")).cast("bigint").alias("n_valid"),
    )


# ---------------------------------------------------------------------------
# PSI value-drift monitor (numeric-feature companion of corpus_mix_drift)
# ---------------------------------------------------------------------------

PSI_SPLIT_TS = "2024-01-16 00:00:00"  # old = first half-month, new = second
PSI_BINS = 10
PSI_BIN_K = 1.6              # log-width bins: floor(ln(value+1) * K), capped
PSI_Q = 1_000_000            # shares in parts-per-million (integer)
PSI_NANO = 1_000_000_000     # PSI terms quantized to nano-nats

_PSI_BIN_SQL = f"least({PSI_BINS - 1}, CAST(floor(ln(value + 1.0) * {PSI_BIN_K}) AS BIGINT))"


def PSI_BIN_COL() -> F.Column:
    """The log-width value bin shared by the batch monitor and the
    streaming drift twin (streaming/drift.py)."""
    return F.least(
        F.lit(PSI_BINS - 1),
        F.floor(F.log(F.col("value") + 1.0) * PSI_BIN_K).cast("bigint"),
    )

_PSI_SQL = f"""
WITH binned AS (
  SELECT event_type,
         {_PSI_BIN_SQL} AS bin,
         (ts < TIMESTAMP '{PSI_SPLIT_TS}') AS is_old
  FROM events
),
cells AS (
  SELECT event_type, bin,
         CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM binned GROUP BY event_type, bin
),
tot AS (
  SELECT event_type,
         CAST(sum(n_old) AS BIGINT) AS t_old,
         CAST(sum(n_new) AS BIGINT) AS t_new
  FROM cells GROUP BY event_type
),
shares AS (
  SELECT c.event_type, c.bin, c.n_old, c.n_new,
         CAST(c.n_old * {PSI_Q} // t.t_old AS BIGINT) AS share_old_ppm,
         CAST(c.n_new * {PSI_Q} // t.t_new AS BIGINT) AS share_new_ppm
  FROM cells c JOIN tot t ON c.event_type = t.event_type
)
SELECT event_type, bin, n_old, n_new, share_old_ppm, share_new_ppm,
       CASE WHEN share_old_ppm = 0 OR share_new_ppm = 0 THEN NULL
            ELSE CAST(round(
                   ((share_new_ppm - share_old_ppm) * 1.0 / {PSI_Q})
                   * ln(share_new_ppm * 1.0 / share_old_ppm) * {PSI_NANO})
                 AS BIGINT) END AS psi_term_nano
FROM shares
"""


@register("dq_psi_value_drift", oracle=_PSI_SQL, tags=("agg", "events"))
def dq_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index drift monitor over a NUMERIC feature
    — the companion of corpus_mix_drift (categorical shares) for the
    other half of production distribution monitoring: per event type,
    `value` is cut into log-width bins (the feature is heavy-tailed;
    equal-width would pile everything into bin 0), the first and
    second half-month populations are compared bin-by-bin, and each
    bin's PSI term (Δshare · ln(share ratio)) is emitted in exact
    nano-nat integers — sum of psi_term_nano per event_type = the PSI
    a monitoring gate thresholds (0.1 watch / 0.25 alarm in common
    practice). A NULL term marks a bin populated on only one side —
    the loudest drift signal of all. Shares are integer ppm
    (floor-division), ln quantized per the established micro-nat
    discipline, so every row is engine-exact.

    Scale shape: ONE scan, bin assignment map-side, one
    (type, bin) hash-agg (≤ |types|·10 groups after partials), one
    broadcast-sized totals join. Nothing grows with volume."""
    ev = load_table(spark, sf_dir, "events")
    bin_col = PSI_BIN_COL()
    cells = (
        ev.select(
            "event_type",
            bin_col.alias("bin"),
            (F.col("ts") < F.lit(PSI_SPLIT_TS).cast("timestamp")).alias("is_old"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("is_old"), 1).otherwise(0)).alias("n_old"),
            F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).alias("n_new"),
        )
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    shares = cells.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bin",
        "n_old",
        "n_new",
        F.expr(f"CAST(n_old * {PSI_Q} DIV t_old AS BIGINT)").alias("share_old_ppm"),
        F.expr(f"CAST(n_new * {PSI_Q} DIV t_new AS BIGINT)").alias("share_new_ppm"),
    )
    psi = F.when(
        (F.col("share_old_ppm") == 0) | (F.col("share_new_ppm") == 0),
        F.lit(None).cast("bigint"),
    ).otherwise(
        F.round(
            ((F.col("share_new_ppm") - F.col("share_old_ppm")) / PSI_Q)
            * F.log(F.col("share_new_ppm") / F.col("share_old_ppm"))
            * PSI_NANO
        ).cast("bigint")
    )
    return shares.select(
        "event_type", "bin", "n_old", "n_new",
        "share_old_ppm", "share_new_ppm", psi.alias("psi_term_nano"),
    )


# ---------------------------------------------------------------------------
# KMV bottom-k sketch: deterministic distinct estimate + uniform sample
# ---------------------------------------------------------------------------

KMV_K = 64
KMV_SPACE = float(1 << 60)  # md5_long hash space

_KMV_H = X.md5_long_sql("CAST(user_id AS VARCHAR)")

_KMV_SQL = f"""
WITH hh AS (
  SELECT DISTINCT event_type, {_KMV_H} AS h FROM events
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM hh
),
bot AS (SELECT * FROM ranked WHERE rn <= {KMV_K})
SELECT event_type,
  CAST(count(*) AS BIGINT) AS k_used,
  max(h) AS kth_hash,
  CAST(max(nd) AS BIGINT) AS exact_distinct,
  CASE WHEN max(nd) <= {KMV_K} THEN CAST(max(nd) AS DOUBLE)
       ELSE round(({KMV_K} - 1) * {KMV_SPACE!r} / max(h), 3) END AS est_distinct,
  md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h)) AS sample_md5
FROM bot GROUP BY event_type
"""


@register("sample_kmv_bottomk", oracle=_KMV_SQL, tags=("agg", "approx", "sampling"))
def sample_kmv_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values bottom-k sketch — the second fully-ORACLED
    sketch beside agg_hll_events, and the one that doubles as a
    SAMPLE: the k smallest md5_long hashes per event type are (a) a
    mergeable distinct-count estimator ((k-1)·H / h_k once more than
    k values exist, exact below) and (b) a uniform without-replacement
    sample of the distinct users whose identity travels as ONE scalar
    (md5 of the ordered hash list) so the driver hash-checks the
    sample itself, not just its size. Everything is a deterministic
    pure function of the input under the cross-engine hash.

    Scale shape: the hash dedup is one (type, h) hash-agg; bottom-k
    rides WindowGroupLimit (rank <= k pushed below the sort — at most
    k rows per type survive each partition, the window_topk
    discipline), so the sketch state shuffled is O(|types|·k).
    Mergeability (bottom-k of a union == bottom-k of concatenated
    per-shard bottom-ks) is pinned in tests/test_approx.py."""
    ev = load_table(spark, sf_dir, "events")
    hh = ev.select(
        "event_type", X.md5_long(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    nd = hh.groupBy("event_type").agg(F.count(F.lit(1)).alias("nd"))
    bot = (
        hh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .join(F.broadcast(nd), "event_type")
    )
    est = F.when(
        F.max("nd") <= KMV_K, F.max("nd").cast("double")
    ).otherwise(F.round((KMV_K - 1) * F.lit(KMV_SPACE) / F.max("h"), 3))
    return bot.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_hash"),
        F.max("nd").alias("exact_distinct"),
        est.alias("est_distinct"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("h")), lambda x: x.cast("string")
                ),
                ",",
            )
        ).alias("sample_md5"),
    )


# ---------------------------------------------------------------------------
# exact spend deciles (distributed ranking on a VALUE key)
# ---------------------------------------------------------------------------

DECILE_BUCKET_W = 1_000   # coarse spend ranges for the local-rank trick

_DECILES_SQL = """
WITH per_c AS (
  SELECT o_custkey AS custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY 1
),
r AS (
  SELECT custkey, spend,
         row_number() OVER (ORDER BY spend DESC, custkey) AS rnk,
         count(*) OVER () AS n
  FROM per_c
)
SELECT CAST(((rnk - 1) * 10) // n + 1 AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(spend) AS DOUBLE), 2) AS total_spend,
       round(CAST(min(spend) AS DOUBLE), 2) AS min_spend,
       round(CAST(max(spend) AS DOUBLE), 2) AS max_spend
FROM r GROUP BY 1
"""


@register("window_spend_deciles", oracle=_DECILES_SQL, tags=("window", "relational"))
def window_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact customer-spend deciles (decile 1 = top spenders) — the
    analyst's cohort cut, computed with a DISTRIBUTED exact global
    rank instead of a single-partition ntile window: the
    epoch_shuffle_order prefix-sum discipline applied to a VALUE key.
    Customers bucket into coarse contiguous spend ranges
    (floor(-spend / 1000) — bucket order equals full descending spend
    order), each bucket computes a LOCAL row_number in parallel, and a
    tiny per-bucket count frame supplies every bucket's global
    starting rank via its own prefix sum + broadcast join back; decile
    = ((rank-1)*10) // n + 1, all integer-exact. The oracle uses the
    plain single-window SQL — oracles don't need to scale; identity is
    the check that the distributed form IS the window.

    Scale shape: the heavy frame (per-customer aggregates) is ranked
    with per-bucket parallel windows — no single sorted partition;
    only the |buckets|-row count frame runs a global (tiny) window.
    Value skew concentrates ranks in few buckets — at real scale the
    bucket grid comes from the quantile sketch (events_quantile_sketch)
    instead of a fixed width. Spend sums are decimal (order-free
    exact) until the final rounded double projection."""
    o = load_table(spark, sf_dir, "orders")
    per_c = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(_dec("o_totalprice")).alias("spend")
    )
    neg = (-F.col("spend")).alias("neg")
    b = per_c.select("custkey", "spend", neg).withColumn(
        "rb", F.floor(F.col("neg") / DECILE_BUCKET_W)
    )
    rb_w = Window.orderBy("rb").rowsBetween(Window.unboundedPreceding, -1)
    counts = b.groupBy("rb").agg(F.count(F.lit(1)).alias("cnt"))
    starts = counts.select(
        "rb",
        F.coalesce(F.sum("cnt").over(rb_w), F.lit(0)).alias("range_start"),
    )
    n_total = counts.agg(F.sum("cnt").alias("n"))
    local_w = Window.partitionBy("rb").orderBy("neg", "custkey")
    ranked = (
        b.join(F.broadcast(starts), "rb")
        .withColumn("rnk", F.col("range_start") + F.row_number().over(local_w))
        .crossJoin(F.broadcast(n_total))
    )
    decile = (
        F.floor((F.col("rnk") - 1) * 10 / F.col("n")) + 1
    ).cast("bigint")
    return (
        ranked.select(decile.alias("decile"), "spend")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("spend").cast("double"), 2).alias("total_spend"),
            F.round(F.min("spend").cast("double"), 2).alias("min_spend"),
            F.round(F.max("spend").cast("double"), 2).alias("max_spend"),
        )
    )


# ---------------------------------------------------------------------------
# exact nearest-rank percentiles per group (the sketch's exact sibling)
# ---------------------------------------------------------------------------

PCTL_CENTS = 100   # values quantized to cents: bounded integer domain

_PCTL_SQL = """
WITH q AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
g AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1, 2),
r AS (
  SELECT event_type, v, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM g
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) / 100.0 AS p50,
       min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) / 100.0 AS p90,
       min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) / 100.0 AS p99
FROM r GROUP BY event_type
"""


@register("events_exact_percentiles", oracle=_PCTL_SQL, tags=("agg", "events"))
def events_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT nearest-rank percentiles (p50/p90/p99) of event value per
    type — the exact sibling of the mergeable fixed-bin
    events_quantile_sketch, for when the answer must be an actual
    order statistic rather than a bin interpolation. Values quantize
    to integer cents first, so the percentile is exactly defined and
    engine-exact: nearest-rank k = ceil(p*n) in pure integer
    arithmetic ((n*p + 99) // 100), the answer is the minimum
    quantized value whose cumulative count reaches k, and the only
    divisions are int/int.

    Scale shape: one (type, cent-value) hash-agg collapses the stream
    (map-side partials — the distinct-value table per type is bounded
    by the value domain in cents, the quantile-sketch discipline),
    then per-type cumulative windows run over those bounded distinct
    values, parallel ACROSS types. At 100 TB with an unbounded value
    domain you'd widen the quantization or fall back to the sketch —
    the quantization constant is the explicit knob."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    g = q.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    r = g.select(
        "event_type",
        "v",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )

    def pctl(p: int) -> F.Column:
        k = F.floor((F.col("n") * p + 99) / 100)
        return F.min(F.when(F.col("cum") >= k, F.col("v"))) / 100.0

    return r.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        pctl(50).alias("p50"),
        pctl(90).alias("p90"),
        pctl(99).alias("p99"),
    )
