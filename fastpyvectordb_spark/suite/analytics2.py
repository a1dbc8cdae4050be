"""Second analytics batch: pivot/trend (A3), percentiles (A10), set
operations (§2.13), pagination (O4), and two more TPC-H-ish shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


# A3: trend — counts by (year, status) pivoted to columns
_TREND_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
FROM orders
GROUP BY 1 ORDER BY order_year
"""


@register("agg_order_trend_pivot", _TREND_ORACLE)
def agg_order_trend_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (news demo :1513-1529): per-year counts pivoted by status."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
        )
        .orderBy("order_year")
    )


# A10: latency-percentile shape — exact percentiles (linear interp in
# both engines; percentile_approx would not hash-match)
_PCTL_ORACLE = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.50), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type ORDER BY event_type
"""


@register("events_value_percentiles", _PCTL_ORACLE)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


# §2.13 set ops: customers active in 1995 ∩ 1996, and 1995 \ 1996
_SETOPS_ORACLE = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT o_custkey AS custkey, 'both' AS segment FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT o_custkey, 'only_1995' FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
ORDER BY segment, custkey
"""


@register("setops_customer_activity", _SETOPS_ORACLE)
def setops_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96).select(
        F.col("o_custkey").alias("custkey"), F.lit("both").alias("segment")
    )
    only95 = y95.exceptAll(y96).select(
        F.col("o_custkey").alias("custkey"), F.lit("only_1995").alias("segment")
    )
    return both.unionByName(only95).orderBy("segment", "custkey")


# O4: pagination — deterministic page of an ordered listing
_PAGE_ORACLE = """
SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 20 OFFSET 40
"""


@register("page_customers", _PAGE_ORACLE)
def page_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name").orderBy("c_custkey").offset(40).limit(20)


# TPC-H Q6 shape: predicate-heavy scan-aggregate
_Q6_ORACLE = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
       AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
"""


@register("agg_forecast_revenue", _Q6_ORACLE)
def agg_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 25)
    )
    return f.agg(
        F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "revenue_cents"
        )
    )


# TPC-H Q10 shape: 4-way join + group + top-k by revenue
_Q10_ORACLE = """
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


@register("agg_returned_item_ranking", _Q10_ORACLE)
def agg_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


# window functions: rank + running revenue per customer over months
_WINDOW_ORACLE = """
WITH m AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS month_cents
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey AS custkey, CAST(month AS TIMESTAMP) AS month, month_cents,
       CAST(SUM(month_cents) OVER (PARTITION BY o_custkey ORDER BY month
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY month) AS BIGINT) AS month_rank
FROM m
WHERE o_custkey <= 50
ORDER BY custkey, month
"""


@register("window_running_revenue", _WINDOW_ORACLE)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    m = (
        o.filter(F.col("o_custkey") <= 50)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("month_cents"))
    )
    w = Window.partitionBy("custkey").orderBy("month")
    return (
        m.withColumn(
            "running_cents",
            F.sum("month_cents").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("month_rank", F.row_number().over(w).cast("long"))
        .orderBy("custkey", "month")
    )


# TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share).
# Both sums are exact integer cents; the ratio divides two exact
# BIGINTs in double — deterministic across engines.
_Q14_ORACLE = """
WITH j AS (
  SELECT p.p_type,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS rev_cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1996-07-01'
)
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_cents ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
       ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_cents ELSE 0 END) AS DOUBLE)
             / SUM(rev_cents), 6) AS promo_pct
FROM j
"""


@register("agg_promo_revenue_ratio", _Q14_ORACLE)
def agg_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_cents"
        ),
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("rev_cents")).otherwise(F.lit(0))
    )
    total = F.sum("rev_cents")
    return j.agg(
        promo.alias("promo_cents"),
        total.alias("total_cents"),
        F.round(100.0 * promo.cast("double") / total, 6).alias("promo_pct"),
    )


# TPC-H Q12 shape: two-level conditional counts per group (the driver's
# lineitem has no shipmode column; l_returnflag plays the group role,
# o_orderpriority the urgency split — same join + CASE-count plan).
_Q12_ORACLE = """
SELECT l.l_returnflag AS l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
"""


@register("agg_priority_line_counts", _Q12_ORACLE)
def agg_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# GROUPING SETS (native Catalyst; completes the rollup/cube trio the
# reference lacks entirely — SURVEY §2.10 "missing vs Spark"): revenue
# by (status), by (priority), and grand total in one pass.
_GSETS_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""


@register("agg_grouping_sets_orders", _GSETS_ORACLE)
def agg_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gsets_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               COUNT(*) AS n_orders,
               SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS revenue_cents
        FROM _gsets_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


# TPC-H Q13 shape: outer-join fan-out → per-customer counts → count
# histogram. Exercises LEFT OUTER with an ON-clause residual predicate
# (comment-filtered orders) and a double aggregation.
_CUST_DIST_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("agg_cust_order_distribution", _CUST_DIST_ORACLE)
def agg_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape). The join
    predicate must live in the ON clause — as a WHERE it would turn the
    outer join inner and drop zero-order customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# lag-window shape over the event stream: inter-event gap percentiles
# per event type (sessionization's core primitive, measured exactly)
_GAP_ORACLE = """
SELECT event_type,
       ROUND(quantile_cont(gap_s, 0.50), 6) AS p50_gap_s,
       ROUND(quantile_cont(gap_s, 0.95), 6) AS p95_gap_s,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM (
  SELECT event_type,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id),
                   ts) / 1e6 AS gap_s
  FROM events
)
WHERE gap_s IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


@register("events_gap_percentiles", _GAP_ORACLE)
def events_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, type) inter-event gaps via lag() — exact p50/p95 per
    type. The gap is a MICROSECOND timestamp_diff (integer in both
    engines, no timezone involved — ts is TIMESTAMP_NTZ) divided by
    1e6."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (
            F.timestamp_diff(
                "MICROSECOND", F.lag("ts").over(w), F.col("ts")
            )
            / 1e6
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.round(F.percentile("gap_s", F.lit(0.5)), 6).alias("p50_gap_s"),
            F.round(F.percentile("gap_s", F.lit(0.95)), 6).alias("p95_gap_s"),
            F.count("*").alias("n_gaps"),
        )
        .orderBy("event_type")
    )


# TPC-H Q18 shape: HAVING-filtered aggregate feeding a semi join, then
# a re-aggregation over the joined fact — two keyed shuffles, the
# second pre-pruned by the first's tiny output (broadcastable id set)
_LARGE_ORDERS_ORACLE = """
SELECT c.c_name,
       o.o_orderkey,
       CAST(o.o_custkey AS BIGINT) AS custkey,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
)
GROUP BY c.c_name, o.o_orderkey, o.o_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


@register("agg_large_orders", _LARGE_ORDERS_ORACLE)
def agg_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-quantity orders (TPC-H Q18 shape). The HAVING subquery's
    id set is k-sized → broadcast semi join, no second full shuffle of
    lineitem."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")
    big_ids = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big_ids), o.o_orderkey == big_ids.l_orderkey, "left_semi")
        .join(c, c.c_custkey == o.o_custkey)
        .join(l.select("l_orderkey", "l_quantity"), l.l_orderkey == o.o_orderkey)
        .groupBy("c_name", "o_orderkey", F.col("o_custkey").alias("custkey"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


# TPC-H Q4 shape: EXISTS-semi-join on a correlated date condition,
# grouped count. Spark: left-semi join with the residual predicate in
# the ON clause — the decorrelated plan Catalyst produces for EXISTS.
_LATE_SHIP_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("agg_late_ship_priority", _LATE_SHIP_ORACLE)
def agg_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with any line shipped >90 days after order date, counted
    per priority (TPC-H Q4 EXISTS shape)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# TPC-H Q12 shape: join + two conditional aggregates (CASE inside SUM)
_SHIPMODE_ORACLE = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag = 'N'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


@register("agg_priority_class_by_linestatus", _SHIPMODE_ORACLE)
def agg_priority_class_by_linestatus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """High/low-priority line counts per linestatus (TPC-H Q12 shape:
    join + CASE-conditional aggregates)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "N"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )
