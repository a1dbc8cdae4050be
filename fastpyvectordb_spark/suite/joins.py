"""Join-shape suite batch: as-of, range/band, semi/anti, rollup, cube.

SURVEY §2.11 notes the reference has no general join operator (all its
joins are implicit dict/index lookups) and that Spark-native join kinds
— semi/anti, range, as-of — plus grouping analytics (§2.10: cube /
rollup / grouping sets) come free with Catalyst. This batch makes each
one a first-class, oracle-checked query so the capability is pinned,
not just claimed.

Scale notes (100 TB):
- The as-of join is the union+window formulation: one shuffle on the
  key, no per-row loops, no broadcast of either side — the standard
  trick for time-series as-of at any scale.
- The band join is equi-keyed on ``user_id`` with a time-band residual
  predicate, so it hash-joins on the key and only evaluates the band
  within key groups (AQE handles skewed users).
- Semi/anti joins never materialize right-side columns, so the build
  side is id-only — broadcastable far longer than a full join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


# -- as-of join: each error event ← the user's most recent click ≤ ts --
_ASOF_ORACLE = """
WITH u AS (
  SELECT user_id, ts, 0 AS side, event_id AS click_id, NULL AS error_id
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 1 AS side, NULL AS click_id, event_id AS error_id
  FROM events WHERE event_type = 'error'
),
f AS (
  SELECT user_id, ts, side, error_id,
         last_value(click_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, side, click_id
           ROWS UNBOUNDED PRECEDING) AS last_click
  FROM u
)
SELECT CAST(error_id AS BIGINT) AS event_id, user_id,
       CAST(ts AS TIMESTAMP) AS ts,
       CAST(COALESCE(last_click, -1) AS BIGINT) AS last_click_id
FROM f WHERE side = 1 ORDER BY event_id
"""


@register("join_asof_error_click", _ASOF_ORACLE)
def join_asof_error_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via tagged union + prefix window (single shuffle).

    For every ``error`` event: the same user's latest ``click`` at or
    before it (-1 when none). Click-side rows sort before error-side
    rows at equal ``ts`` (side 0 < 1), so same-instant clicks match;
    ties among clicks resolve to the highest click_id.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.lit(0).alias("side"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("error_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("error_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "click_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(errors)
        .withColumn("last_click", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            F.col("error_id").alias("event_id"),
            "user_id",
            "ts",
            F.coalesce(F.col("last_click"), F.lit(-1)).alias("last_click_id"),
        )
        .orderBy("event_id")
    )


# -- range/band join: clicks in the 5 minutes before each error --------
_BAND_ORACLE = """
SELECT e.event_id AS event_id, e.user_id AS user_id,
       CAST(COUNT(c.event_id) AS BIGINT) AS clicks_5m
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND c.ts >= e.ts - INTERVAL 5 MINUTE AND c.ts < e.ts
GROUP BY 1, 2 ORDER BY event_id
"""


@register("join_range_click_burst", _BAND_ORACLE)
def join_range_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: per error event, clicks by the same user in the
    preceding 5 minutes. Equi-key ``user_id`` carries the hash join;
    the time band is a residual predicate evaluated within key groups."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("e_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    joined = e.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("c_ts") < F.col("e_ts")),
        "left",
    )
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.count("c_id").alias("clicks_5m"))
        .orderBy("event_id")
    )


# -- semi/anti join: customer activity segments ------------------------
_SEMI_ANTI_ORACLE = """
SELECT 'active_1995' AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
UNION ALL
SELECT 'never_ordered',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY segment
"""


@register("join_semi_anti_segments", _SEMI_ANTI_ORACLE)
def join_semi_anti_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (ordered in 1995) and left-anti (never ordered)
    customer segments. The build sides are id-only projections."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    o95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    semi = c.join(o95, c.c_custkey == o95.o_custkey, "left_semi")
    anti = c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")

    def seg(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("segment"),
            F.count("*").alias("n_customers"),
            F.sum(_cents(F.col("c_acctbal"))).alias("acctbal_cents"),
        )

    return seg(semi, "active_1995").unionByName(seg(anti, "never_ordered")).orderBy(
        "segment"
    )


# -- rollup: revenue by (nation, year) with subtotals ------------------
_ROLLUP_ORACLE = """
SELECT COALESCE(n_name, 'ALL') AS nation,
       COALESCE(CAST(order_year AS VARCHAR), 'ALL') AS order_year,
       CAST(SUM(row_cents) AS BIGINT) AS revenue_cents
FROM (
  SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS order_year,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS row_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
GROUP BY ROLLUP (n_name, order_year)
ORDER BY nation, order_year
"""


@register("agg_rollup_nation_year", _ROLLUP_ORACLE)
def agg_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, year): detail rows + per-nation subtotals + grand
    total, NULL group keys replaced by 'ALL' sentinels on both engines.
    Partial aggregation keeps the shuffle at group-key cardinality."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("int").alias("order_year"),
            _cents(F.col("o_totalprice")).alias("row_cents"),
        )
    )
    return (
        rows.rollup("n_name", "order_year")
        .agg(F.sum("row_cents").alias("revenue_cents"))
        .select(
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("order_year").cast("string"), F.lit("ALL")).alias(
                "order_year"
            ),
            "revenue_cents",
        )
        .orderBy("nation", "order_year")
    )


# -- salted join under the oracle gate: must equal the plain join ------
_SALTED_ORACLE = """
SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY nation
"""


@register("join_salted_customer_nation", _SALTED_ORACLE)
def join_salted_customer_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-handling path under the correctness gate: the salted join
    (hot keys split 8 ways, small side exploded per salt) must produce
    exactly the plain join's rows — the oracle is the plain SQL join.
    Nation keys are the canonical skew shape: few keys, many rows."""
    from fastpyvectordb_spark.operators.scale import salted_join

    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "n_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        salted_join(c, n, "n_nationkey", n_salts=8)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
        .orderBy("nation")
    )


# -- correlated-subquery shape: orders above their customer's average --
_ABOVE_AVG_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM orders o
WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
  AND o_custkey <= 100
ORDER BY o_orderkey
"""


@register("join_orders_above_cust_avg", _ABOVE_AVG_ORACLE)
def join_orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated subquery: the per-customer average joins back as a
    grouped aggregate (one shuffle on the correlation key) — the plan a
    decorrelation rewrite produces, written directly. The oracle keeps
    the correlated form to prove semantic equivalence."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    avg = o.groupBy("o_custkey").agg(
        F.avg("o_totalprice").alias("cust_avg")
    )
    return (
        o.join(avg, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            _cents(F.col("o_totalprice")).alias("price_cents"),
        )
        .orderBy("o_orderkey")
    )


# -- cube: order counts by (status, priority) over all subsets ---------
_CUBE_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


@register("agg_cube_status_priority", _CUBE_ORACLE)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (status, priority): all four grouping sets in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 proper (local supplier volume): 6-table join with the
# customer-nation == supplier-nation correlation — the shape that
# exercises join *reordering*. Catalyst broadcasts the three dim
# tables, leaving one shuffle each on orderkey and the dim keys; the
# nation-equality residual prunes before the aggregate.
# ---------------------------------------------------------------------------

_Q5FULL_ORACLE = """
SELECT n.n_name AS n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue_cents DESC, n_name
"""


@register("join_local_supplier_volume", _Q5FULL_ORACLE)
def join_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).join(
            r, n.n_regionkey == r.r_regionkey
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            sn,
            (li.l_suppkey == F.col("s_suppkey"))
            & (c.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
        .orderBy(F.desc("revenue_cents"), "n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape (national market share): two distinct roles for the
# nation table (customer's vs supplier's) and a conditional-share
# aggregate. Integer-cents sums make the share division deterministic.
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(SUM(CASE WHEN n2.n_name = 'NATION_5'
                      THEN CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)
                      ELSE 0 END) * 1.0
             / SUM(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)), 6)
         AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN region r   ON n1.n_regionkey = r.r_regionkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
GROUP BY year(o.o_orderdate)
ORDER BY o_year
"""


@register("agg_nation_market_share", _Q8_ORACLE)
def agg_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("n2_name"),
    )
    cust_dim = F.broadcast(
        c.join(n1, c.c_nationkey == n1.n_nationkey).join(
            r, n1.n_regionkey == r.r_regionkey
        )
    )
    supp_dim = F.broadcast(s.join(n2, s.s_nationkey == F.col("n2_nationkey")))
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_dim, o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(supp_dim, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("n2_name") == "NATION_5", cents).otherwise(
                        F.lit(0).cast("long")
                    )
                )
                * F.lit(1.0)
                / F.sum(cents),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape (global sales opportunity): scalar-subquery threshold
# + NOT EXISTS anti-join (dormant high-balance customers: above-average
# balance, no order since mid-2000). The threshold is computed in
# integer cents (exact BIGINT sum / BIGINT count) so the double
# division — and therefore every boundary comparison — is bit-identical
# across engines.
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT SUM(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) * 1.0 / COUNT(*) AS thresh_cents
  FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name AS n_name,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(floor(c.c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_bal_cents
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(floor(c.c_acctbal*100 + 0.5) AS BIGINT) > (SELECT thresh_cents FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY n.n_name
ORDER BY n_name
"""


@register("join_sales_opportunity", _Q22_ORACLE)
def join_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    bal_cents = _cents(F.col("c_acctbal"))
    # scalar subquery as a broadcast one-row join: stays lazy (no
    # driver-side job inside the builder) and costs one tiny stage
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(bal_cents) * F.lit(1.0) / F.count(F.lit(1))).alias(
            "thresh_cents"
        )
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(bal_cents > F.col("thresh_cents"))
        .drop("thresh_cents")
        .join(
            o.filter(
                F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
            ).select("o_custkey"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(bal_cents).alias("total_bal_cents"),
        )
        .orderBy("n_name")
    )
