"""Second TPC-H batch: Q7 / Q15 / Q17 / Q19 join-and-predicate shapes.

These pin four classic OLAP plan shapes the first joins batch did not
cover (reference has no general join operator — SURVEY §2.11 — so all
of these are Spark-native capability queries):

- Q7  volume shipping: the *same* dimension table bound in two roles
  (supplier's nation vs customer's nation) with a symmetric pair
  predicate — exercises join reordering + broadcast of both roles.
- Q15 top supplier: an aggregate feeding a scalar-max subquery over
  itself — the view-plus-self-join decorrelation shape.
- Q17 small-quantity orders: correlated per-part AVG threshold
  (0.2 × avg qty) — decorrelated as grouped-agg + join back.
- Q19 disjunctive predicates: OR-of-ANDs across both join sides —
  the shape that tests residual-predicate evaluation after an
  equi-join plus implied-IN extraction for scan pruning.

Scale notes (100 TB): part/supplier are dimension-sized → broadcast;
lineitem never shuffles except for its aggregate keys. Q17's
correlation key (l_partkey) is the join key, so the threshold join is
one co-partitioned shuffle. Money stays integer cents (deterministic
across engines); quantities are integer-valued doubles ≤ 50, so the
Q17 AVG is IEEE-exact and the 0.2× threshold compares identically in
Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


_CENTS_SQL = "CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# Q7: volume between a nation pair, by direction and ship year.
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_CENTS_SQL}) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


@register("join_volume_shipping_q7", _Q7_ORACLE)
def join_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-role nation join (TPC-H Q7). Both role dimensions are
    supplier/customer⋈nation pre-joins restricted to the pair — each a
    few rows, broadcast — so lineitem is filtered map-side in both
    directions and only the final group-by shuffles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = ("NATION_1", "NATION_2")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    supp_dim = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    cust_dim = F.broadcast(
        c.join(n, c.c_nationkey == n.n_nationkey).select(
            "c_custkey", F.col("n_name").alias("cust_nation")
        )
    )
    return (
        li.join(supp_dim, li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_dim, o.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q15: top supplier — revenue view + scalar-max self-subquery.
# ---------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l.l_suppkey AS supplier_no,
         CAST(SUM({_CENTS_SQL}) AS BIGINT) AS total_revenue_cents
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
ORDER BY s.s_suppkey
"""


@register("join_top_supplier_q15", _Q15_ORACLE)
def join_top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-max subquery over a derived view (TPC-H Q15). The view
    aggregates once; the max is a one-row broadcast joined back — no
    second scan of lineitem, no window over the whole view."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("total_revenue_cents")
    )
    # integer-cents max → exact equality join is deterministic
    top = F.broadcast(
        revenue.agg(F.max("total_revenue_cents").alias("max_rev"))
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(top, F.col("total_revenue_cents") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_cents")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated per-part AVG.
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
SELECT CAST(SUM({_CENTS_SQL}) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND p.p_type = 'SMALL'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
"""


@register("join_small_qty_orders_q17", _Q17_ORACLE)
def join_small_qty_orders_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated AVG threshold (TPC-H Q17), decorrelated: per-part
    averages are a grouped aggregate on the correlation key — which is
    also the join key, so Catalyst co-partitions the threshold join
    with no extra shuffle. The part filter broadcasts. The oracle keeps
    the correlated form to prove equivalence.

    NOTE the decorrelation subtlety: the AVG must be over *all* lines
    of the part (the subquery has no brand filter), so the aggregate
    runs before the part join, not after."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL")
    )
    thresholds = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds.withColumnRenamed("l_partkey", "t_partkey"),
              li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive brand/size/quantity predicate — OR-of-ANDs revenue.
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT CAST(SUM({_CENTS_SQL}) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 20 AND 40)
"""


@register("agg_disjunctive_parts_q19", _Q19_ORACLE)
def agg_disjunctive_parts_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides (TPC-H Q19). The implied
    single-side predicates — p_brand IN (…), p_size ≤ 30, l_quantity
    BETWEEN 1 AND 40 — are extracted manually and pushed to each scan
    (Catalyst does not hoist common disjunct bounds across an OR), so
    the broadcast build side holds only matching brands and the probe
    side prunes quantity ranges at the parquet scan; the full disjunct
    runs as the residual after the equi-join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 40)
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") >= 1) & (F.col("p_size") <= 30)
    )
    disjunct = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(disjunct)
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q3: shipping priority — segment-filtered unshipped revenue top-10.
# ---------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       CAST(SUM({_CENTS_SQL}) AS BIGINT) AS revenue_cents,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND l.l_shipdate  > TIMESTAMP '1996-07-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("join_shipping_priority_q3", _Q3_ORACLE)
def join_shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: both filters push to their scans, the segment dim
    broadcasts, lineitem shuffles once for the group-by."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_cents"), "o_orderdate", "l_orderkey")
        .limit(10)
    )
