"""Third TPC-H batch: Q2 / Q9 / Q11 / Q16 / Q20 / Q21 shapes.

The driver's star schema has no ``partsupp`` table, so these six adapt
the classic shapes to ``lineitem`` as the part↔supplier bridge — the
plan structure (the thing worth pinning) is identical:

- Q2  min-cost supplier: groupwise-min correlated subquery,
  decorrelated as grouped agg + equality join back.
- Q9  product-type profit: LIKE-filtered dimension driving a 5-way
  join with an arithmetic measure, grouped by nation × year.
- Q11 important stock: grouped value vs a fraction of the global
  total — scalar-aggregate subquery as a broadcast cross join.
- Q16 supplier counts: COUNT(DISTINCT) per attribute triple with a
  NOT-IN exclusion (anti join) and <>/NOT-LIKE residual predicates.
- Q20 promotion candidates: nested aggregation feeding a chain of
  semi joins down to distinct suppliers.
- Q21 waiting suppliers: double-correlated EXISTS / NOT-EXISTS on
  the same fact table, decorrelated as one per-order conditional
  aggregate (no self-join of lineitem with itself).

Scale notes (100 TB): part/supplier/nation are broadcast everywhere
they appear; lineitem shuffles once per query on its aggregate key.
Q21's classic formulation self-joins lineitem twice (EXISTS + NOT
EXISTS); the conditional-aggregate decorrelation here is the shape
that survives — one shuffle on l_orderkey, no fact×fact join. Money
is integer cents and fraction thresholds are cross-multiplied into
integer comparisons, so every engine computes bit-identical answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


_CENTS_SQL = "CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# Q2: min-cost supplier per part (groupwise-min + join back).
# ---------------------------------------------------------------------------

_Q2_ORACLE = f"""
WITH ps AS (
  SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
         CAST(SUM({_CENTS_SQL}) AS BIGINT) AS cost_cents
  FROM lineitem l
  GROUP BY l.l_partkey, l.l_suppkey
),
eligible AS (
  SELECT ps.* FROM ps
  JOIN supplier s ON ps.suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
best AS (
  SELECT partkey, min(cost_cents) AS min_cost_cents
  FROM eligible GROUP BY partkey
)
SELECT p.p_partkey, s.s_suppkey, s.s_name, b.min_cost_cents
FROM part p
JOIN best b     ON p.p_partkey = b.partkey
JOIN eligible e ON e.partkey = b.partkey AND e.cost_cents = b.min_cost_cents
JOIN supplier s ON e.suppkey = s.s_suppkey
WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
ORDER BY p.p_partkey, s.s_suppkey
"""


@register("join_min_cost_supplier_q2", _Q2_ORACLE)
def join_min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part (TPC-H Q2 shape; lineitem stands in
    for partsupp — reference has no join operator at all, SURVEY
    §2.11). The correlated ``cost = (SELECT min ...)`` subquery is
    decorrelated as a WINDOW MIN over partkey + equality filter — the
    grouped-min-plus-join-back formulation sort-merge-joins two
    derivatives of the same aggregate (13-exchange plan, flagged by
    the plan audit); the window does it in one extra hash exchange on
    partkey and no self-join. At 100 TB: one fact shuffle for the
    (partkey, suppkey) rollup, one partkey shuffle for the window,
    dimension broadcasts everywhere else."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    region_supp = F.broadcast(
        s.join(F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey)),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("cost_cents")
    )
    eligible = ps.join(region_supp, ps.suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("partkey")
    return (
        eligible.withColumn("min_cost_cents", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cost_cents"))
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .select("p_partkey", "s_suppkey", "s_name", "min_cost_cents")
        .orderBy("p_partkey", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year.
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_CENTS_SQL}
                - CAST(floor(p.p_retailprice*50 + 0.5) AS BIGINT)
                  * CAST(l.l_quantity AS BIGINT)) AS BIGINT)
         AS profit_cents
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, o_year DESC
"""


@register("agg_product_profit_q9", _Q9_ORACLE)
def agg_product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on red parts by supplier nation and order year (TPC-H Q9
    shape; supply cost proxied as half the retail price — partsupp
    does not exist here). The LIKE-filtered part dim and supplier⋈
    nation are broadcast; lineitem⋈orders is the only big join and
    AQE handles it; one group-by shuffle. Pure integer cents: the
    half-price is rounded to cents ONCE per unit (floor(retail·50 +
    .5)) so no engine ever divides — double→bigint casts round in
    DuckDB but truncate in Spark, a trap this formulation avoids."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    supp_nation = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    profit = (
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        - F.floor(F.col("p_retailprice") * 50 + F.lit(0.5)).cast("long")
        * F.col("l_quantity").cast("long")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(profit).cast("long").alias("profit_cents"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11: important parts — grouped value vs fraction of the global total.
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
WITH v AS (
  SELECT l.l_partkey AS partkey,
         CAST(SUM({_CENTS_SQL}) AS BIGINT) AS value_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT partkey, value_cents FROM v
WHERE value_cents * 700 > (SELECT sum(value_cents) FROM v)
ORDER BY value_cents DESC, partkey
"""


@register("agg_important_parts_q11", _Q11_ORACLE)
def agg_important_parts_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose value through NATION_3's suppliers exceeds 1/700 of
    that nation's total (TPC-H Q11 shape). The scalar-aggregate
    subquery is a one-row broadcast cross join — no collect, no second
    scan of lineitem (the grouped view feeds both sides). The fraction
    test cross-multiplies to ``value*200 > total`` so it is exact
    integer math in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey")
    )
    v = (
        li.join(nat_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("value_cents")
        )
    )
    total = v.agg(F.sum("value_cents").alias("_total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 700 > F.col("_total"))
        .select("partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "partkey")
    )


# ---------------------------------------------------------------------------
# Q16: supplier counts per (brand, type, size) with a NOT-IN exclusion.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("agg_supplier_part_counts_q16", _Q16_ORACLE)
def agg_supplier_part_counts_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per part attribute triple, excluding
    negative-balance suppliers (TPC-H Q16 shape; acctbal<0 stands in
    for the complaints LIKE — same NOT-IN plan). The exclusion list is
    a broadcast anti join (safe here: s_suppkey is never null, so
    NOT IN ≡ anti join); part is broadcast with the <>/NOT-LIKE/IN
    residuals applied scan-side. One shuffle: the distinct-count
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(bad.hint("broadcast"), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20: promotion-candidate suppliers — nested agg feeding semi joins.
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH qty AS (
  SELECT l.l_suppkey AS suppkey, l.l_partkey AS partkey,
         CAST(SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
                       THEN l.l_quantity ELSE 0 END) AS BIGINT) AS qty_1996,
         CAST(SUM(l.l_quantity) AS BIGINT) AS qty_total
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'small%'
  GROUP BY l.l_suppkey, l.l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN qty q    ON q.suppkey = s.s_suppkey
WHERE n.n_name = 'NATION_5' AND q.qty_1996 * 2 > q.qty_total
ORDER BY s.s_suppkey
"""


@register("join_promotion_suppliers_q20", _Q20_ORACLE)
def join_promotion_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers who shipped more than half their all-time
    volume of small* parts during 1996 (TPC-H Q20 shape: the
    availqty > ½·shipped correlated subquery becomes a conditional
    aggregate — both the year slice and the total come out of ONE
    pass over lineitem, where the classic plan scans it twice). The
    threshold is 2·qty_1996 > qty_total, integer-exact. Ends in a
    semi-join-shaped distinct on a dimension-sized set."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    in_1996 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("l_suppkey").alias("suppkey"),
                 F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(F.lit(0.0)))
            .cast("long").alias("qty_1996"),
            F.sum("l_quantity").cast("long").alias("qty_total"),
        )
        .filter(F.col("qty_1996") * 2 > F.col("qty_total"))
        .select("suppkey").distinct()
    )
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    # qty is already distinct supplier keys (≤ |supplier| rows) — an
    # inner join with the broadcast nation-restricted dim IS the semi
    # join, with the small side on the build side where Spark wants it
    return (
        qty.join(F.broadcast(nat_supp), qty.suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who were the sole late shipper on multi-supplier orders.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH o_stats AS (
  SELECT l.l_orderkey AS orderkey,
         count(DISTINCT l.l_suppkey) AS nsupp,
         count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                             THEN l.l_suppkey END) AS nlate,
         min(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN l.l_suppkey END) AS late_suppkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM o_stats t
JOIN supplier s ON t.late_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE t.nsupp >= 2 AND t.nlate = 1 AND n.n_name = 'NATION_7'
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@register("join_waiting_suppliers_q21", _Q21_ORACLE)
def join_waiting_suppliers_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers from NATION_7 who were the ONLY late shipper (>90
    days after the order date) on finalized multi-supplier orders
    (TPC-H Q21 shape). The classic EXISTS + NOT-EXISTS double
    correlation self-joins lineitem twice; here both collapse into one
    per-order conditional aggregate — nsupp≥2 replaces EXISTS(other
    supplier), nlate=1 replaces NOT-EXISTS(other late supplier), and
    MIN(late suppkey) recovers the culprit (well-defined because
    nlate=1). One fact shuffle on l_orderkey; everything after is
    dimension-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    late_supp = F.when(late, F.col("l_suppkey"))
    o_stats = (
        li.join(o.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.countDistinct("l_suppkey").alias("nsupp"),
            F.countDistinct(late_supp).alias("nlate"),
            F.min(late_supp).alias("late_suppkey"),
        )
        .filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
    )
    nat_supp = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    return (
        o_stats.join(nat_supp, o_stats.late_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
