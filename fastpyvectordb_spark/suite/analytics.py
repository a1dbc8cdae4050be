"""Aggregation / join suite queries (SURVEY §2.10 A1-A10, §2.11 J1-J8).

The reference has no generic aggregation or join operator — these
shapes appear in its application layer (news-intelligence demo /
query_news_db). Here they are first-class Catalyst plans over the
driver's TPC-H-ish tables.

Determinism note: double-precision SUMs are order-dependent, and Spark
partial aggregation order differs from DuckDB's. Money columns have
exactly 2 decimals in this data, so all revenue aggregates are computed
in exact integer cents — ``floor(x*100 + 0.5)`` per row (identical IEEE
ops in both engines), summed as BIGINT (order-independent), and divided
back at the end. Averages are derived from exact sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


# ---------------------------------------------------------------------------
# A-shape 1: TPC-H Q1-style pricing summary (group-by + many aggregates)
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
  CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
  CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*(1+l_tax)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
  ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("agg_pricing_summary", _Q1_ORACLE)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    return (
        f.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price_cents"
            ),
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge_cents"),
            F.round(
                F.sum(F.col("l_quantity").cast("long")).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# A-shape 2: 3-way join + group-by + top-k (TPC-H Q3-style)
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l.l_orderkey AS l_orderkey,
  CAST(SUM(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
  o.o_orderdate AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


@register("agg_top_orders_by_revenue", _Q3_ORACLE)
def agg_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-dim join (customer filter) → fact join → agg → top-k.

    Physical intent at scale: customer('BUILDING') broadcasts;
    lineitem⋈orders shuffles once on orderkey; TakeOrdered(10) merge.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate")
        .orderBy(F.desc("revenue_cents"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A-shape 3: multi-dim join revenue per nation (TPC-H Q5-style)
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT
  n.n_name AS n_name,
  CAST(SUM(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name
ORDER BY revenue_cents DESC, n_name
"""


@register("agg_revenue_by_nation", _Q5_ORACLE)
def agg_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).join(
            r, n.n_regionkey == r.r_regionkey
        )
    )
    return (
        li.join(dims, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
        .orderBy(F.desc("revenue_cents"), "n_name")
    )


# ---------------------------------------------------------------------------
# A1/A2: simple group-by counts (ref news demo 1431-1466)
# ---------------------------------------------------------------------------

@register(
    "agg_count_by_source",
    """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source ORDER BY source
""",
)
def agg_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# A3-style pivot: counts grouped by two dims (lang × source bucket)
# ---------------------------------------------------------------------------

@register(
    "agg_lang_source_matrix",
    """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY lang, source ORDER BY lang, source
""",
)
def agg_lang_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(F.count("*").alias("n")).orderBy(
        "lang", "source"
    )


# ---------------------------------------------------------------------------
# A4: top-k by count ("trending entities": ref query_news_db.py:468-486)
# ---------------------------------------------------------------------------

@register(
    "agg_top_customers_by_orders",
    """
SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY n_orders DESC, custkey
LIMIT 10
""",
)
def agg_top_customers_by_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "custkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A6: distinct / grouping sets — rollup over region→nation (Spark-native
# capability the reference lacks; SURVEY §2.10 "missing vs Spark")
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
"""


@register("agg_rollup_suppliers", _ROLLUP_ORACLE)
def agg_rollup_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = s.join(n, s.s_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_suppliers"))
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


# ---------------------------------------------------------------------------
# A7: per-dimension stats over the embedding array (quantizer training
# shape, ref quantization.py:85-106) — posexplode + groupBy(dim)
# ---------------------------------------------------------------------------

_DIMSTATS_ORACLE = """
SELECT
  CAST(i - 1 AS BIGINT) AS dim,
  ROUND(MIN(CAST(v AS DOUBLE)), 6) AS vmin,
  ROUND(MAX(CAST(v AS DOUBLE)), 6) AS vmax
FROM (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
  FROM embeddings
)
GROUP BY dim ORDER BY dim
"""


@register("agg_embedding_dim_stats", _DIMSTATS_ORACLE)
def agg_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 (SQ train) aggregation shape: per-dim min/max via posexplode.

    At scale this is a single pass: map-side partial min/max per dim,
    tiny shuffle (D rows), no data movement of the vectors themselves.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            F.round(F.min(F.col("v").cast("double")), 6).alias("vmin"),
            F.round(F.max(F.col("v").cast("double")), 6).alias("vmax"),
        )
        .orderBy("dim")
    )
