"""Cypher front-end suite queries (G14): the query enters as a Cypher
string, compiles to a DataFrame plan, and must hash-match a plain-SQL
oracle — proving the parser+compiler, not just the underlying joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.cypher import cypher_query
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.suite.graph import build_edges, build_nodes


@register(
    "cypher_match_where",
    """
SELECT c.c_name AS "c.name", n.n_name AS "n.name"
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > 9000.0
ORDER BY "c.name"
""",
)
def cypher_match_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH (c:Customer)-[:IN_NATION]->(n:Nation) WHERE … RETURN …"""
    nodes = build_nodes(spark, sf_dir)
    edges = build_edges(spark, sf_dir)
    out = cypher_query(
        nodes,
        edges,
        "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
        "WHERE c.acctbal > 9000.0 RETURN c.name, n.name",
    )
    return out.orderBy("`c.name`")


@register(
    "cypher_node_props",
    """
SELECT 'c:' || c_custkey AS c, c_acctbal AS "c.acctbal"
FROM customer
WHERE c_mktsegment = 'MACHINERY' AND c_acctbal < 0
ORDER BY c
""",
)
def cypher_node_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH with inline property map + WHERE comparison."""
    nodes = build_nodes(spark, sf_dir)
    edges = build_edges(spark, sf_dir)
    out = cypher_query(
        nodes,
        edges,
        "MATCH (c:Customer {mktsegment: 'MACHINERY'}) "
        "WHERE c.acctbal < 0 RETURN c, c.acctbal",
    )
    return out.orderBy("c")


# ---------------------------------------------------------------------------
# Aggregating Cypher: RETURN count(…) with implicit grouping + ORDER BY
# + LIMIT (the openCypher read-query core beyond bare projections).
# ---------------------------------------------------------------------------

_CY_COUNT_ORACLE = """
SELECT 'NATION_' || n.n_nationkey AS "n.name",
       CAST(count(*) AS BIGINT) AS "count(c)"
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_nationkey
ORDER BY "count(c)" DESC, "n.name"
LIMIT 10
"""


@register("cypher_nation_customer_counts", _CY_COUNT_ORACLE)
def cypher_nation_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = build_nodes(spark, sf_dir), build_edges(spark, sf_dir)
    return cypher_query(
        nodes,
        edges,
        "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
        "RETURN n.name, count(c) ORDER BY count(c) DESC, n.name LIMIT 10",
    )


# ---------------------------------------------------------------------------
# Path-chain pattern: three nodes, two hops, WHERE + implicit grouping
# — proves the multi-segment compiler (left-deep join chain), not just
# single-relationship matches.
# ---------------------------------------------------------------------------

_CY_CHAIN_ORACLE = """
SELECT r.r_name AS "r.name",
       CAST(count(*) AS BIGINT) AS "count(c)"
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_acctbal > 5000.0
GROUP BY r.r_name
ORDER BY "r.name"
"""


@register("cypher_region_chain_counts", _CY_CHAIN_ORACLE)
def cypher_region_chain_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = build_nodes(spark, sf_dir), build_edges(spark, sf_dir)
    return cypher_query(
        nodes,
        edges,
        "MATCH (c:Customer)-[:IN_NATION]->(n:Nation)-[:IN_REGION]->(r:Region) "
        "WHERE c.acctbal > 5000.0 RETURN r.name, count(c) ORDER BY r.name",
    )
