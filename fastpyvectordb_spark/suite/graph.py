"""Graph suite queries (SURVEY §2.8 G1-G13) over a property graph
derived from the driver's tables:

  nodes: region ``r:<k>`` [Region], nation ``n:<k>`` [Nation],
         customer ``c:<k>`` [Customer], supplier ``s:<k>`` [Supplier],
         order ``o:<k>`` [Order]
  edges: c -IN_NATION-> n, s -IN_NATION-> n, n -IN_REGION-> r,
         o -PLACED_BY-> c
  hyperedges: one per order, members = its distinct parts ``p:<k>``
              (CO_ORDERED), from lineitem.

This exercises exactly the reference's graph surface (label/property
lookup, neighbors, BFS, traversal, membership) with DuckDB
recursive-CTE oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators import graph as G
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table


def build_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("id"),
        F.array(F.lit("Customer")).alias("labels"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s:"), F.col("s_suppkey")).alias("id"),
        F.array(F.lit("Supplier")).alias("labels"),
        F.col("s_name").alias("name"),
        F.lit(None).cast("string").alias("mktsegment"),
        F.col("s_acctbal").alias("acctbal"),
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.concat(F.lit("n:"), F.col("n_nationkey")).alias("id"),
        F.array(F.lit("Nation")).alias("labels"),
        F.col("n_name").alias("name"),
        F.lit(None).cast("string").alias("mktsegment"),
        F.lit(None).cast("double").alias("acctbal"),
    )
    r = load_table(spark, sf_dir, "region").select(
        F.concat(F.lit("r:"), F.col("r_regionkey")).alias("id"),
        F.array(F.lit("Region")).alias("labels"),
        F.col("r_name").alias("name"),
        F.lit(None).cast("string").alias("mktsegment"),
        F.lit(None).cast("double").alias("acctbal"),
    )
    return c.unionByName(s).unionByName(n).unionByName(r)


def build_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
        F.lit("IN_NATION").alias("type"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s:"), F.col("s_suppkey")).alias("src"),
        F.concat(F.lit("n:"), F.col("s_nationkey")).alias("dst"),
        F.lit("IN_NATION").alias("type"),
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
        F.lit("IN_REGION").alias("type"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.concat(F.lit("o:"), F.col("o_orderkey")).alias("src"),
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("dst"),
        F.lit("PLACED_BY").alias("type"),
    )
    return c.unionByName(s).unionByName(n).unionByName(o)


_EDGES_CTE = """
edges AS (
  SELECT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst, 'IN_NATION' AS type FROM customer
  UNION ALL
  SELECT 's:' || s_suppkey, 'n:' || s_nationkey, 'IN_NATION' FROM supplier
  UNION ALL
  SELECT 'n:' || n_nationkey, 'r:' || n_regionkey, 'IN_REGION' FROM nation
  UNION ALL
  SELECT 'o:' || o_orderkey, 'c:' || o_custkey, 'PLACED_BY' FROM orders
)"""


# ---------------------------------------------------------------------------

@register(
    "graph_neighbors",
    f"""
WITH {_EDGES_CTE.lstrip()}
SELECT neighbor_id, direction, type FROM (
  SELECT dst AS neighbor_id, 'out' AS direction, type FROM edges WHERE src = 'n:5'
  UNION
  SELECT src AS neighbor_id, 'in' AS direction, type FROM edges WHERE dst = 'n:5'
)
ORDER BY neighbor_id, direction
""",
)
def graph_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9: neighbors of nation n:5 in both directions."""
    edges = build_edges(spark, sf_dir)
    return G.neighbors(edges, "n:5", direction="both").orderBy(
        "neighbor_id", "direction"
    )


@register(
    "graph_degree_topk",
    f"""
WITH {_EDGES_CTE.lstrip()}
SELECT dst AS node_id, CAST(COUNT(*) AS BIGINT) AS degree
FROM edges WHERE type = 'PLACED_BY'
GROUP BY dst ORDER BY degree DESC, node_id LIMIT 10
""",
)
def graph_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/G13 shape: top customers by in-degree of PLACED_BY edges
    (ref query_news_db.py:468-486 'trending entities')."""
    edges = build_edges(spark, sf_dir)
    return (
        G.degrees(G.edges_by_type(edges, "PLACED_BY"), "in")
        .orderBy(F.desc("degree"), "node_id")
        .limit(10)
    )


@register(
    "graph_bfs_levels",
    f"""
WITH RECURSIVE {_EDGES_CTE.lstrip()},
bfs AS (
  SELECT 'o:7' AS node_id, 0 AS hops
  UNION ALL
  SELECT e.dst, b.hops + 1
  FROM bfs b JOIN edges e ON e.src = b.node_id
  WHERE b.hops < 4
)
SELECT node_id, CAST(MIN(hops) AS INT) AS hops
FROM bfs GROUP BY node_id ORDER BY hops, node_id
""",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G11: BFS min-hop levels from order o:7 (o→c→n→r chain)."""
    edges = build_edges(spark, sf_dir)
    return G.bfs_levels(edges, "o:7", max_depth=4).orderBy("hops", "node_id")


@register(
    "graph_traverse",
    f"""
WITH RECURSIVE {_EDGES_CTE.lstrip()},
walk AS (
  SELECT src AS start_id, src AS node, [src] AS path_arr, 0 AS depth
  FROM (SELECT DISTINCT src FROM edges WHERE src IN ('c:1', 'c:2'))
  UNION ALL
  SELECT w.start_id, e.dst, list_append(w.path_arr, e.dst), w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < 3 AND NOT list_contains(w.path_arr, e.dst)
)
SELECT start_id, node AS end_id, CAST(depth AS INT) AS depth,
       list_aggregate(path_arr, 'string_agg', '->') AS path
FROM walk WHERE depth >= 1
ORDER BY start_id, depth, path
""",
)
def graph_traverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10: all simple paths of 1..3 edges from customers c:1, c:2."""
    edges = build_edges(spark, sf_dir)
    return G.traverse(edges, ["c:1", "c:2"], max_depth=3).orderBy(
        "start_id", "depth", "path"
    )


@register(
    "graph_find_nodes",
    """
SELECT id, name, acctbal FROM (
  SELECT 'c:' || c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
         c_mktsegment AS mktsegment
  FROM customer
)
WHERE mktsegment = 'BUILDING' AND acctbal >= 1000.0 AND acctbal <= 5000.0
ORDER BY id
""",
)
def graph_find_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5+G6: label + property equality + numeric range lookup."""
    nodes = build_nodes(spark, sf_dir)
    found = G.nodes_by_property_range(
        G.find_nodes(nodes, label="Customer", properties={"mktsegment": "BUILDING"}),
        "acctbal",
        lo=1000.0,
        hi=5000.0,
    )
    return found.select("id", "name", "acctbal").orderBy("id")


@register(
    "graph_hyperedge_membership",
    """
WITH hyper AS (
  SELECT 'o:' || l_orderkey AS id, 'p:' || l_partkey AS member
  FROM lineitem GROUP BY 1, 2
),
any_mode AS (
  SELECT DISTINCT id FROM hyper WHERE member IN ('p:1', 'p:2')
),
all_mode AS (
  SELECT id FROM hyper WHERE member IN ('p:1', 'p:2')
  GROUP BY id HAVING COUNT(*) = 2
)
SELECT id, 'any' AS mode FROM any_mode
UNION ALL
SELECT id, 'all' AS mode FROM all_mode
ORDER BY mode, id
""",
)
def graph_hyperedge_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G12: hyperedge membership any/all over order→parts hyperedges."""
    li = load_table(spark, sf_dir, "lineitem")
    hyper = (
        li.select(
            F.concat(F.lit("o:"), F.col("l_orderkey")).alias("id"),
            F.concat(F.lit("p:"), F.col("l_partkey")).alias("member"),
        )
        .distinct()
        .groupBy("id")
        .agg(F.collect_list("member").alias("nodes"))
    )
    any_df = G.hyperedges_by_nodes(hyper, ["p:1", "p:2"], "any").select(
        "id", F.lit("any").alias("mode")
    )
    all_df = G.hyperedges_by_nodes(hyper, ["p:1", "p:2"], "all").select(
        "id", F.lit("all").alias("mode")
    )
    return any_df.unionByName(all_df).orderBy("mode", "id")


@register(
    "graph_stats",
    f"""
WITH {_EDGES_CTE.lstrip()},
nodes AS (
  SELECT 'c:' || c_custkey AS id, 'Customer' AS label FROM customer
  UNION ALL SELECT 's:' || s_suppkey, 'Supplier' FROM supplier
  UNION ALL SELECT 'n:' || n_nationkey, 'Nation' FROM nation
  UNION ALL SELECT 'r:' || r_regionkey, 'Region' FROM region
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
       (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) FROM nodes) AS n_labels,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(COUNT(DISTINCT type) AS BIGINT) FROM edges) AS n_edge_types
""",
)
def graph_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G13: node/edge counts + distinct labels/types."""
    nodes = build_nodes(spark, sf_dir)
    edges = build_edges(spark, sf_dir)
    return G.graph_stats(nodes, edges)


@register(
    "graph_shortest_path",
    f"""
WITH RECURSIVE {_EDGES_CTE.lstrip()},
walk AS (
  SELECT 'o:3' AS node, ['o:3'] AS path_arr, 0 AS depth
  UNION ALL
  SELECT e.dst, list_append(w.path_arr, e.dst), w.depth + 1
  FROM walk w JOIN (SELECT DISTINCT src, dst FROM edges) e ON e.src = w.node
  WHERE w.depth < 4 AND NOT list_contains(w.path_arr, e.dst)
),
hits AS (SELECT * FROM walk WHERE node LIKE 'r:%'),
best AS (SELECT MIN(depth) AS hops FROM hits)
SELECT 'o:3' AS src_id,
       node AS dst_id,
       CAST(depth AS INT) AS hops,
       list_aggregate(path_arr, 'string_agg', '->') AS path
FROM hits, best WHERE depth = best.hops
ORDER BY path LIMIT 1
""",
)
def graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G11 proper: BFS shortest path from order o:3 to its region (the
    o→c→n→r chain makes the answer 3 hops), early-stop driver loop vs
    a recursive-CTE oracle. The target is the region the BFS reaches
    first — computed by running the same plan for dst discovery."""
    edges = build_edges(spark, sf_dir)
    # discover the reachable region (deterministic: o→c→n→r is a chain)
    reach = G.bfs_levels(edges, "o:3", max_depth=4)
    dst = (
        reach.filter(F.col("node_id").startswith("r:"))
        .orderBy("hops", "node_id")
        .head()["node_id"]
    )
    out = G.shortest_path(edges, "o:3", dst, max_depth=4)
    return out.select(
        "src_id",
        F.col("dst_id"),
        F.col("hops").cast("int").alias("hops"),
        "path",
    )


# hyperedge co-occurrence mining (market-basket over CO_ORDERED): top
# part pairs by number of shared orders — the association shape built
# on the same explode→self-join the hyperedge membership index uses.
# The self-join is keyed on the order (bounded fan-out per basket),
# never all-pairs over parts.
_COPURCHASE_ORACLE = """
WITH members AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
)
SELECT a.part AS part_a, b.part AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM members a JOIN members b ON a.okey = b.okey AND a.part < b.part
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""


@register("graph_part_copurchase_topk", _COPURCHASE_ORACLE)
def graph_part_copurchase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-ordered part pairs (hyperedge co-membership counts)."""
    li = load_table(spark, sf_dir, "lineitem")
    members = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    a = members.alias("a")
    b = members.alias("b")
    return (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.part") < F.col("b.part")))
        .groupBy(
            F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b")
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Triangle counting over the co-purchase projection (beyond the
# reference's graph surface — the classic distributed graph metric).
# Node ids are zero-padded so string order == numeric order in both
# engines (the operator compares ids with least/greatest).
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH members AS (
  SELECT DISTINCT l_orderkey AS okey,
         'p:' || lpad(CAST(l_partkey AS VARCHAR), 9, '0') AS part
  FROM lineitem
),
pairs AS (
  SELECT DISTINCT a.part AS a, b.part AS b
  FROM members a JOIN members b ON a.okey = b.okey AND a.part < b.part
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM pairs e1
  JOIN pairs e2 ON e2.a = e1.b
  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners
GROUP BY node
ORDER BY n_triangles DESC, node
LIMIT 20
"""


@register("graph_triangles_topk", _TRIANGLE_ORACLE)
def graph_triangles_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    members = li.select(
        F.col("l_orderkey").alias("okey"),
        F.concat(
            F.lit("p:"), F.lpad(F.col("l_partkey").cast("string"), 9, "0")
        ).alias("part"),
    ).distinct()
    a, b = members.alias("a"), members.alias("b")
    pairs = a.join(
        b,
        (F.col("a.okey") == F.col("b.okey"))
        & (F.col("a.part") < F.col("b.part")),
    ).select(F.col("a.part").alias("src"), F.col("b.part").alias("dst"))
    return G.triangle_counts(pairs).limit(20)


# ---------------------------------------------------------------------------
# Fixed-point PageRank (iterative, yet oracle-checkable): all-integer
# damping arithmetic makes the ranks bit-exact on both engines, so the
# driver's hash gate pins an 8-iteration Pregel-style loop end to end.
# ---------------------------------------------------------------------------

PR_ITERS = 8

_PAGERANK_ORACLE = f"""
WITH {_EDGES_CTE.lstrip()},
{G.duckdb_pagerank_ctes(PR_ITERS)}
SELECT node, r AS rank_micros
FROM pr{PR_ITERS}
ORDER BY rank_micros DESC, node
LIMIT 20
"""


@register("graph_pagerank_top20", _PAGERANK_ORACLE)
def graph_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = build_edges(spark, sf_dir)
    return (
        G.pagerank_fixed_point(edges, iters=PR_ITERS)
        .select("node", F.col("r").alias("rank_micros"))
        .orderBy(F.desc("rank_micros"), "node")
        .limit(20)
    )
