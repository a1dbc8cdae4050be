"""Graph×vector suite queries (SURVEY §2.9 GV1-GV4).

Graph over the ``embeddings`` table: node ``v:<vec_id>`` carries the
embedding; edges chain consecutive vec_ids within each label
(type NEXT) — a deterministic label-cluster graph both engines build
identically via a lag window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.distances import duckdb_distance
from fastpyvectordb_spark.operators.graphvector import (
    graph_search_with_reranking,
    semantic_graph_search,
)
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table

K = 10
EXPAND_HOPS = 2
VW, GW = 0.7, 0.3


def _nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.concat(F.lit("v:"), F.col("vec_id")).alias("id"),
        "embedding",
        "label",
    )


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    return (
        emb.select("vec_id", "label")
        .withColumn("prev", F.lag("vec_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            F.concat(F.lit("v:"), F.col("prev")).alias("src"),
            F.concat(F.lit("v:"), F.col("vec_id")).alias("dst"),
            F.lit("NEXT").alias("type"),
        )
    )


_GRAPH_CTES = f"""
nodes AS (
  SELECT 'v:' || vec_id AS id, embedding, label FROM embeddings
),
edges AS (
  SELECT 'v:' || prev AS src, 'v:' || vec_id AS dst FROM (
    SELECT vec_id, lag(vec_id) OVER (PARTITION BY label ORDER BY vec_id) AS prev
    FROM embeddings
  ) WHERE prev IS NOT NULL
),
undirected AS (
  SELECT src, dst FROM edges
  UNION
  SELECT dst, src FROM edges
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
"""

_SEEDS_CTE = f"""
seeds AS (
  SELECT id AS node_id, 1.0 - dist AS vector_score FROM (
    SELECT n.id, ROUND({duckdb_distance("n.embedding", "q.qvec", "cosine")}, 6) AS dist
    FROM nodes n CROSS JOIN q
    ORDER BY dist, id
    LIMIT {K * 2}
  )
),
best AS (SELECT MAX(vector_score) AS b FROM seeds)
"""

_GV3_ORACLE = f"""
WITH {_GRAPH_CTES.strip()},
{_SEEDS_CTE.strip()},
hop1 AS (
  SELECT DISTINCT u.dst AS node_id
  FROM seeds s JOIN undirected u ON u.src = s.node_id
  WHERE u.dst NOT IN (SELECT node_id FROM seeds)
),
hop2 AS (
  SELECT DISTINCT u.dst AS node_id
  FROM hop1 h JOIN undirected u ON u.src = h.node_id
  WHERE u.dst NOT IN (SELECT node_id FROM seeds)
    AND u.dst NOT IN (SELECT node_id FROM hop1)
),
unioned AS (
  SELECT node_id, 0 AS hop, vector_score, vector_score AS combined_score FROM seeds
  UNION ALL
  SELECT node_id, 1, (SELECT b FROM best) * (1.0/(1.0+1)),
         {VW} * (SELECT b FROM best) * (1.0/(1.0+1)) + {GW} * (1.0/1) FROM hop1
  UNION ALL
  SELECT node_id, 2, (SELECT b FROM best) * (1.0/(1.0+2)),
         {VW} * (SELECT b FROM best) * (1.0/(1.0+2)) + {GW} * (1.0/2) FROM hop2
)
SELECT node_id, CAST(hop AS INT) AS hop,
       ROUND(vector_score, 6) AS vector_score,
       ROUND(combined_score, 6) AS combined_score
FROM unioned
ORDER BY combined_score DESC, node_id
LIMIT {K}
"""


@register("gv_semantic_expansion", _GV3_ORACLE)
def gv_semantic_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GV3: seed kNN + 2-hop decay-scored expansion
    (ref hybrid_graph_vector.py:337-453, global-max-seed quirk kept)."""
    nodes = _nodes(spark, sf_dir)
    edges = _edges(spark, sf_dir)
    qvec = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .head()["embedding"]
    )
    return semantic_graph_search(
        nodes, edges, qvec, k=K, expand_hops=EXPAND_HOPS,
        vector_weight=VW, graph_weight=GW,
    )


_GV4_ORACLE = f"""
WITH RECURSIVE {_GRAPH_CTES.strip()},
walk AS (
  SELECT 'v:0' AS node, ['v:0'] AS path_arr, 0 AS depth
  UNION ALL
  SELECT e.dst, list_append(w.path_arr, e.dst), w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < 3 AND NOT list_contains(w.path_arr, e.dst)
)
SELECT w.node AS end_id, CAST(w.depth AS INT) AS depth,
       array_to_string(w.path_arr, '->') AS path,
       ROUND({duckdb_distance("n.embedding", "q.qvec", "cosine")}, 6) AS dist
FROM walk w
JOIN nodes n ON n.id = w.node
CROSS JOIN q
WHERE w.depth >= 1
ORDER BY dist, path
LIMIT {K}
"""


@register("gv_traverse_rerank", _GV4_ORACLE)
def gv_traverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GV4: paths from v:0 (≤3 hops), endpoints cosine-reranked
    (ref hybrid_graph_vector.py:459-511)."""
    nodes = _nodes(spark, sf_dir)
    edges = _edges(spark, sf_dir)
    qvec = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .head()["embedding"]
    )
    return graph_search_with_reranking(
        nodes, edges, "v:0", qvec, k=K, max_depth=3
    )


_GV_EDGE_ORACLE = f"""
WITH eedges AS (
  SELECT 'v:' || prev AS src, 'v:' || vec_id AS dst, 'NEXT' AS type,
         embedding
  FROM (
    SELECT vec_id, embedding,
           lag(vec_id) OVER (PARTITION BY label ORDER BY vec_id) AS prev
    FROM embeddings
  ) WHERE prev IS NOT NULL
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
topk AS (
  SELECT src, dst, type,
         ROUND({duckdb_distance("eedges.embedding", "q.qvec", "cosine")}, 6)
           AS dist
  FROM eedges CROSS JOIN q
  ORDER BY dist, src, dst, type
  LIMIT {K}
)
SELECT src, dst, type, ROUND(1.0 - dist, 6) AS similarity
FROM topk
ORDER BY similarity DESC, src, dst, type
"""


@register("gv_edge_similarity", _GV_EDGE_ORACLE)
def gv_edge_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-embedding kNN (round-10 GV+ extra): the NEXT chain edges
    carry their dst node's embedding; top-k edges by cosine similarity
    to the vec_id=0 query. The reference STORES per-edge embeddings
    (hybrid_graph_vector.py:235-247) but has no search over them —
    this is the closing query for vector_search_edges. Tie-break is
    the actual (src, dst, type) tuple in BOTH engines (the selection
    key), then (similarity desc, src, dst, type) output order."""
    from fastpyvectordb_spark.operators.graphvector import (
        vector_search_edges,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    edges = (
        emb.select("vec_id", "label", "embedding")
        .withColumn("prev", F.lag("vec_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            F.concat(F.lit("v:"), F.col("prev")).alias("src"),
            F.concat(F.lit("v:"), F.col("vec_id")).alias("dst"),
            F.lit("NEXT").alias("type"),
            "embedding",
        )
    )
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    return vector_search_edges(edges, qvec, k=K, metric="cosine")
