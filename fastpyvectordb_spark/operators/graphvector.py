"""Hybrid graph+vector operators (reference ``hybrid_graph_vector.py``).

- GV2 ``vector_search``: kNN over nodes with label/property filters.
  Reference post-filters ANN output with ×10 over-fetch (:285-286); we
  pre-filter exactly (SURVEY §4 pinned deviation, strictly better
  recall). Similarity = ``1 - dist`` (cosine) / ``-dist`` (ip).

- GV3 ``semantic_graph_search`` (:337-453): seeds = top ``2k`` nodes by
  vector; joint BFS expansion ``expand_hops`` over *undirected* edges;
  an expanded node first discovered at hop h scores
  ``vw · best_seed_score · 1/(1+h) + gw · (1/h)`` where
  ``best_seed_score`` is the **global max** seed similarity — a
  reference quirk (:408-410) preserved deliberately; seeds keep their
  own similarity as the combined score. Filters apply to the union,
  then sort desc / head k.

- GV4 ``graph_search_with_reranking`` (:459-511): enumerate paths from
  a start node (G10), cosine-rerank path endpoints by the query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.distances import distance
from fastpyvectordb_spark.operators.graph import traverse
from fastpyvectordb_spark.operators.knn import knn

ROUND = 6


def _similarity(dist_col: Column, metric: str) -> Column:
    if metric == "cosine":
        return F.lit(1.0) - dist_col
    return -dist_col


def vector_search_nodes(
    nodes: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    label: str | None = None,
    properties: dict | None = None,
    metric: str = "cosine",
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """GV2 → (id, similarity) desc."""
    pre = None
    if label is not None:
        pre = F.array_contains("labels", label)
    for key, val in (properties or {}).items():
        c = F.col(key) == F.lit(val)
        pre = c if pre is None else (pre & c)
    top = knn(
        nodes, query_vec, k=k, metric=metric, pre_filter=pre,
        id_col=id_col, vec_col=vec_col,
    )
    return top.select(
        F.col(id_col),
        F.round(_similarity(F.col("dist"), metric), ROUND).alias("similarity"),
    ).orderBy(F.desc("similarity"), id_col)


def vector_search_edges(
    edges: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    edge_type: str | None = None,
    properties: dict | None = None,
    metric: str = "cosine",
    vec_col: str = "embedding",
) -> DataFrame:
    """kNN over EDGE embeddings → (src, dst, type, similarity) desc.

    The reference's hybrid store persists per-edge embeddings alongside
    the node sidecar (``hybrid_graph_vector.py:235-247``) but exposes
    no search over them — this twin of :func:`vector_search_nodes`
    closes that stores-but-can't-query asymmetry. Edge identity is the
    (src, dst, type) triple and ties break on that actual tuple — not
    on a ``src->dst#type`` concat, whose ordering diverges from the
    tuple's when ids contain '-'/'>'/'#' (e.g. dst='b#' vs dst='b').
    Same plan shape as node search: pre-filter →
    TakeOrderedAndProject, no shuffle beyond the top-k merge."""
    from fastpyvectordb_spark.operators.knn import _qvec_lit

    pre = None
    if edge_type is not None:
        pre = F.col("type") == F.lit(edge_type)
    for key, val in (properties or {}).items():
        c = F.col(key) == F.lit(val)
        pre = c if pre is None else (pre & c)
    if pre is not None:
        edges = edges.filter(pre)
    dist = F.round(
        distance(F.col(vec_col), _qvec_lit(query_vec), metric), ROUND
    )
    top = (
        edges.select("src", "dst", "type", dist.alias("dist"))
        .orderBy("dist", "src", "dst", "type")
        .limit(k)
    )
    return top.select(
        "src",
        "dst",
        "type",
        F.round(_similarity(F.col("dist"), metric), ROUND).alias("similarity"),
    ).orderBy(F.desc("similarity"), "src", "dst", "type")


def undirected(edges: DataFrame) -> DataFrame:
    """Both-direction adjacency (the reference expands direction='both').
    src-clustered in ONE shuffle (dropDuplicates after
    repartition("src") needs no exchange of its own), so the hop joins
    in :func:`semantic_graph_search` stream it shuffle- and sort-free
    with the frontier as the shuffled-hash build side — the
    traverse_df hop-join shape (operators/graph.py)."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        fwd.unionByName(rev)
        .repartition("src")
        .dropDuplicates(["src", "dst"])
    )


def semantic_graph_search(
    nodes: DataFrame,
    edges: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    expand_hops: int = 2,
    vector_weight: float = 0.7,
    graph_weight: float = 0.3,
    edge_type: str | None = None,
    metric: str = "cosine",
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """GV3 → (id, hop, vector_score, combined_score) sorted desc.

    All per-hop work is distributed joins; the loop is driver-side with
    checkpointed frontiers like the other traversals.
    """
    seed_k = k * 2
    seeds = knn(
        nodes, query_vec, k=seed_k, metric=metric, id_col=id_col, vec_col=vec_col
    ).select(
        F.col(id_col).alias("node_id"),
        _similarity(F.col("dist"), metric).alias("vector_score"),
    ).localCheckpoint()

    best_seed = seeds.agg(F.max("vector_score").alias("best")).head()["best"]

    e = edges if edge_type is None else edges.filter(F.col("type") == edge_type)
    adj = undirected(e).localCheckpoint()

    seed_rows = seeds.select(
        "node_id",
        F.lit(0).alias("hop"),
        F.col("vector_score"),
        F.col("vector_score").alias("combined_score"),
    )

    visited = seeds.select("node_id")
    frontier = visited
    expanded = []
    for hop in range(1, expand_hops + 1):
        nxt = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier.node_id == adj.src)
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(visited, "node_id", "left_anti")
        ).localCheckpoint()
        if nxt.isEmpty():
            break
        decay = 1.0 / (1.0 + hop)
        combined = vector_weight * best_seed * decay + graph_weight * (1.0 / hop)
        expanded.append(
            nxt.select(
                "node_id",
                F.lit(hop).alias("hop"),
                F.lit(best_seed * decay).alias("vector_score"),
                F.lit(combined).alias("combined_score"),
            )
        )
        visited = visited.unionByName(nxt.select("node_id")).localCheckpoint()
        frontier = nxt

    out = seed_rows
    for ex in expanded:
        out = out.unionByName(ex)
    return (
        out.select(
            "node_id",
            "hop",
            F.round("vector_score", ROUND).alias("vector_score"),
            F.round("combined_score", ROUND).alias("combined_score"),
        )
        .orderBy(F.desc("combined_score"), "node_id")
        .limit(k)
    )


def graph_search_with_reranking(
    nodes: DataFrame,
    edges: DataFrame,
    start_id: str,
    query_vec: Sequence[float],
    k: int = 10,
    max_depth: int = 3,
    metric: str = "cosine",
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """GV4 → (end_id, depth, path, dist) — paths from start, endpoints
    reranked by distance to the query embedding."""
    paths = traverse(edges, [start_id], max_depth=max_depth)
    emb = nodes.select(F.col(id_col).alias("end_id"), F.col(vec_col).alias("_v"))
    qlit = F.array(*[F.lit(float(v)).cast("float") for v in query_vec])
    # paths (bounded path enumeration) is the small side; the hint
    # keeps a mis-estimated node table from being broadcast-built and
    # pins paths as the per-partition hash (dedup._rerank pattern)
    return (
        paths.hint("shuffle_hash").join(emb, "end_id")
        .select(
            "end_id",
            "depth",
            "path",
            F.round(distance(F.col("_v"), qlit, metric), ROUND).alias("dist"),
        )
        .orderBy("dist", "path")
        .limit(k)
    )
