"""Property-graph operators over nodes/edges DataFrames
(reference ``graph.py`` — GraphDB with 5 in-memory indexes).

Spark-first: the graph is two (three) DataFrames —
``nodes(id, labels ARRAY<STRING>, ...props)``,
``edges(id, src, dst, type, ...props)``,
``hyperedges(id, nodes ARRAY<STRING>, type, ...props)`` — and every
reference "index" (label, property, adjacency, type, membership) is
just a predicate or join that Catalyst serves from column statistics
and pushdown; at scale you partition/Z-order edges by ``src`` (and a
dst-sorted copy, like any adjacency list) instead of hand-maintaining
dicts.

Traversals (G10/G11) are iterative frontier joins — the GraphFrames
BFS shape: each hop is ``frontier ⋈ edges`` with an
``array_contains(path, dst)`` cycle guard; the loop is driver-side but
each step is a fully distributed join. Depth is capped (reference
default 3) and lineage grows linearly with hops (checkpoint for deep
traversals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# lookups (G4-G8)
# ---------------------------------------------------------------------------

def nodes_by_label(nodes: DataFrame, label: str) -> DataFrame:
    """G4: label-index lookup → WHERE array_contains(labels, l)."""
    return nodes.filter(F.array_contains("labels", label))


def find_nodes(
    nodes: DataFrame,
    label: str | None = None,
    properties: dict[str, object] | None = None,
) -> DataFrame:
    """G5: label ∩ exact property matches (conjunctive WHERE)."""
    df = nodes
    if label is not None:
        df = df.filter(F.array_contains("labels", label))
    for key, val in (properties or {}).items():
        df = df.filter(F.col(key) == F.lit(val))
    return df


def nodes_by_property_range(
    nodes: DataFrame,
    key: str,
    lo: float | None = None,
    hi: float | None = None,
    label: str | None = None,
) -> DataFrame:
    """G6: numeric range over a property, optional label conjunct."""
    df = nodes if label is None else nodes_by_label(nodes, label)
    if lo is not None:
        df = df.filter(F.col(key) >= lo)
    if hi is not None:
        df = df.filter(F.col(key) <= hi)
    return df


def edges_by_type(edges: DataFrame, edge_type: str) -> DataFrame:
    """G7: type-index lookup."""
    return edges.filter(F.col("type") == edge_type)


def out_edges(edges: DataFrame, node_id: str, edge_type: str | None = None) -> DataFrame:
    df = edges.filter(F.col("src") == node_id)
    return df if edge_type is None else df.filter(F.col("type") == edge_type)


def in_edges(edges: DataFrame, node_id: str, edge_type: str | None = None) -> DataFrame:
    df = edges.filter(F.col("dst") == node_id)
    return df if edge_type is None else df.filter(F.col("type") == edge_type)


def neighbors(
    edges: DataFrame,
    node_id: str,
    direction: str = "both",
    edge_type: str | None = None,
) -> DataFrame:
    """G9: neighbor ids of a node → (neighbor_id, direction, type)."""
    parts = []
    if direction in ("out", "both"):
        parts.append(
            out_edges(edges, node_id, edge_type).select(
                F.col("dst").alias("neighbor_id"),
                F.lit("out").alias("direction"),
                F.col("type"),
            )
        )
    if direction in ("in", "both"):
        parts.append(
            in_edges(edges, node_id, edge_type).select(
                F.col("src").alias("neighbor_id"),
                F.lit("in").alias("direction"),
                F.col("type"),
            )
        )
    if not parts:
        raise ValueError(f"direction must be out/in/both, got {direction!r}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def degrees(edges: DataFrame, direction: str = "in") -> DataFrame:
    """A4 shape: degree per node → (node_id, degree). ``direction`` is
    validated like :func:`neighbors` — a typo silently mapping to
    out-degree was a wrong-answer generator; ``both`` counts each
    endpoint appearance."""
    if direction not in ("in", "out", "both"):
        raise ValueError(f"direction must be in/out/both, got {direction!r}")
    if direction == "both":
        ends = edges.select(F.col("src").alias("node_id")).unionAll(
            edges.select(F.col("dst").alias("node_id"))
        )
        return ends.groupBy("node_id").agg(F.count("*").alias("degree"))
    key = "dst" if direction == "in" else "src"
    return edges.groupBy(F.col(key).alias("node_id")).agg(
        F.count("*").alias("degree")
    )


# ---------------------------------------------------------------------------
# traversals (G10-G11)
# ---------------------------------------------------------------------------

def traverse(
    edges: DataFrame,
    start_ids: list[str],
    max_depth: int = 3,
    edge_type: str | None = None,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """G10: every simple path of 1..max_depth edges from the start set.

    Returns (start_id, end_id, depth, path) with ``path`` a
    '->'-joined node-id string (portable across engines). Cycle
    avoidance within a path via array_contains, like the reference DFS.
    """
    spark = edges.sparkSession
    start_df = spark.createDataFrame(
        [(s,) for s in start_ids], "start_id string"
    )
    return traverse_df(
        edges, start_df, max_depth=max_depth, edge_type=edge_type,
        checkpoint_every=checkpoint_every,
    )


def traverse_df(
    edges: DataFrame,
    start_df: DataFrame,
    max_depth: int = 3,
    edge_type: str | None = None,
    checkpoint_every: int | None = None,
    start_col: str = "start_id",
) -> DataFrame:
    """:func:`traverse` seeded by a DataFrame instead of a driver-side
    id list — the frontier begins as a join, so a non-selective seed
    pattern (e.g. a loose Cypher left node) never collects to the
    driver. Same output contract as :func:`traverse`."""
    e = edges if edge_type is None else edges_by_type(edges, edge_type)
    # ONE src-clustered shuffle serves every hop: dropDuplicates after
    # repartition("src") dedups with no exchange of its own
    # (HashPartitioning(src) satisfies the (src,dst) clustering), the
    # identical repartition subtree is reused across hops
    # (ReusedExchange), and the hop joins below pin the FRONTIER as the
    # shuffled-hash build side — so the frontier is the only per-hop
    # shuffle and the edge table is never re-sorted. The previous
    # distinct + unhinted join sort-merge-joined every hop: the edge
    # table re-sorted per hop, and at 100 TB each of those sorts
    # dwarfs the traversal itself.
    e = (
        e.select("src", "dst")
        .repartition("src")
        .dropDuplicates(["src", "dst"])
    )
    frontier = start_df.select(
        F.col(start_col).cast("string").alias("start_id")
    ).distinct().select(
        "start_id",
        F.col("start_id").alias("node"),
        F.array(F.col("start_id")).alias("path_arr"),
        F.lit(0).alias("depth"),
    )
    results = None
    for hop in range(1, max_depth + 1):
        frontier = (
            frontier.hint("shuffle_hash").join(e, frontier.node == e.src)
            .filter(~F.array_contains(F.col("path_arr"), F.col("dst")))
            .select(
                "start_id",
                F.col("dst").alias("node"),
                F.concat(F.col("path_arr"), F.array(F.col("dst"))).alias("path_arr"),
                F.lit(hop).alias("depth"),
            )
        )
        if checkpoint_every and hop % checkpoint_every == 0:
            frontier = frontier.localCheckpoint(eager=False)
        step = frontier.select(
            "start_id",
            F.col("node").alias("end_id"),
            "depth",
            F.array_join("path_arr", "->").alias("path"),
        )
        results = step if results is None else results.unionByName(step)
    if results is None:
        # max_depth=0: a well-typed EMPTY result, never None — callers
        # chain .filter/.collect directly (cypher var-length paths do)
        spark = edges.sparkSession
        return spark.createDataFrame(
            [],
            "start_id string, end_id string, depth int, path string",
        )
    return results


DRIVER_FRONTIER_LIMIT = 20_000


def bfs_levels(
    edges: DataFrame,
    start_id: str,
    max_depth: int = 4,
    edge_type: str | None = None,
) -> DataFrame:
    """G11 core: min-hop distance to every node reachable within
    max_depth (directed, out-edges). Returns (node_id, hops).

    Adaptive frontier strategy: while the frontier fits comfortably on
    the driver it is kept as a Python set and each hop is ONE
    distributed filter with an ``isin`` predicate pushed into the edge
    scan (one job per hop). If a hop explodes past the limit, the loop
    switches to the fully-distributed join form with checkpointed
    lineage — the same escalation GraphFrames' BFS makes.
    """
    e = edges if edge_type is None else edges_by_type(edges, edge_type)
    e = e.select("src", "dst")
    spark = edges.sparkSession

    # driver-frontier phase
    visited: dict[str, int] = {start_id: 0}
    frontier = [start_id]
    for hop in range(1, max_depth + 1):
        rows = (
            e.filter(F.col("src").isin(frontier))
            .select("dst")
            .distinct()
            .collect()
        )
        nxt = [r["dst"] for r in rows if r["dst"] not in visited]
        for n in nxt:
            visited[n] = hop
        frontier = nxt
        if not frontier:
            break
        if len(frontier) > DRIVER_FRONTIER_LIMIT:
            return _bfs_levels_distributed(
                spark, e, visited, frontier, hop, max_depth
            )
    return spark.createDataFrame(
        list(visited.items()), "node_id string, hops int"
    )


def _bfs_levels_distributed(
    spark, e: DataFrame, seen: dict[str, int], frontier_ids: list[str],
    start_hop: int, max_depth: int
) -> DataFrame:
    """Continuation of bfs_levels once the frontier outgrows the driver."""
    # src-clustered then checkpointed: the stored blocks keep the
    # HashPartitioning(src), so every hop's shuffled-hash join streams
    # the edge table with NO exchange (see traverse_df for the shape)
    e = (
        e.repartition("src")
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    visited = spark.createDataFrame(
        list(seen.items()), "node_id string, hops int"
    ).localCheckpoint()
    frontier = spark.createDataFrame(
        [(f,) for f in frontier_ids], "node_id string"
    )
    for hop in range(start_hop + 1, max_depth + 1):
        nxt = (
            frontier.hint("shuffle_hash")
            .join(e, frontier.node_id == e.src)
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(visited.select("node_id"), "node_id", "left_anti")
        ).localCheckpoint()
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.withColumn("hops", F.lit(hop))
        ).localCheckpoint()
        frontier = nxt
    return visited


def shortest_path(
    edges: DataFrame,
    src_id: str,
    dst_id: str,
    max_depth: int = 4,
    edge_type: str | None = None,
) -> DataFrame:
    """G11: BFS shortest path (directed out), early-stop on arrival.

    Returns one row (src_id, dst_id, hops, path) or zero rows.
    """
    e = edges if edge_type is None else edges_by_type(edges, edge_type)
    # same hop-join shape as traverse_df: one src-clustered shuffle for
    # the whole walk, frontier as the shuffled-hash build side
    e = (
        e.select("src", "dst")
        .repartition("src")
        .dropDuplicates(["src", "dst"])
    )
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(src_id, [src_id], 0)], "node string, path_arr array<string>, depth int"
    )
    for hop in range(1, max_depth + 1):
        frontier = (
            frontier.hint("shuffle_hash").join(e, frontier.node == e.src)
            .filter(~F.array_contains(F.col("path_arr"), F.col("dst")))
            .select(
                F.col("dst").alias("node"),
                F.concat(F.col("path_arr"), F.array(F.col("dst"))).alias("path_arr"),
                F.lit(hop).alias("depth"),
            )
        )
        hit = frontier.filter(F.col("node") == dst_id)
        if not hit.isEmpty():
            # deterministic representative path: lexicographically smallest
            return (
                hit.select(
                    F.lit(src_id).alias("src_id"),
                    F.lit(dst_id).alias("dst_id"),
                    F.col("depth").alias("hops"),
                    F.array_join("path_arr", "->").alias("path"),
                )
                .orderBy("path")
                .limit(1)
            )
    return spark.createDataFrame(
        [], "src_id string, dst_id string, hops int, path string"
    )


# ---------------------------------------------------------------------------
# hyperedges (G12)
# ---------------------------------------------------------------------------

def hyperedges_by_nodes(
    hyperedges: DataFrame, node_ids: list[str], mode: str = "any"
) -> DataFrame:
    """G12: hyperedges whose ``nodes`` array contains any/all of the ids."""
    member = hyperedges.select(
        "id", F.explode("nodes").alias("member")
    ).filter(F.col("member").isin(node_ids))
    if mode == "any":
        return member.select("id").distinct()
    if mode == "all":
        return (
            member.distinct()
            .groupBy("id")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") == len(set(node_ids)))
            .select("id")
        )
    raise ValueError(f"mode must be any/all, got {mode!r}")


def graph_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """G13: counts + distinct labels/types as one row."""
    n_nodes = nodes.select(F.count("*").alias("n_nodes"))
    n_labels = nodes.select(F.explode("labels").alias("l")).select(
        F.countDistinct("l").alias("n_labels")
    )
    e = edges.agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("type").alias("n_edge_types"),
    )
    return n_nodes.crossJoin(n_labels).crossJoin(e)


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation over an undirected edge set →
    (node, n_triangles), descending.

    Input edges may be directed/duplicated; they are canonicalized to
    distinct (a < b) pairs first (the degree-orientation trick), so
    each triangle is enumerated exactly once as a<b<c and then charged
    to its three corners.

    Scale shape: the standard two-join MapReduce formulation — every
    join is an equi-join on a node id, so the cost is bounded by
    Σ_v deg(v)² wedge enumeration, not |V|³; AQE's skew handling
    splits hub nodes. This is the shape GraphX/GraphFrames use.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")  # x < y < z
    tri = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "node")
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank in exact fixed-point integer arithmetic →
    (node, r BIGINT) where ``r`` is the rank in micro-units.

    Every step is int64 math — ``r DIV outdeg`` per edge, SUM, then
    ``150000 + 850000·(s DIV 1e6) + (850000·(s mod 1e6)) DIV 1e6``
    (damping 0.85, overflow-free split multiply) — so the result
    is bit-exact regardless of partitioning, join order, or engine:
    the property that makes an *iterative* algorithm oracle-checkable,
    which float PageRank never is (its sums are order-sensitive).
    Dangling-node mass is dropped (ranks need not sum to a constant);
    initial rank is 1e6 per node.

    Scale shape: per iteration one equi-join ranks⋈edges (shuffle on
    src) and one ``groupBy(dst)`` partial-agg shuffle — the GraphX/
    Pregel message-passing plan. ``localCheckpoint`` every
    ``checkpoint_every`` iterations truncates the growing lineage so
    plan compilation stays O(1) per step.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.select(src, dst).join(deg, src)
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("r"))
    for i in range(iters):
        contrib = (
            e.join(ranks, e[src] == ranks["node"])
            .select(F.col(dst).alias("node"), F.expr("r DIV outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("s"), F.lit(0).cast("long")).alias("s"),
            )
            .select(
                "node",
                # split multiply: a bare 850000*s wraps int64 once the
                # hub mass s passes ~1.08e13 (≈11M-node graphs); the
                # quotient/remainder identity is exact for s ≥ 0 and
                # keeps every term far inside int64 — in BOTH engines
                F.expr(
                    "CAST(150000 + 850000 * (s DIV 1000000)"
                    " + (850000 * (s % 1000000)) DIV 1000000 AS BIGINT)"
                ).alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def duckdb_pagerank_ctes(iters: int = 8) -> str:
    """Chained CTEs ``pr0..pr{iters}`` — the identical fixed-point
    iteration in DuckDB (unrolled: SQL forbids aggregates in recursive
    terms). Expects an ``edges(src, dst, ...)`` CTE in scope; the final
    ranks table is ``pr{iters}(node, r)``."""
    parts = [
        """prnodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
),
prdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM prnodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""pr{i} AS (
  SELECT n.node,
         CAST(150000 + 850000 * (COALESCE(s.c, 0) // 1000000)
              + (850000 * (COALESCE(s.c, 0) % 1000000)) // 1000000 AS BIGINT) AS r
  FROM prnodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // d.outdeg) AS c
    FROM edges e
    JOIN prdeg d ON e.src = d.src
    JOIN pr{i - 1} p ON p.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    return ",\n".join(parts)
