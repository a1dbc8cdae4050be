"""Property-graph persistence (reference ``graph.py:540-582`` S8).

The reference dumps the whole graph to one JSON file and rebuilds five
dict indexes on load. Here a graph persists as two (three) parquet
tables — no indexes to rebuild, Catalyst serves lookups from column
stats/pushdown; edges are also written partitioned by ``type`` so
typed traversals prune partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def save_graph(
    path: str,
    nodes: DataFrame,
    edges: DataFrame,
    hyperedges: DataFrame | None = None,
) -> None:
    nodes.write.mode("overwrite").parquet(os.path.join(path, "nodes"))
    edges.write.mode("overwrite").partitionBy("type").parquet(
        os.path.join(path, "edges")
    )
    if hyperedges is not None:
        hyperedges.write.mode("overwrite").parquet(
            os.path.join(path, "hyperedges")
        )


def load_graph(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    nodes = spark.read.parquet(os.path.join(path, "nodes"))
    edges = spark.read.parquet(os.path.join(path, "edges"))
    hpath = os.path.join(path, "hyperedges")
    hyper = spark.read.parquet(hpath) if os.path.exists(hpath) else None
    return nodes, edges, hyper
