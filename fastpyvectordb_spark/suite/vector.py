"""Vector kNN suite queries (SURVEY §2.4: K1-K11).

All run over the driver's ``embeddings`` table
``(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)``. The canonical
query vector is the embedding of ``vec_id = 0`` (deterministic at every
scale factor); batch queries use ``vec_id < 8``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.distances import (
    distance,
    duckdb_distance,
)
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table

K = 10
BATCH_K = 5
ROUND = 6


def _knn_plan(spark: SparkSession, sf_dir: str, metric: str, label_filter: int | None = None) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    base = emb
    if label_filter is not None:
        base = base.filter(F.col("label") == label_filter)
    dist = F.round(distance(F.col("embedding"), F.col("qvec"), metric), ROUND)
    return (
        base.crossJoin(F.broadcast(q))
        .select("vec_id", dist.alias("dist"))
        .orderBy("dist", "vec_id")
        .limit(K)
    )


def _knn_oracle(metric: str, where: str = "") -> str:
    d = duckdb_distance("e.embedding", "q.qvec", metric)
    return f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, ROUND({d}, {ROUND}) AS dist
FROM embeddings e CROSS JOIN q
{where}
ORDER BY dist, vec_id
LIMIT {K}
"""


@register("knn_cosine", _knn_oracle("cosine"))
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K3/K11: exact cosine top-k (ref vectordb_optimized.py:650-721)."""
    return _knn_plan(spark, sf_dir, "cosine")


@register("knn_l2", _knn_oracle("l2"))
def knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_plan(spark, sf_dir, "l2")


@register("knn_ip", _knn_oracle("ip"))
def knn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_plan(spark, sf_dir, "ip")


@register("knn_filtered", _knn_oracle("cosine", where="WHERE e.label = 3"))
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered kNN with pre-filter semantics (SURVEY §4: strictly
    better recall than the reference's ×10-overfetch post-filter)."""
    return _knn_plan(spark, sf_dir, "cosine", label_filter=3)


_BATCH_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id AS query_id, e.vec_id AS vec_id,
         ROUND({duckdb_distance("e.embedding", "q.qvec", "cosine")}, {ROUND}) AS dist
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, dist,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {BATCH_K}
ORDER BY query_id, rank
"""


@register("knn_batch", _BATCH_ORACLE)
def knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/K6: batch kNN — broadcast queries, window rank per query
    (ref vectordb_optimized.py:577-644, parallel_search.py:246-311)."""
    from fastpyvectordb_spark.operators.knn import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = knn_join(emb, qs, k=BATCH_K, metric="cosine")
    return res.select(
        "query_id", "vec_id", "dist", F.col("rank").cast("long").alias("rank")
    )
