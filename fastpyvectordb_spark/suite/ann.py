"""ANN suite queries — approximate operators with no SQL oracle
(k-means training / seeded-hyperplane projections aren't expressible
in DuckDB SQL). Registered without an oracle → the driver records the
weaker rows-only check; semantic validation is the recall@k harness in
tests/test_ann.py, mirroring the reference's own methodology
(quantization.py:691-703).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.ann.ivf import ivf_build, ivf_search
from fastpyvectordb_spark.ann.lsh import add_signatures, hyperplanes, lsh_knn
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table


@register("ann_ivf_knn")
def ann_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(32 lists, nprobe=8) cosine top-10 for the canonical query."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    index = ivf_build(emb, n_lists=32)
    return ivf_search(index, qvec, k=10, nprobe=8)


@register("ann_lsh_knn")
def ann_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH (6 bits, multiprobe 16) cosine top-10."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    planes = hyperplanes(64, n_bits=6, seed=42)
    signed = add_signatures(emb, planes)
    return lsh_knn(signed, qvec, planes, k=10, multiprobe=16)


@register("ann_ivfpq_knn")
def ann_ivfpq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (8 lists, M=8, K=16) ADC search with exact refine — the
    billion-scale index shape (coarse partition pruning + M-byte codes
    + candidate-join rerank). Recall gate: tests/test_ann.py."""
    from fastpyvectordb_spark.ann.ivfpq import ivfpq_build, ivfpq_search

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    index = ivfpq_build(emb, n_lists=8, m_subspaces=8, n_centroids=16,
                        max_iter=20)
    return ivfpq_search(index, qvec, k=10, nprobe=8, refine_df=emb, refine=50)


@register("ann_partitioned_knn")
def ann_partitioned_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local IVF-Flat artifacts (§7-M8c, the HNSW-parity
    single-query path): one map-side job probes each partition's own
    index, TakeOrdered merges partitions×k rows. Recall gate:
    tests/test_ann.py::test_partitioned_index_recall (≥0.95)."""
    from fastpyvectordb_spark.ann.partitioned import (
        partitioned_build, partitioned_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    index = partitioned_build(emb, n_parts=8, n_lists=16)
    return partitioned_search(index, qvec, k=10, nprobe=10)


@register("ann_nsw_knn")
def ann_nsw_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NSW graph search (the reference's hnswlib family, built natively
    per partition — greedy beam over bidirectional m-degree links).
    Recall gate: tests/test_ann.py::test_nsw_graph_recall (≥0.95)."""
    from fastpyvectordb_spark.ann.nsw import nsw_build, nsw_search

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    index = nsw_build(emb, n_parts=8, m=8, m_max=16, ef_construction=32)
    return nsw_search(index, qvec, k=10, ef=48)
