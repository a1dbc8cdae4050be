"""Random-hyperplane LSH for cosine ANN (SURVEY §7 M8).

The reference's accelerator is a C++ HNSW graph — inherently
single-node. The Spark-native equivalent trades the graph walk for
*bucket pruning*: H seeded random hyperplanes give every vector an
H-bit signature; near-cosine vectors collide with high probability.
Search probes the query's bucket plus its ``multiprobe`` nearest
variants (lowest |projection| bits flipped), exact-reranks the
candidates, and returns top-k — recall-tunable via H/multiprobe,
validated by the recall@k harness in tests (BASELINE recall gates).

At scale: signatures are a tiny derived column; bucketing the table by
signature makes the probe a partition-pruned scan, and the rerank
touches only candidates. No shuffle of the full vector table, ever.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators.knn import knn


def hyperplanes(dims: int, n_bits: int = 12, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_bits, dims).astype(np.float64)


def _dot_lit(vec_col: Column, plane: np.ndarray) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def signature_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """H-bit signature as an int: bit i = (v·plane_i) > 0."""
    sig = None
    for i, p in enumerate(planes):
        bit = F.when(_dot_lit(vec_col, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("int")


def add_signatures(
    df: DataFrame, planes: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    return df.withColumn("lsh_sig", signature_expr(F.col(vec_col), planes))


def query_buckets(
    query_vec: Sequence[float], planes: np.ndarray, multiprobe: int = 8
) -> list[int]:
    """The query's bucket + multiprobe variants, flipping the lowest-
    confidence bits (smallest |projection|) first."""
    import itertools

    q = np.asarray(query_vec, dtype=np.float64)
    projs = planes @ q
    base = 0
    for i, p in enumerate(projs):
        if p > 0:
            base |= 1 << i
    order = [int(i) for i in np.argsort(np.abs(projs))]  # least confident first
    buckets = [base]
    # flip growing subsets of the least-confident bits until the probe
    # budget is filled
    for r in range(1, len(order) + 1):
        for combo in itertools.combinations(order, r):
            b = base
            for i in combo:
                b ^= 1 << i
            buckets.append(b)
            if len(buckets) >= multiprobe:
                return list(dict.fromkeys(buckets))[:multiprobe]
    return list(dict.fromkeys(buckets))[:multiprobe]


def lsh_knn(
    signed: DataFrame,
    query_vec: Sequence[float],
    planes: np.ndarray,
    k: int = 10,
    multiprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe buckets → exact rerank. ``signed`` must carry ``lsh_sig``
    (bucket/partition column → the isin prunes partitions)."""
    buckets = query_buckets(query_vec, planes, multiprobe)
    cands = signed.filter(F.col("lsh_sig").isin(buckets))
    return knn(cands, query_vec, k=k, metric="cosine", id_col=id_col, vec_col=vec_col)
