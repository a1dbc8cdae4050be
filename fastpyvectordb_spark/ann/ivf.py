"""IVF (inverted-file) ANN: coarse KMeans partitioning + probed scan.

The classic batch-built ANN index for a data-parallel engine
(BASELINE.json: "MLlib/DataFrame batch index build"):

1. build: MLlib KMeans (seeded) → ``n_lists`` coarse centroids; each
   vector is assigned to its nearest list. Persisting the table
   *partitioned by list_id* turns every probe into partition pruning —
   at 100 TB a 4096-list index means a 16-probe query reads ~0.4% of
   the data.
2. search: rank centroids by distance to the query, scan the nearest
   ``nprobe`` lists, exact-rerank candidates (same TakeOrdered merge as
   the exact path).

Recall is tunable via nprobe and validated against the exact operator
(recall@k, reference-style harness).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators.knn import knn


@dataclass
class IVFIndex:
    centroids: np.ndarray  # (n_lists, D)
    assigned: DataFrame    # original cols + list_id

    def save(self, path: str) -> None:
        """Partitioned-by-list parquet: probes become partition pruning."""
        self.assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_build(
    df: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> IVFIndex:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_lists, seed=seed, maxIter=max_iter, featuresCol="_features").fit(feats)
    assigned = (
        model.transform(feats)
        .withColumnRenamed("prediction", "list_id")
        .drop("_features")
    )
    centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])
    return IVFIndex(centroids=centroids, assigned=assigned)


def ivf_search(
    index: IVFIndex,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((index.centroids - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d)[:nprobe]]
    cands = index.assigned.filter(F.col("list_id").isin(probe))
    return knn(cands, query_vec, k=k, metric=metric, id_col=id_col, vec_col=vec_col)
