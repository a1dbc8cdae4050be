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


def ivf_search_batch(
    index: IVFIndex,
    queries_pdf,
    k: int = 10,
    nprobe: int = 4,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch ANN: every query probes its ``nprobe`` nearest lists; each
    list is scanned ONCE for all queries probing it (one GEMM per list
    against that list's query subset), then a global window merge keeps
    the exact top-k of the probed candidates.

    ``queries_pdf`` needs columns ``query_id`` (int64) and ``query_vec``.
    The probe map (query→lists) is computed driver-side against the
    (tiny) centroid table and closure-shipped; the vector table is
    grouped by ``list_id`` — with a saved index partitioned by list the
    shuffle disappears into partition pruning. Output:
    ``(query_id, rank, <id_col>, dist)``.
    """
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from fastpyvectordb_spark.operators.knn import _gemm_topk_chunked

    eps = 1e-10
    qids = queries_pdf["query_id"].to_numpy()
    qmat = np.stack(
        [np.asarray(v, dtype=np.float32) for v in queries_pdf["query_vec"]]
    )
    if metric == "cosine":
        qn = qmat / (np.linalg.norm(qmat, axis=1, keepdims=True) + eps)
    else:
        qn = qmat
    # per-query probe lists against the centroids (driver-side, tiny)
    cd = (
        (index.centroids[None, :, :] - qmat.astype(np.float64)[:, None, :]) ** 2
    ).sum(axis=2)
    probe = np.argsort(cd, axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_map: dict[int, np.ndarray] = {}
    for lid in np.unique(probe):
        probe_map[int(lid)] = np.nonzero((probe == lid).any(axis=1))[0]

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("dist", DoubleType()),
        ]
    )

    def per_list(key, pdf: pd.DataFrame) -> pd.DataFrame:
        lid = int(key[0])
        qidx = probe_map.get(lid)
        if qidx is None or pdf.empty:
            return pd.DataFrame(
                {"query_id": [], id_col: [], "dist": []}
            ).astype({"query_id": "int64", id_col: "int64", "dist": "float64"})
        ids = pdf[id_col].to_numpy()
        vmat = np.stack([np.asarray(v, dtype=np.float32) for v in pdf[vec_col]])
        kk = min(k, len(ids))
        d, i = _gemm_topk_chunked(qn[qidx], vmat, ids, kk, metric)
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids[qidx], kk),
                id_col: i.ravel(),
                "dist": d.ravel().astype("float64"),
            }
        )

    partials = (
        index.assigned.select("list_id", id_col, vec_col)
        .groupBy("list_id")
        .applyInPandas(per_list, schema=out_schema)
    )
    w = Window.partitionBy("query_id").orderBy("dist", id_col)
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "dist")
    )
