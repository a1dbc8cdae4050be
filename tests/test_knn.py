"""kNN operator tests: exact vs GEMM path equivalence, filter
semantics, batch ranking shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators.knn import knn, knn_batch_gemm, knn_join


@pytest.fixture(scope="module")
def qvec(embeddings):
    return embeddings.filter(F.col("vec_id") == 0).head()["embedding"]


def test_knn_self_is_nearest(embeddings, qvec):
    top = knn(embeddings, qvec, k=3, metric="cosine").collect()
    assert top[0]["vec_id"] == 0
    assert top[0]["dist"] == pytest.approx(0.0, abs=1e-6)
    assert [r["dist"] for r in top] == sorted(r["dist"] for r in top)


def test_knn_prefilter_only_matching_labels(embeddings, qvec):
    top = knn(
        embeddings, qvec, k=5, pre_filter=F.col("label") == 2
    ).withColumnRenamed("vec_id", "id")
    ids = [r["id"] for r in top.collect()]
    labels = {
        r["label"]
        for r in embeddings.filter(F.col("vec_id").isin(ids)).collect()
    }
    assert labels == {2}


def test_gemm_matches_exact(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in knn_join(embeddings, queries, k=10, metric="cosine").collect()
    }
    qpdf = queries.toPandas()
    gemm = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in knn_batch_gemm(embeddings, qpdf, k=10, metric="cosine").collect()
    }
    # same neighbor sets per query (float32 GEMM vs double expr can swap
    # near-equal ranks, so compare sets not orders)
    for qid in range(4):
        e = {v for (q, _), v in exact.items() if q == qid}
        g = {v for (q, _), v in gemm.items() if q == qid}
        assert len(e & g) >= 9, f"query {qid}: {e} vs {g}"


@pytest.mark.parametrize("metric", ["cosine", "l2", "ip"])
def test_gemm_metrics_run(embeddings, metric):
    import pandas as pd

    q = embeddings.filter(F.col("vec_id") == 0).head()["embedding"]
    qpdf = pd.DataFrame({"query_id": [0], "query_vec": [list(q)]})
    rows = knn_batch_gemm(embeddings, qpdf, k=5, metric=metric).collect()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 0  # self is nearest under all metrics


def test_topk_rows_tied_matches_lexsort_ground_truth():
    """The argpartition fast path must fall back to exact (dist, id)
    selection whenever a distance tie crosses the cut boundary —
    duplicate vectors are the dedup workload's defining case."""
    import numpy as np

    from fastpyvectordb_spark.operators.knn import topk_rows_tied

    rng = np.random.RandomState(7)
    ids = np.arange(50, dtype=np.int64)
    rng.shuffle(ids)
    for trial in range(20):
        # heavy ties: distances drawn from few distinct values
        d = rng.choice([0.1, 0.2, 0.2, 0.3], size=(4, 50)).astype(float)
        for kk in (1, 3, 10, 49, 50):
            p = topk_rows_tied(d, ids, kk)
            for r in range(d.shape[0]):
                want = np.lexsort((ids, d[r]))[:kk]
                got_pairs = sorted(zip(d[r][p[r]], ids[p[r]]))
                want_pairs = sorted(zip(d[r][want], ids[want]))
                assert got_pairs == want_pairs, (trial, kk, r)
