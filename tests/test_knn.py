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


def test_topk_rows_tied_sampled_path_matches_ground_truth():
    """Wide rows (n ≥ 64·kk) take the sampled-threshold pruning path
    (round 9): the sample's kk-th order stat can only OVERestimate the
    true one, so the candidate mask is a superset of the top-kk. Pin
    every regime of that path against lexsort ground truth: clean rows
    (vectorized cut), boundary ties (per-row lexsort fallback),
    blown-cap rows from massive value ties (full-path re-cut), and a
    mix of all three in one matrix."""
    import numpy as np

    from fastpyvectordb_spark.operators.knn import topk_rows_tied

    rng = np.random.RandomState(11)

    def check(d, ids, kk):
        p = topk_rows_tied(d, ids, kk)
        for r in range(d.shape[0]):
            want = np.lexsort((ids, d[r]))[:kk]
            got = sorted(zip(d[r][p[r]], ids[p[r]]))
            assert got == sorted(zip(d[r][want], ids[want])), (kk, r)

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)
    # clean random rows across kk values, covering BOTH sides of the
    # n ≥ 64·kk dispatch: kk=31 (64·31 = 1984 ≤ 2000) is the last kk on
    # the sampled path, kk=32 (64·32 = 2048 > 2000) falls to
    # _topk_rows_tied_full
    d = rng.randn(23, n).astype(np.float32)
    for kk in (1, 5, 10, 31, 32):
        check(d, ids, kk)
    # ties exactly at the cut boundary: 20 equal minima, kk=10
    db = rng.randn(8, n).astype(np.float32)
    db[:, 100:120] = -5.0
    check(db, ids, 10)
    # massive value ties (dedup duplicate-heavy case) blow the
    # candidate cap -> full-path re-cut for those rows
    dt = rng.choice([0.0, 0.0, 0.1, 0.2], size=(8, n)).astype(np.float32)
    check(dt, ids, 10)
    # mixed: constant rows, boundary-tie rows, clean rows together
    dm = rng.randn(12, n).astype(np.float32)
    dm[::4] = 0.25
    dm[1, 50:70] = -9.0
    check(dm, ids, 10)
