"""Pin the distance formulas against NumPy reference kernels
(semantics of parallel_search.py:105-134 incl. the 1e-10 epsilon)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.distances import (
    cosine_distance,
    distance,
    ip_distance,
    l2_distance,
)


@pytest.fixture(scope="module")
def sample(embeddings):
    rows = embeddings.orderBy("vec_id").limit(50).collect()
    return {r["vec_id"]: np.array(r["embedding"], dtype=np.float32) for r in rows}


def _np_cosine(q, v):
    # float64 — our engine's pinned precision (the reference computes the
    # same formula in float32; formulas match, precision is upgraded)
    q = q.astype(np.float64)
    v = v.astype(np.float64)
    qn = q / (np.linalg.norm(q) + 1e-10)
    vn = v / (np.linalg.norm(v) + 1e-10)
    return 1.0 - float(np.dot(vn, qn))


def _spark_dist(spark, a, b, metric):
    df = spark.createDataFrame(
        [([float(x) for x in a], [float(x) for x in b])],
        "a array<float>, b array<float>",
    )
    return df.select(distance(F.col("a"), F.col("b"), metric).alias("d")).head()["d"]


def test_cosine_matches_numpy(spark, sample):
    q = sample[0]
    for vid in (1, 2, 3):
        got = _spark_dist(spark, sample[vid], q, "cosine")
        want = _np_cosine(q, sample[vid])
        assert got == pytest.approx(want, abs=1e-9)


def test_l2_matches_numpy(spark, sample):
    q = sample[0]
    for vid in (1, 2):
        got = _spark_dist(spark, sample[vid], q, "l2")
        want = float(
            np.sqrt(np.sum((sample[vid].astype(np.float64) - q.astype(np.float64)) ** 2))
        )
        assert got == pytest.approx(want, rel=1e-9)


def test_ip_matches_numpy(spark, sample):
    q = sample[0]
    got = _spark_dist(spark, sample[1], q, "ip")
    want = -float(np.dot(sample[1].astype(np.float64), q.astype(np.float64)))
    assert got == pytest.approx(want, rel=1e-9)


def test_zero_vector_cosine_no_nan(spark):
    z = [0.0] * 8
    v = [1.0] * 8
    got = _spark_dist(spark, z, v, "cosine")
    assert got == pytest.approx(1.0)  # epsilon guard: sim 0, dist 1


def test_unknown_metric_raises(spark):
    with pytest.raises(ValueError, match="unknown metric"):
        distance(F.lit(1), F.lit(1), "bogus")
