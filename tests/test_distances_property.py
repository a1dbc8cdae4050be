"""Property-based parity of the SQL distance expressions with a NumPy
evaluation of the pinned reference formulas (sequential-double
accumulation, 1e-10 norm epsilon) on random float32 vectors."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.distances import distance

# whole-file slow lane: scale soak / hypothesis property suites
pytestmark = pytest.mark.slow

DIMS = 8

_vec = st.lists(
    st.floats(
        min_value=-10,
        max_value=10,
        allow_nan=False,
        width=32,
    ),
    min_size=DIMS,
    max_size=DIMS,
)


def _np_distance(a, b, metric):
    # sequential double accumulation, like the SQL aggregate
    a = [float(x) for x in a]
    b = [float(x) for x in b]
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    if metric == "cosine":
        # per-norm epsilons, matching the reference
        # (parallel_search.py:121-123) and the SQL twin
        return 1.0 - dot / ((na + 1e-10) * (nb + 1e-10))
    if metric == "l2":
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    return -dot


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=_vec, b=_vec, metric=st.sampled_from(["cosine", "l2", "ip"]))
def test_distance_expr_matches_reference_formula(spark, a, b, metric):
    df = spark.createDataFrame(
        [(a, b)], "a array<float>, b array<float>"
    )
    got = df.select(
        distance(F.col("a"), F.col("b"), metric).alias("d")
    ).head()["d"]
    # the expression casts float32 inputs to double before accumulating,
    # matching this python evaluation over the same float32 values
    want = _np_distance(a, b, metric)
    assert got == pytest.approx(want, rel=1e-9, abs=1e-9), (a, b, metric)
