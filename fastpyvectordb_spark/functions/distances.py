"""Distance expressions over ``ARRAY<FLOAT>`` columns.

Semantics mirror the reference kernels (jcolano/fastpyvectordb,
``parallel_search.py:105-134`` / ``vectordb_optimized.py:668-683``):

- ``cosine`` distance = ``1 - dot(a,b) / ((||a||+1e-10)*(||b||+1e-10))``
  (the 1e-10 epsilon on each norm is the reference's guard against
  zero vectors and is part of the pinned semantics)
- ``l2``     distance = ``sqrt(sum((a_i-b_i)^2))``
- ``ip``     distance = ``-dot(a,b)`` (lower is better, like the others)

All math is done as a *sequential left-to-right double accumulation*
via ``F.aggregate(zip_with(...))`` so results are deterministic and
bit-reproducible against an identically-shaped SQL oracle (DuckDB
``list_sum(list_transform(list_zip(...)))``). These are pure Catalyst
expressions: they stay JVM-side inside whole-stage codegen — no Python
UDF in the hot path. The GEMM batch kernel in ``operators/knn.py`` is
the Arrow-vectorized fast path for large batch workloads.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-10

METRICS = ("cosine", "l2", "ip")


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """Euclidean norm with double accumulation."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / ((norm(a) + F.lit(EPS)) * (norm(b) + F.lit(EPS)))


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


def l2_distance(a: Column, b: Column) -> Column:
    sq = F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)


def ip_distance(a: Column, b: Column) -> Column:
    return -dot(a, b)


def distance(a: Column, b: Column, metric: str = "cosine") -> Column:
    if metric == "cosine":
        return cosine_distance(a, b)
    if metric == "l2":
        return l2_distance(a, b)
    if metric == "ip":
        return ip_distance(a, b)
    raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")


# ---------------------------------------------------------------------------
# DuckDB oracle fragments: the *same* formulas as ANSI-ish SQL over list
# columns, used by __spark_entry__.oracle_sql() so the driver can verify
# hash-for-hash. Kept next to the Spark expressions so they evolve together.
# ---------------------------------------------------------------------------

def duckdb_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def duckdb_norm(a: str) -> str:
    return f"sqrt({duckdb_dot(a, a)})"


def duckdb_distance(a: str, b: str, metric: str = "cosine") -> str:
    if metric == "cosine":
        return (
            f"1.0 - {duckdb_dot(a, b)} / "
            f"(({duckdb_norm(a)} + 1e-10) * ({duckdb_norm(b)} + 1e-10))"
        )
    if metric == "l2":
        return (
            f"sqrt(list_sum(list_transform(list_zip({a}, {b}), "
            f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
            f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))))"
        )
    if metric == "ip":
        return f"-{duckdb_dot(a, b)}"
    raise ValueError(f"unknown metric {metric!r}")
