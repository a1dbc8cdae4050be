"""Driver-facing query suite.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a ``(spark, sf_dir) -> DataFrame`` callable plus (when
SQL-expressible) an equivalent DuckDB oracle SQL string. The repo-root
``__spark_entry__.py`` re-exports this registry to the driver.

Column-name discipline: the driver hash-compares values after sorting
columns by name, so every computed column is aliased identically in the
Spark plan and the oracle SQL. Floats are rounded to 6 decimals on both
sides (FIXTURES.md §6) and ties are broken by id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side-effect: each module registers its queries
    from fastpyvectordb_spark.suite import (  # noqa: F401
        vector,
        analytics,
    )
    for optional in (
        "text",
        "fusion",
        "graph",
        "quantization",
        "dedup",
        "textanalysis",
        "graphvector",
        "events",
        "ann",
        "multimodal",
        "analytics2",
        "cypherq",
        "joins",
    ):
        try:
            __import__(f"fastpyvectordb_spark.suite.{optional}")
        except ImportError:
            pass
    _LOADED = True
