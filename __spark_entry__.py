"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship filtered exact-kNN on sf0.001.
``queries()`` / ``oracle_sql()`` — the full operator suite, registered
module-by-module under ``fastpyvectordb_spark/suite/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fastpyvectordb_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: filtered exact cosine kNN over sf0.001."""
    return suite.queries()["knn_filtered"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
