"""Test-data table loaders (driver-generated TPC-H-ish star schema).

Tables live as one parquet file per table under ``$SPARK_GRAFT_SF_DIR``
(see TESTDATA.md). ``load_table`` is a plain ``spark.read.parquet`` so
Catalyst gets native predicate pushdown / column pruning on every query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in parquet, surfaced as long ns under
        # nanosAsLong; truncate to micros — exactly what DuckDB's
        # microsecond TIMESTAMP does
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integral div — double division loses microseconds at
            # ~1.7e18 ns magnitudes
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
