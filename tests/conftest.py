from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from fastpyvectordb_spark.session import get_spark

    s = get_spark("pytest", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def embeddings(spark):
    from fastpyvectordb_spark.tables import load_table

    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="session")
def documents(spark):
    from fastpyvectordb_spark.tables import load_table

    return load_table(spark, SF_DIR, "documents").cache()
