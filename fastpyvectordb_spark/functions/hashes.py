"""Portable hash helpers.

MinHash/SimHash/fingerprint operators need hash functions that produce
*identical* values in Spark and in the DuckDB oracle. Spark's
``xxhash64`` and DuckDB's ``hash`` disagree, so we standardize on
``md5`` (available and identical in both) and take a fixed-width hex
prefix. A fixed-width lowercase hex string compares lexicographically
exactly like its numeric value, so ``min()`` over these strings is a
valid MinHash without any integer conversion.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_WIDTH = 12  # 48 bits of hash — plenty for minhash banding at any corpus size


def md5_prefix(c: Column, width: int = HEX_WIDTH) -> Column:
    """First ``width`` hex chars of md5 — orderable fixed-width hash."""
    return F.substring(F.md5(c), 1, width)


def portable_hash64(c: Column) -> Column:
    """A 60-bit non-negative integer hash identical in Spark and DuckDB.

    ``conv(substr(md5(x),1,15),16,10)`` in Spark ==
    DuckDB arithmetic over the same hex prefix.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def duckdb_md5_prefix(expr: str, width: int = HEX_WIDTH) -> str:
    return f"substring(md5({expr}), 1, {width})"
