"""Scale utilities: salted joins for skewed keys, bucketed co-located
joins, and partitioned-layout writers.

The reference is single-node, so none of this exists there — but at
100 TB these are the difference between a plan that finishes and one
that doesn't:

- **Salting** splits a hot key across ``n_salts`` reducer partitions:
  the big (skewed) side gets a random salt, the small side is exploded
  ×``n_salts`` so every salted key still finds its match. Results are
  identical to the plain join. AQE's skew-join split handles moderate
  skew automatically; salting is the explicit tool for pathological
  keys (a single key larger than an executor).
- **Bucketing** pre-shuffles a table by join key at write time; two
  tables bucketed the same way join with zero exchanges — the shuffle
  is paid once, then amortized over every subsequent join.
- **Partitioned layout** (``partitionBy`` on write) turns equality /
  range predicates on the partition column into directory pruning
  (``PartitionFilters`` in the scan).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key shuffle
    split ``n_salts`` ways. Row-identical to ``big.join(small, key)``
    for the supported join types: inner and left (big side preserved).
    right/full would DUPLICATE every unmatched small-side row n_salts
    times (the explode has no single canonical row to null-pad), so
    they are rejected rather than silently wrong.

    The salt on the big side is derived from a uniform hash of the full
    row via ``rand``-free ``xxhash64`` — deterministic per row content,
    so retries/speculative tasks agree. ``pmod``, not ``abs``: abs of
    Long.MIN_VALUE is still negative and such a row's salt would never
    match the exploded 0..n_salts-1, silently dropping it.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r} (right/full "
            "would duplicate unmatched small-side rows per salt)"
        )
    salt_src = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    )
    big_s = big.withColumn("_salt", salt_src.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``.
    Joining two tables bucketed identically on the join key produces a
    shuffle-free (and with sort, merge-ready) plan."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a fresh in-memory catalog can forget a managed table whose files
    # survived a previous session — clear the orphaned location
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = f"{warehouse.removeprefix('file:')}/{table.lower()}"
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, key: str,
                  how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — Catalyst elides both exchanges."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def write_partitioned(
    df: DataFrame, path: str, partition_col: str
) -> None:
    """Directory-partitioned parquet layout: predicates on
    ``partition_col`` prune at the file listing, before any IO."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
