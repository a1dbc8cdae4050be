"""Sharded training-corpus export (the pipeline's delivery step).

A cleaned corpus ships to trainers as a partitioned, shard-size-bounded
parquet layout: directory keys for the columns loaders filter on
(split, lang, source), file sizes bounded so a dataloader can assign
shards to workers evenly. This is a thin, opinionated wrapper over the
DataFrameWriter that pins those decisions and reports a manifest.

Scale notes: ``partitionBy`` writes one directory tree level per key
column — keep the key cardinality low (split × lang, not doc_id).
``maxRecordsPerFile`` bounds shard size without an extra repartition
job; adding ``repartition(keys)`` first would coalesce each partition
dir to fewer, fuller files but costs a shuffle — opt in via
``shuffle_by_keys`` when small-file count matters more than the extra
stage (at 100 TB it usually does: a million tiny shards stalls any
dataloader).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_sharded(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int = 100_000,
    shuffle_by_keys: bool = False,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a hive-partitioned parquet tree with bounded
    shard sizes."""
    out = df
    if shuffle_by_keys:
        out = out.repartition(*[F.col(c) for c in partition_by])
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def export_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Manifest of an exported tree → one row per partition directory:
    (partition key cols…, n_rows, n_files). Reads only parquet footers
    plus the file listing — no data scan."""
    df = spark.read.parquet(path)
    keys = [
        f.name
        for f in df.schema.fields
        if f.name in _partition_cols_from_layout(spark, path)
    ]
    with_file = df.withColumn("_file", F.input_file_name())
    return (
        with_file.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("_file").alias("n_files"),
        )
        .orderBy(*keys)
    )


def _partition_cols_from_layout(spark: SparkSession, path: str) -> set[str]:
    """Partition columns inferred from the ``k=v`` segments of an
    actual data-file path. The file path comes from the scan itself
    (``input_file_name`` on one row), so this works on ANY filesystem
    Spark can read — an ``os.walk`` over the path string would return
    nothing on s3a://, hdfs:// or file: URIs and silently yield a
    key-less (single-row) manifest."""
    first = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"))
        .first()
    )
    cols: set[str] = set()
    if first is None:
        return cols
    for seg in first["f"].split("/")[:-1]:  # dirs only, not the file
        if "=" in seg:
            import urllib.parse

            cols.add(urllib.parse.unquote(seg.split("=", 1)[0]))
    return cols
