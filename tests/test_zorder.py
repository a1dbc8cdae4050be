"""Z-order clustering: Morton expression correctness, layout effect,
and the optimize(zorder_by=…) commit path."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.zorder import (
    BITS,
    morton_expr,
    zorder,
    zorder_key,
)


def _py_morton(vals: list[int]) -> int:
    out = 0
    k = len(vals)
    for i, v in enumerate(vals):
        for bit in range(BITS):
            out |= ((v >> bit) & 1) << (bit * k + i)
    return out


def test_morton_expr_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", morton_expr([F.col("a"), F.col("b")]).alias("m")
    ).collect()
    for r in got:
        assert r["m"] == _py_morton([r["a"], r["b"]]), (r["a"], r["b"])


def test_morton_rejects_bad_arity(spark):
    with pytest.raises(ValueError, match="1-4"):
        morton_expr([F.lit(0)] * 5)


def test_zorder_key_rejects_string_col(spark):
    df = spark.createDataFrame([(1, "x")], "a long, s string")
    with pytest.raises(ValueError, match="non-orderable"):
        zorder_key(df, ["s"])


def test_zorder_clusters_partitions(spark):
    # 64x64 grid; 8 z-ranged partitions must each cover a bounding box
    # far smaller than the full grid (that's the data-skipping win)
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x int, y int")
    z = zorder(df, ["x", "y"], num_partitions=8)
    boxes = (
        z.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert z.count() == 64 * 64
    areas = [(r["dx"] + 1) * (r["dy"] + 1) for r in boxes]
    assert sum(areas) / len(areas) < 64 * 64 / 2, areas


def test_optimize_zorder_by(spark, tmp_path):
    from fastpyvectordb_spark.catalog import Collection, CollectionConfig

    c = Collection(
        spark, str(tmp_path / "zc"), CollectionConfig(dimensions=2, n_buckets=4)
    )
    import random

    rng = random.Random(7)
    rows = [
        (f"id{i}", [0.0, 0.0], rng.randrange(1000), rng.randrange(1000))
        for i in range(2000)
    ]
    c.insert_batch(
        spark.createDataFrame(
            rows, "id string, embedding array<float>, x long, y long"
        )
    )
    before = {r["id"] for r in c.df().select("id").collect()}
    c.optimize(zorder_by=["x", "y"])
    after = c.df()
    assert {r["id"] for r in after.select("id").collect()} == before
    assert "_zorder" not in after.columns

    # inside each written file, rows must be Morton-sorted: check via
    # pyarrow that the morton sequence per file is non-decreasing
    import pyarrow.parquet as pq

    files = [
        os.path.join(c.path, rel)
        for rel in c._resolve(c._current_version())[0]
    ]
    assert files
    checked = 0
    for f in files:
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
        if len(xs) < 2:
            continue
        lo_x, hi_x = min(xs), max(xs)
        lo_y, hi_y = min(ys), max(ys)

        def b16(v, lo, hi):
            if hi <= lo:
                return 0
            return max(0, min((1 << BITS) - 1,
                              int((v - lo) / (hi - lo) * ((1 << BITS) - 1))))

        # global min/max over the whole table — mirror zorder_key
        gx = [r[2] for r in rows]
        gy = [r[3] for r in rows]
        ms = [
            _py_morton(
                [b16(x, min(gx), max(gx)), b16(y, min(gy), max(gy))]
            )
            for x, y in zip(xs, ys)
        ]
        assert ms == sorted(ms), f
        checked += 1
    assert checked >= 1
