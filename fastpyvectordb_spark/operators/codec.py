"""Lossy storage codecs + memory accounting
(reference ``binary_persistence.py:333-385`` S7, ``quantization.py``
memory_usage Q10).

fp16/int8 compression re-expressed as typed columns parquet already
knows how to encode efficiently:

- int8: per-vector symmetric scale ``max|v|/127`` → ``ARRAY<TINYINT>``
  + a float scale column (the reference stores per-array scale the
  same way)
- fp16: Spark has no half type; the reference's fp16 keeps ~3 decimal
  digits — represented as ``ARRAY<SMALLINT>`` of ``round(v * 2^10)``
  (fixed-point with the same relative error budget for unit-norm
  embeddings), decodable by a pure expression

Both round-trip within documented tolerance (pinned in tests) and
compose with every distance operator after decode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def int8_encode(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Adds ``codes ARRAY<TINYINT>`` + ``scale DOUBLE`` (per row)."""
    absmax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.when(absmax == 0, F.lit(1.0)).otherwise(absmax / 127.0)
    return df.withColumn("scale", scale).withColumn(
        "codes",
        F.zip_with(
            F.col(vec_col),
            F.array_repeat(F.col("scale"), F.size(vec_col)),
            lambda v, s: F.round(v.cast("double") / s, 0).cast("tinyint"),
        ),
    )


def int8_decode(codes: Column, scale: Column) -> Column:
    return F.transform(codes, lambda c: (c.cast("double") * scale).cast("float"))


_FP16_SCALE = 1 << 10


def fp16_encode(vec: Column) -> Column:
    """ARRAY<SMALLINT> fixed-point (≈fp16 precision for |v| ≤ 16)."""
    return F.transform(
        vec, lambda v: F.round(v.cast("double") * _FP16_SCALE, 0).cast("smallint")
    )


def fp16_decode(codes: Column) -> Column:
    return F.transform(
        codes, lambda c: (c.cast("double") / _FP16_SCALE).cast("float")
    )


def memory_usage(n_vectors: int, dims: int, scheme: str = "f32") -> dict:
    """Q10: storage accounting per scheme, reference-style ratios
    (quantization.py:183-194, 396-407, 599-615)."""
    f32 = n_vectors * dims * 4
    sizes = {
        "f32": f32,
        "fp16": n_vectors * dims * 2,
        "int8": n_vectors * (dims + 8),      # codes + per-row scale
        "sq8": n_vectors * dims + dims * 12,  # codes + min/max/scale tables
        "bq": n_vectors * ((dims + 7) // 8) + dims * 8,
        "pq8": n_vectors * 8 + 8 * 256 * (dims // 8) * 4,
    }
    if scheme not in sizes:
        raise ValueError(f"unknown scheme {scheme!r}; one of {sorted(sizes)}")
    b = sizes[scheme]
    return {
        "original_bytes": f32,
        "compressed_bytes": b,
        "compression_ratio": f32 / b,
        "savings_percent": (1 - b / f32) * 100,
    }
