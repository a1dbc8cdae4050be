"""Z-order (Morton) clustering expressions for data-skipping layout.

Delta/Iceberg-style ``OPTIMIZE ... ZORDER BY (a, b)``: rows are sorted
by the bit-interleave of their rank-normalized column values, so each
output file covers a compact hyper-rectangle of the key space and
per-file min/max statistics prune multi-dimensional range predicates
— the standard lakehouse answer to "I filter on two columns but can
only partition by one".

Everything here is pure Catalyst bit arithmetic (shiftleft / AND / OR
on longs) — whole-stage-codegen-able, no UDF, no collect beyond one
min/max agg per z-column. Normalization is linear min→max into 16-bit
buckets (Delta OSS uses range-partition ids; linear is equivalent for
skipping purposes on roughly uniform keys and costs one tiny agg
instead of a sample job — the trade-off is documented, not hidden).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-column resolution: 65,536 buckets


def _bucket16(col: Column, lo: float, hi: float) -> Column:
    """Linear min→max bucket into [0, 2^16): the per-column rank proxy."""
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    b = F.floor(scaled * ((1 << BITS) - 1)).cast("long")
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(b, F.lit((1 << BITS) - 1).cast("long")),
    )


def morton_expr(buckets: list[Column]) -> Column:
    """Bit-interleave k bucket values into one long Morton key.

    Bit b of column i lands at position ``b*k + i`` — shift/AND
    primitives that Catalyst folds into one codegen stage. Per-column
    width shrinks to ``62 // k`` bits when 16·k would reach the SIGN
    bit (k=4: 16·4−1 = 63 → negative keys for high 4th-column buckets,
    which would range-sort the top of the keyspace BEFORE the bottom
    and wreck the clustering). The top bits of each bucket are kept —
    resolution drops, ordering semantics don't.
    """
    k = len(buckets)
    if not 1 <= k <= 4:
        raise ValueError(f"zorder supports 1-4 columns, got {k}")
    bits = min(BITS, 62 // k)
    out = F.lit(0).cast("long")
    for i, b in enumerate(buckets):
        bb = F.shiftright(b, BITS - bits) if bits < BITS else b
        for bit in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bb, bit).bitwiseAND(F.lit(1).cast("long")),
                    bit * k + i,
                )
            )
    return out


_ORDERABLE = ("int", "bigint", "smallint", "tinyint", "float", "double",
              "date", "timestamp", "timestamp_ntz", "decimal")


def zorder_key(df: DataFrame, cols: list[str]) -> Column:
    """Build the Morton sort key for ``cols``: ONE min/max aggregate
    over the frame (a tiny all-to-one job), then pure expressions."""
    for c in cols:
        dt = dict(df.dtypes)[c]
        # exact base-type match — a bare startswith("int") would also
        # accept interval types
        base = dt.split("(")[0]
        if base not in _ORDERABLE:
            raise ValueError(
                f"zorder column {c!r} has non-orderable type {dt}; "
                "cast it to a numeric/date type first"
            )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).head()
    buckets = [
        _bucket16(F.col(c), stats[f"_lo_{c}"] or 0.0, stats[f"_hi_{c}"] or 0.0)
        for c in cols
    ]
    return morton_expr(buckets)


def zorder(df: DataFrame, cols: list[str], num_partitions: int) -> DataFrame:
    """Cluster ``df`` into ``num_partitions`` Z-ordered write units:
    range-partition on the Morton key (each output file = one compact
    Z-range) and sort within, so parquet row-group min/max stats stay
    tight on every z-column."""
    key = zorder_key(df, cols)
    return (
        df.withColumn("_zorder", key)
        .repartitionByRange(num_partitions, F.col("_zorder"))
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )
