"""Training-sequence packing: concat-and-chunk document → sequence
assignment (the GPT-style pretraining batch layout).

Given per-document token counts, documents are conceptually
concatenated in a deterministic order (per stream, ordered by id) and
chunked into fixed-length training sequences of ``seq_len`` tokens.
Each document gets its starting token offset (an exclusive prefix sum),
its starting sequence id, and whether it straddles a sequence boundary
— the numbers a data loader needs to build batches without a driver-
side pass over the corpus.

Prefix sums are the non-obvious part at scale. Two paths:

- ``stream_col`` given (the normal case — pack per source/domain/shard):
  a plain window ``SUM OVER (PARTITION BY stream ORDER BY id)``. One
  shuffle on the stream key; parallelism = #streams (fine when streams
  are numerous; a single giant stream should use the global path).
- no ``stream_col``: a *global* ordered cumsum. A global window
  (``PARTITION BY nothing``) would serialize the whole corpus through
  one task — the classic single-partition window trap. Instead
  :func:`global_prefix_sum` does the textbook two-pass distributed
  scan: range-partition by the order key, compute per-partition totals
  (a tiny #partitions-row job), turn them into exclusive per-partition
  offsets on the driver, then one ``mapInPandas`` pass adds the running
  local cumsum to the broadcast offset. Both passes are over the same
  persisted shuffle output, so the range bounds are computed once.

No reference twin: the reference (jcolano/fastpyvectordb) has no
training-data layout operators; this is a north-star LLM-pipeline add
(BASELINE.json).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order,
    without a single-partition window.

    Two passes over one range-shuffled, persisted intermediate:
    pass 1 aggregates per-partition totals (#partitions rows to the
    driver); pass 2 adds each partition's broadcast offset to its
    local running sum. O(rows/partitions) memory per task.
    """
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        # prefix-sum dtype follows the value column: integral → long,
        # fractional → double (a long schema would make Arrow reject
        # float cumsums)
        vt = dict(df.dtypes)[value_col]
        sum_type = (
            "double" if vt in ("float", "double") or vt.startswith("decimal")
            else "long"
        )
        # decimals arrive from Spark as decimal.Decimal objects (both
        # in the collected totals and in the Arrow batches) — normalize
        # everything to the output dtype up front, or the cumsum runs
        # on object arrays and .item()/Arrow conversion break
        num = float if sum_type == "double" else int
        totals = {
            r["_pid"]: num(r["t"] or 0)
            for r in ranged.groupBy("_pid")
            .agg(F.sum(value_col).alias("t"))
            .collect()
        }
        offsets, acc = {}, num(0)
        for pid in sorted(totals):
            offsets[pid] = acc
            acc += totals[pid]
        b_offsets = spark.sparkContext.broadcast(offsets)

        schema = ranged.drop("_pid").schema.add(out_col, sum_type)
        cols = [f.name for f in schema.fields]
        np_dtype = "float64" if sum_type == "double" else "int64"

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            run = None
            for pdf in batches:  # batches arrive in partition order
                if run is None:
                    run = b_offsets.value.get(int(pdf["_pid"].iloc[0]), 0)
                vals = pdf[value_col].fillna(0).to_numpy(dtype=np_dtype)
                out = pdf.drop(columns=["_pid"]).copy()
                out[out_col] = vals.cumsum() - vals + run
                run += vals.sum().item()
                yield out[cols]

        return ranged.mapInPandas(scan, schema=schema)
    finally:
        # persisted data is still referenced by the returned plan;
        # Spark unpersists lazily — eager blocking unpersist here would
        # recompute the shuffle on first use.
        pass


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    stream_col: str | None = None,
) -> DataFrame:
    """Assign every document its packed position: ``start_tok``
    (exclusive cumsum of tokens in id order within the stream),
    ``seq_id`` (the training sequence its first token lands in) and
    ``straddles`` (true when the document crosses a sequence boundary
    — its tokens span more than one ``seq_len`` chunk)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if stream_col is not None:
        w = (
            Window.partitionBy(stream_col)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = docs.withColumn(
            "start_tok", F.sum(tokens_col).over(w) - F.col(tokens_col)
        )
    else:
        cum = global_prefix_sum(
            docs, order_col=id_col, value_col=tokens_col, out_col="start_tok"
        )
    t = F.col(tokens_col)
    start_bin = F.floor(F.col("start_tok") / seq_len)
    end_bin = F.floor((F.col("start_tok") + F.greatest(t, F.lit(1)) - 1) / seq_len)
    return cum.withColumn("seq_id", start_bin.cast("long")).withColumn(
        "straddles", (t > 0) & (end_bin > start_bin)
    )


def packing_stats(
    packed: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    stream_col: str = "source",
) -> DataFrame:
    """Per-stream packing summary: docs, tokens, sequences produced
    (``ceil(tokens/seq_len)``), boundary-straddling docs, and the fill
    ratio of the final (partial) sequence — the mixture/layout table a
    training job reads before building batches."""
    total = F.sum(tokens_col)
    n_seqs = F.floor((total + seq_len - 1) / seq_len).cast("long")
    # fill of the final (partial) sequence: tokens left after the full
    # sequences, over seq_len. NULL for an empty stream (no sequences).
    last_fill = F.when(
        n_seqs > 0,
        (total.cast("double") - (n_seqs - 1).cast("double") * seq_len)
        / F.lit(float(seq_len)),
    )
    return packed.groupBy(stream_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        total.cast("long").alias("n_tokens"),
        n_seqs.alias("n_seqs"),
        F.sum(F.col("straddles").cast("long")).alias("n_straddlers"),
        last_fill.alias("last_fill"),
    )
