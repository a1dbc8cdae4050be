"""R6: watermark semantics — late rows beyond the watermark are
dropped from streaming windowed aggregation state.

Two checkpointed runs of the same query: run 1 processes current
events and persists the advanced watermark; run 2 processes a file of
events hours older than the watermark. In append mode, their windows
were already finalized, so the late rows must not produce output."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.streaming.events import windowed_counts

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

T0 = dt.datetime(2024, 6, 1, 10, 0, 0)


def _rows(start_id, base, n):
    return [
        (start_id + i, base + dt.timedelta(minutes=i), 1, "click", 1.0, "{}")
        for i in range(n)
    ]


def _run(spark, src, ckpt, out):
    # parquet sink: the only append-mode sink that supports checkpoint
    # recovery across separate runs (memory sink does not)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        windowed_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return spark.read.parquet(out).collect()
    except Exception:
        return []


@pytest.mark.slow
def test_late_rows_beyond_watermark_dropped(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    # run 1: events at T0+6h advance the watermark to ~T0+5h
    fresh = _rows(0, T0 + dt.timedelta(hours=6), 30)
    spark.createDataFrame(fresh, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    out1 = _run(spark, src, ckpt, out)

    # run 2: 20 events at T0 — five hours behind the watermark
    late = _rows(1000, T0, 20)
    spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    out2 = _run(spark, src, ckpt, out)

    emitted_windows = {r["window_start"] for r in out2}
    # no output window may correspond to the late batch's hour
    assert T0.replace(minute=0) not in emitted_windows
    # and the late rows must not appear as counts anywhere
    total_counted = sum(r["n_events"] for r in out2)
    assert total_counted <= len(fresh)


@pytest.mark.slow
def test_stream_dedup_within_watermark_drops_redeliveries(spark, tmp_path):
    """dedup_within_watermark: duplicate event_ids delivered across
    micro-batches inside the horizon must be emitted exactly once, and
    the batch plan over the same files agrees with the streaming run."""
    from fastpyvectordb_spark.streaming.events import (
        dedup_within_watermark, stream_from_parquet_dir,
    )

    src = str(tmp_path / "dsrc")
    base = _rows(0, T0 + dt.timedelta(hours=6), 12)
    spark.createDataFrame(base, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    # redeliver the same 12 events (same event_ids) as a second file
    spark.createDataFrame(base, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "dout")
    stream = stream_from_parquet_dir(spark, src, max_files_per_trigger=1)
    q = (
        dedup_within_watermark(stream, keys=["event_id"], watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert sorted(r["event_id"] for r in got) == sorted(
        r[0] for r in base
    )  # exactly once each

    batch = dedup_within_watermark(spark.read.parquet(src), keys=["event_id"])
    assert sorted(r["event_id"] for r in batch.collect()) == sorted(
        r["event_id"] for r in got
    )
