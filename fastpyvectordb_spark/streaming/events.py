"""Event-stream operators (reference ``realtime.py``).

The reference's realtime layer is an in-process event bus: typed CDC
events, per-subscriber predicate matching, a last-100 ring buffer, and
WebSocket broadcast. Spark-first:

- the event stream is a streaming DataFrame (file/kafka source; the
  driver's ``events`` table stands in as the source for tests) —
  R1 ``realtime.py:58-89``
- subscription matching (R2 ``:91-118``) is a ``filter()`` — the same
  function works on batch and streaming DataFrames
- windowed aggregation with watermarks (R6 — absent in the reference,
  the Spark-idiomatic upgrade) bounds state for late data
- replay (R3 ``:133-160``) is a tail query over the persisted log
- broadcast (S10) is ``writeStream.foreachBatch`` → push

Every transformation here is expressed so the *same* logical plan runs
in batch mode (for the DuckDB oracle) and streaming mode (microbatch)
— that equivalence is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_ntz(df: DataFrame, ts_col: str) -> bool:
    from pyspark.sql.types import TimestampNTZType

    return isinstance(df.schema[ts_col].dataType, TimestampNTZType)


def subscription_filter(
    events: DataFrame,
    event_types: list[str] | None = None,
    user_ids: list[int] | None = None,
    props_predicate: Column | None = None,
) -> DataFrame:
    """R2: subscription predicate — event-type set, id set, and a
    metadata predicate over the JSON ``props`` column. ``None`` means
    wildcard (the reference's ``'*'`` collection)."""
    out = events
    if event_types is not None:
        out = out.filter(F.col("event_type").isin(event_types))
    if user_ids is not None:
        out = out.filter(F.col("user_id").isin(user_ids))
    if props_predicate is not None:
        out = out.filter(props_predicate)
    return out


def props_int(events_col: str | Column, key: str) -> Column:
    """Extract an integer field from the JSON ``props`` string with a
    regex (portable to the DuckDB oracle verbatim)."""
    c = F.col(events_col) if isinstance(events_col, str) else events_col
    return F.regexp_extract(c, f'"{key}":\\s*(\\d+)', 1).cast("int")


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """R6: tumbling-window counts + value stats per event type.

    With ``watermark`` set this is a valid streaming aggregation whose
    state is bounded; without it the same plan runs in batch. Value
    sums are exact integer cents (order-independent across engines).
    """
    src = events
    ntz = _is_ntz(events, ts_col)
    if watermark is not None:
        # withWatermark requires TIMESTAMP (LTZ); the tables carry
        # TIMESTAMP_NTZ. Session tz is pinned UTC, so the cast is a
        # relabel — window bounds are cast back below
        if ntz:
            src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        src = src.withWatermark(ts_col, watermark)
    start = F.col("w.start")
    if watermark is not None and ntz:
        start = start.cast("timestamp_ntz")
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            start.alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )


def replay_last_n(
    events: DataFrame, n: int = 10, per: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """R3: ring-buffer replay — the latest n events per group from the
    persisted log (batch query over the sink, exactly how a late
    subscriber re-reads Delta CDF / the event table)."""
    from pyspark.sql import Window

    w = Window.partitionBy(per).orderBy(F.desc(ts_col), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Session assignment by inactivity gap: a new session starts when
    the gap to the previous event of the same user exceeds the
    threshold. Returns per-session (user_id, session_id, n_events,
    session_start, session_end).

    Batch shape = lag + running sum window; the streaming twin is
    ``session_window(ts, gap)`` (state-store backed).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_sid = marked.withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of :func:`sessionize` as a custom stateful
    operator (``applyInPandasWithState``).

    Per-user state carries the open session ``(session_id, n_events,
    start_us, last_us)``; a session closes — and is emitted — when the
    gap to the next event exceeds the threshold, in-batch or across
    micro-batches. The final open session per user stays in state (a
    production pipeline would flush it with an event-time timeout; the
    batch face is the oracle-checkable equivalent).

    State size is O(users) regardless of stream length; per batch the
    work is vectorized pandas (sort + diff + cumsum), never per-row
    Python over the whole stream. Session numbering matches the batch
    face: 1-based per user in time order.
    """
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = StructType(
        [
            StructField(user_col, LongType()),
            StructField("session_id", LongType()),
            StructField("n_events", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("sid", LongType()),
            StructField("n", LongType()),
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
        ]
    )

    def fn(key, pdfs, state):
        import pandas as pd

        (user,) = key
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values(
            [ts_col, "event_id"]
        )
        us = (
            pdf[ts_col].astype("datetime64[us]").astype("int64").reset_index(
                drop=True
            )
        )
        new = us.diff().gt(gap_us)
        new.iloc[0] = True
        grp = new.cumsum()
        agg = us.groupby(grp).agg(["size", "min", "max"])
        sessions = [
            (int(r["size"]), int(r["min"]), int(r["max"]))
            for _, r in agg.iterrows()
        ]
        closed: list[list[int]] = []
        cur = list(state.get) if state.exists else None
        if cur is not None and sessions and us.iloc[0] - cur[3] <= gap_us:
            n, _s, e = sessions.pop(0)
            cur[1] += n
            cur[3] = e
        for n, s, e in sessions:
            if cur is not None:
                closed.append(cur)
                nxt = cur[0] + 1
            else:
                nxt = 1
            cur = [nxt, n, s, e]
        state.update(tuple(cur))
        if closed:
            yield pd.DataFrame(
                {
                    user_col: user,
                    "session_id": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[2] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[3] for c in closed], unit="us"
                    ),
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )


def stream_from_parquet_dir(
    spark, path: str, schema=None, max_files_per_trigger: int = 4
) -> DataFrame:
    """A real readStream over a parquet directory (file source) — used
    by tests to run the above operators in genuine streaming mode."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "error",
    right_type: str = "click",
    interval: str = "5 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream interval join (beyond the reference — its event bus
    has no join at all): for every ``left_type`` event, the
    ``right_type`` events of the SAME user within ``(l_ts, l_ts +
    interval]``. The same plan runs batch (oracle-checkable — the
    join_range_click_burst suite query is this shape) and streaming:
    with ``watermark`` set on both sides, Spark bounds the join state
    buffer by watermark + interval and ages matched rows out — the
    100 TB-stream answer to "correlate events across streams".

    Output: ``(user_id, l_event_id, l_ts, r_event_id, r_ts)``.
    """
    l = left.filter(F.col("event_type") == left_type)
    r = right.filter(F.col("event_type") == right_type)
    l_ntz = _is_ntz(l, ts_col)
    r_ntz = _is_ntz(r, ts_col)
    if watermark is not None:
        # NTZ → LTZ relabel for watermark support (UTC session tz);
        # see windowed_counts — cast BACK in the final select so the
        # output schema is NTZ whenever the input was, watermark or not
        if l_ntz:
            l = l.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        if r_ntz:
            r = r.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        l = l.withWatermark(ts_col, watermark)
        r = r.withWatermark(ts_col, watermark)
    l = l.select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_event_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = r.select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event_id"),
        F.col(ts_col).alias("r_ts"),
    )
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {interval}"))
    )
    out = l.join(r, cond).select(
        F.col("l_user").alias("user_id"),
        "l_event_id", "l_ts", "r_event_id", "r_ts",
    )
    if watermark is not None and (l_ntz or r_ntz):
        if l_ntz:
            out = out.withColumn("l_ts", F.col("l_ts").cast("timestamp_ntz"))
        if r_ntz:
            out = out.withColumn("r_ts", F.col("r_ts").cast("timestamp_ntz"))
        out = out.select("user_id", "l_event_id", "l_ts", "r_event_id", "r_ts")
    return out


def push_to_subscribers(
    events: DataFrame,
    subscribers: list[dict],
    post_json,
    checkpoint: str | None = None,
    trigger_once: bool = True,
    max_collect_rows: int = 10_000,
):
    """S10 broadcast sink (``realtime.py:184-215``): for each
    micro-batch, evaluate every subscriber's predicate and POST the
    matching rows as a JSON payload to the subscriber's URL.

    ``subscribers``: ``[{"url": ..., "event_types": [...] | None,
    "user_ids": [...] | None}, ...]`` — the reference's Subscription
    model (collection wildcard == both filters None).
    ``post_json(url, payload)`` does the transport (injected so tests
    can capture; production: urllib/requests). Matching happens
    DRIVER-SIDE on the already-collected micro-batch — batches are
    small by construction (micro-batch cadence), and per-subscriber
    re-filtering of a collected batch avoids one Spark job per
    subscriber per batch. Driver memory is BOUNDED: at most
    ``max_collect_rows`` are collected at once — an oversized batch
    (replay/catch-up) falls back to per-subscriber FILTERED plans
    (predicates pushed to the scan) streamed to the driver in
    ``max_collect_rows``-sized chunks, each chunk POSTed separately.

    Returns the started ``StreamingQuery`` (streaming input) or runs a
    single pass (batch input, for tests/replay).
    """

    def _post_filtered(batch_df: DataFrame, batch_id: int) -> None:
        # oversized-batch path: one filtered Spark plan per subscriber,
        # chunked driver iteration — never more than max_collect_rows
        # rows held at once
        for sub in subscribers:
            ets = sub.get("event_types")
            uids = sub.get("user_ids")
            matched_df = batch_df
            if ets is not None:
                matched_df = matched_df.filter(F.col("event_type").isin(list(ets)))
            if uids is not None:
                matched_df = matched_df.filter(F.col("user_id").isin(list(uids)))
            chunk: list[dict] = []
            part = 0
            for row in matched_df.toLocalIterator():
                chunk.append(row.asDict())
                if len(chunk) >= max_collect_rows:
                    post_json(
                        sub["url"],
                        {"batch_id": batch_id, "part": part, "events": chunk},
                    )
                    part += 1
                    chunk = []
            if chunk:
                post_json(
                    sub["url"],
                    {"batch_id": batch_id, "part": part, "events": chunk},
                )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # limit+1 probe: one job tells us both "the rows" and "was it
        # oversized" without a separate count()
        probe = batch_df.limit(max_collect_rows + 1).collect()
        if not probe:
            return
        if len(probe) > max_collect_rows:
            _post_filtered(batch_df, batch_id)
            return
        rows = [r.asDict() for r in probe]
        for sub in subscribers:
            ets = sub.get("event_types")
            uids = sub.get("user_ids")
            matched = [
                r
                for r in rows
                if (ets is None or r.get("event_type") in ets)
                and (uids is None or r.get("user_id") in uids)
            ]
            if matched:
                post_json(
                    sub["url"],
                    {"batch_id": batch_id, "events": matched},
                )

    if not events.isStreaming:
        handle(events, 0)
        return None
    writer = events.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once → effectively-once: drop redelivered events by key
    within the watermark horizon.

    Batch/stream dual plan: on a streaming DataFrame this is
    ``withWatermark + dropDuplicatesWithinWatermark`` — the state store
    only retains keys younger than the watermark, so state is bounded
    no matter how long the stream runs (the unbounded-state trap of
    plain ``dropDuplicates`` on a stream).  On a batch DataFrame the
    same call degenerates to keyed first-wins dedup, so the batch
    result is the streaming result with an infinite horizon — the
    equivalence the test pins.

    Ingest-scale shape: one hash shuffle on the dedup key; redeliveries
    collapse map-side.  NTZ timestamps are cast for the watermark and
    restored on the way out, matching ``windowed_counts``."""
    keys = keys or ["event_id"]
    ntz = _is_ntz(events, ts_col)
    out = events
    if ntz:
        out = out.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if out.isStreaming:
        out = out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    else:
        out = out.dropDuplicates(keys)
    if ntz:
        out = out.withColumn(ts_col, F.col(ts_col).cast("timestamp_ntz"))
    return out
