"""Structured Streaming tests: the streaming face of each event
operator must produce the same rows as its batch face (which is what
the DuckDB oracle checks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.streaming.events import (
    stream_from_parquet_dir,
    subscription_filter,
    windowed_counts,
)
from fastpyvectordb_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_DIR, "events").cache()


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory, events_batch):
    # re-write as a multi-file parquet dir so the file stream has
    # several micro-batches to chew through
    path = str(tmp_path_factory.mktemp("events_stream"))
    events_batch.repartition(8).write.mode("overwrite").parquet(path)
    return path


def _run_stream_to_memory(spark, sdf, name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_windowed_counts_equals_batch(spark, events_dir, events_batch):
    stream = stream_from_parquet_dir(spark, events_dir)
    got = _run_stream_to_memory(
        spark,
        windowed_counts(stream, window="1 hour", watermark="2 hours"),
        "win_counts",
        "complete",
    ).collect()
    want = windowed_counts(events_batch, window="1 hour").collect()
    key = lambda r: (r["window_start"], r["event_type"])
    got_map = {key(r): (r["n_events"], r["sum_value_cents"]) for r in got}
    want_map = {key(r): (r["n_events"], r["sum_value_cents"]) for r in want}
    assert got_map == want_map
    assert len(got_map) > 0


def test_streaming_subscription_filter_equals_batch(spark, events_dir, events_batch):
    stream = stream_from_parquet_dir(spark, events_dir)
    sub = subscription_filter(stream, event_types=["error"])
    got = _run_stream_to_memory(spark, sub, "sub_filter", "append").collect()
    want = subscription_filter(events_batch, event_types=["error"]).collect()
    assert {r["event_id"] for r in got} == {r["event_id"] for r in want}
    assert all(r["event_type"] == "error" for r in got)


def test_streaming_wildcard_subscription(spark, events_dir, events_batch):
    stream = stream_from_parquet_dir(spark, events_dir)
    got = _run_stream_to_memory(
        spark, subscription_filter(stream), "sub_all", "append"
    )
    assert got.count() == events_batch.count()


def test_stateful_sessionize_matches_batch(spark, tmp_path, events_batch):
    """applyInPandasWithState sessionization must equal the batch face
    for every closed session; the open tail session per user stays in
    state. Files arrive time-ordered across several micro-batches so
    cross-batch state merging is genuinely exercised."""
    from fastpyvectordb_spark.streaming.events import (
        sessionize,
        sessionize_stateful,
    )

    # six time-ordered slices, written sequentially (ordered mtimes)
    path = str(tmp_path / "ordered_events")
    ev = events_batch.orderBy("ts", "event_id")
    rows = ev.count()
    per = rows // 6 + 1
    pdf = ev.toPandas()
    # write micro-second timestamps: ns-precision parquet would surface
    # as long under the session's nanosAsLong setting
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    import os

    for i in range(6):
        sl = pdf.iloc[i * per : (i + 1) * per]
        if len(sl):
            os.makedirs(path, exist_ok=True)
            sl.to_parquet(f"{path}/part-{i:03d}.parquet", index=False)

    stream = stream_from_parquet_dir(spark, path, max_files_per_trigger=2)
    got = _run_stream_to_memory(
        spark,
        sessionize_stateful(stream, gap_minutes=30),
        "sessions_stateful",
        "append",
    ).collect()
    got_map = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["session_start"],
            r["session_end"],
        )
        for r in got
    }

    batch = sessionize(events_batch, gap_minutes=30).collect()
    # drop each user's last (still-open) session
    last_sid = {}
    for r in batch:
        last_sid[r["user_id"]] = max(
            last_sid.get(r["user_id"], 0), r["session_id"]
        )
    want_map = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["session_start"],
            r["session_end"],
        )
        for r in batch
        if r["session_id"] != last_sid[r["user_id"]]
    }
    assert got_map == want_map
    assert len(got_map) > 50


@pytest.mark.slow
def test_streaming_interval_join_equals_batch(spark, events_dir, events_batch):
    """Stream-stream interval join (watermarked both sides) must emit
    exactly the pairs the batch plan produces."""
    from fastpyvectordb_spark.streaming.events import interval_join

    sl = stream_from_parquet_dir(spark, events_dir)
    sr = stream_from_parquet_dir(spark, events_dir)
    got = _run_stream_to_memory(
        spark,
        interval_join(sl, sr, interval="5 minutes", watermark="2 hours"),
        "ijoin",
        "append",
    ).collect()
    want = interval_join(events_batch, events_batch, interval="5 minutes").collect()
    key = lambda r: (r["l_event_id"], r["r_event_id"])
    assert {key(r) for r in got} == {key(r) for r in want}
    assert len(want) > 0


def test_push_to_subscribers_streaming(spark, tmp_path):
    """S10: foreachBatch broadcast — each subscriber receives exactly
    the rows its predicate matches, delivered per micro-batch, in both
    streaming and batch (replay) mode."""
    import json

    from fastpyvectordb_spark.streaming.events import (
        push_to_subscribers,
        stream_from_parquet_dir,
    )
    from fastpyvectordb_spark.tables import load_table

    src = load_table(spark, SF_DIR, "events").limit(200)
    src_dir = str(tmp_path / "evsrc")
    src.write.mode("overwrite").parquet(src_dir)

    received: list[tuple[str, dict]] = []
    subs = [
        {"url": "http://sub-err", "event_types": ["error"], "user_ids": None},
        {"url": "http://sub-u7", "event_types": None, "user_ids": [7]},
        {"url": "http://sub-all", "event_types": None, "user_ids": None},
    ]

    stream = stream_from_parquet_dir(spark, src_dir, schema=src.schema)
    q = push_to_subscribers(
        stream, subs, lambda url, payload: received.append((url, payload)),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)

    want = {r["event_id"]: r.asDict() for r in src.collect()}
    got_err = [e for u, p in received if u == "http://sub-err" for e in p["events"]]
    got_u7 = [e for u, p in received if u == "http://sub-u7" for e in p["events"]]
    got_all = [e for u, p in received if u == "http://sub-all" for e in p["events"]]
    assert {e["event_id"] for e in got_all} == set(want)
    assert {e["event_id"] for e in got_err} == {
        k for k, v in want.items() if v["event_type"] == "error"
    }
    assert {e["event_id"] for e in got_u7} == {
        k for k, v in want.items() if v["user_id"] == 7
    }
    assert all(e["event_type"] == "error" for e in got_err)

    # batch mode: same function, single pass (replay path)
    received.clear()
    push_to_subscribers(
        src, subs, lambda url, payload: received.append((url, payload))
    )
    got_all2 = [e for u, p in received if u == "http://sub-all" for e in p["events"]]
    assert {e["event_id"] for e in got_all2} == set(want)


def test_push_to_subscribers_oversized_batch_bounded(spark):
    """A batch bigger than max_collect_rows must take the filtered-plan
    path: chunked payloads, each ≤ max_collect_rows, union == exact
    predicate matches (driver memory stays bounded on replay batches)."""
    from fastpyvectordb_spark.streaming.events import push_to_subscribers
    from fastpyvectordb_spark.tables import load_table

    src = load_table(spark, SF_DIR, "events").limit(500)
    received: list[tuple[str, dict]] = []
    subs = [
        {"url": "http://sub-err", "event_types": ["error"], "user_ids": None},
        {"url": "http://sub-all", "event_types": None, "user_ids": None},
    ]
    push_to_subscribers(
        src, subs, lambda url, p: received.append((url, p)),
        max_collect_rows=64,
    )
    want = {r["event_id"]: r.asDict() for r in src.collect()}
    for url, p in received:
        assert len(p["events"]) <= 64
        assert "part" in p  # chunked fallback, not the collect path
    got_all = [e for u, p in received if u == "http://sub-all" for e in p["events"]]
    got_err = [e for u, p in received if u == "http://sub-err" for e in p["events"]]
    assert {e["event_id"] for e in got_all} == set(want)
    assert {e["event_id"] for e in got_err} == {
        k for k, v in want.items() if v["event_type"] == "error"
    }


def test_interval_join_watermark_keeps_ntz_schema(spark):
    """interval_join with a watermark must cast l_ts/r_ts back to
    timestamp_ntz when the inputs were NTZ (ADVICE r1) — batch and
    no-watermark output schemas must agree."""
    from fastpyvectordb_spark.streaming.events import interval_join
    from fastpyvectordb_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    plain = interval_join(ev, ev, interval="5 minutes")
    marked = interval_join(ev, ev, interval="5 minutes", watermark="2 hours")
    assert dict(plain.dtypes) == dict(marked.dtypes)
    assert dict(marked.dtypes)["l_ts"] == "timestamp_ntz"
    assert dict(marked.dtypes)["r_ts"] == "timestamp_ntz"


def test_websocket_broadcast_and_late_joiner(spark):
    """S10 transport: real RFC6455 frames over a socket — handshake,
    broadcast to a live client, ring-buffer replay to a late joiner."""
    import json

    from fastpyvectordb_spark.streaming.ws import (
        WebSocketBroadcaster, client_connect, client_recv_text,
        client_send_close,
    )

    b = WebSocketBroadcaster(history=5)
    try:
        c1 = client_connect(b.host, b.port, timeout=30)
        import time as _t

        # the warm-up may broadcast seq 1 several times before c1
        # registers (each lands in the ring); readers below tolerate
        # duplicates by draining until the expected seq arrives
        deadline = _t.time() + 20
        while b.broadcast({"seq": 1}) < 1 and _t.time() < deadline:
            _t.sleep(0.02)

        def read_until(sock, want_seq, limit=20):
            for _ in range(limit):
                got = json.loads(client_recv_text(sock))
                if got.get("seq") == want_seq:
                    return got
            raise AssertionError(f"seq {want_seq} never arrived")

        assert read_until(c1, 1) == {"seq": 1}
        b.broadcast({"seq": 2})
        assert read_until(c1, 2)["seq"] == 2
        # late joiner gets the ring buffer (last-N replay): both seqs
        c2 = client_connect(b.host, b.port, timeout=30)
        read_until(c2, 1)
        read_until(c2, 2)
        # long frame (>125 bytes → 16-bit length path)
        b.broadcast({"pad": "x" * 500})
        for _ in range(20):
            got = json.loads(client_recv_text(c1))
            if "pad" in got:
                break
        assert len(got["pad"]) == 500
        client_send_close(c1)
        client_send_close(c2)
    finally:
        b.close()


def test_websocket_sink_foreachbatch(spark):
    """websocket_sink pushes a micro-batch's rows as JSON frames."""
    import json

    from fastpyvectordb_spark.streaming.ws import (
        WebSocketBroadcaster, client_connect, client_recv_text,
    )

    b = WebSocketBroadcaster()
    try:
        c = client_connect(b.host, b.port, timeout=30)
        import time as _t

        deadline = _t.time() + 20
        while not b.broadcast({"warm": True}) and _t.time() < deadline:
            _t.sleep(0.02)
        from fastpyvectordb_spark.streaming.ws import websocket_sink

        batch = spark.createDataFrame(
            [("e1", "insert", "u1"), ("e2", "delete", "u2")],
            "event_id string, event_type string, user_id string",
        )
        websocket_sink(b)(batch, batch_id=7)
        got = []
        for _ in range(30):  # skip however many warm-up frames arrived
            msg = json.loads(client_recv_text(c))
            if "event" in msg:
                got.append(msg)
            if len(got) == 2:
                break
        assert {g["event"]["event_id"] for g in got} == {"e1", "e2"}
        assert all(g["batch_id"] == 7 for g in got)
    finally:
        b.close()
