"""RFC 6455 WebSocket bus: handshake, broadcast, ring replay, filters.

Pins the reference ConnectionManager semantics (realtime.py:133-215)
over the real transport: live push to matching sockets, last-N history
replay for late joiners, in-band subscription narrowing, ping→pong,
and the bounded foreachBatch sink fed by a real Spark DataFrame.
"""

from __future__ import annotations

import time

import pytest

from fastpyvectordb_spark.streaming.ws import (
    WebSocketClient,
    WebSocketEventServer,
    websocket_sink,
)


@pytest.fixture()
def server():
    srv = WebSocketEventServer(history_size=5).start()
    yield srv
    srv.stop()


def _drain_n(client, n, timeout=5.0):
    out = []
    deadline = time.time() + timeout
    client.sock.settimeout(0.5)
    while len(out) < n and time.time() < deadline:
        try:
            out.append(client.recv_json())
        except (TimeoutError, OSError):
            continue
    return out


def test_live_broadcast_and_collection_filter(server):
    a = WebSocketClient("127.0.0.1", server.port, collection="orders")
    b = WebSocketClient("127.0.0.1", server.port, collection="*")
    time.sleep(0.2)  # let _serve_client register both
    server.broadcast({"collection": "orders", "event_type": "insert", "id": 1})
    server.broadcast({"collection": "other", "event_type": "insert", "id": 2})
    got_a = _drain_n(a, 1)
    got_b = _drain_n(b, 2)
    assert [e["id"] for e in got_a] == [1]  # orders-only socket
    assert sorted(e["id"] for e in got_b) == [1, 2]  # wildcard socket
    a.close(); b.close()


def test_ring_buffer_replay_late_joiner(server):
    # 7 events into a size-5 ring: late joiner sees exactly the last 5
    for i in range(7):
        server.broadcast({"collection": "c", "event_type": "e", "id": i})
    late = WebSocketClient("127.0.0.1", server.port, collection="c")
    got = _drain_n(late, 5)
    assert [e["id"] for e in got] == [2, 3, 4, 5, 6]
    late.close()


def test_subscription_update_narrows(server):
    c = WebSocketClient("127.0.0.1", server.port, collection="*")
    time.sleep(0.2)
    c.send_json({"event_types": ["delete"], "user_ids": None})
    time.sleep(0.2)  # server applies the update
    server.broadcast({"collection": "c", "event_type": "insert", "id": 1})
    server.broadcast({"collection": "c", "event_type": "delete", "id": 2})
    got = _drain_n(c, 1)
    assert [e["id"] for e in got] == [2]
    c.close()


def test_ping_pong(server):
    c = WebSocketClient("127.0.0.1", server.port)
    c.sock.sendall(bytes([0x89, 0x84]) + b"\x00\x00\x00\x00" + b"ping")
    from fastpyvectordb_spark.streaming.ws import read_frame
    opcode, payload = read_frame(c.sock)
    assert opcode == 0xA and payload == b"ping"
    c.close()


def test_websocket_sink_foreachbatch(spark, server):
    cli = WebSocketClient("127.0.0.1", server.port, collection="events")
    time.sleep(0.2)
    df = spark.createDataFrame(
        [(1, "click", 10), (2, "view", 11)],
        "event_id long, event_type string, user_id long",
    )
    sink = websocket_sink(server, collection="events", max_rows_per_batch=10)
    sink(df, batch_id=0)
    got = _drain_n(cli, 2)
    assert sorted(e["event_id"] for e in got) == [1, 2]
    assert all(e["collection"] == "events" for e in got)
    cli.close()


def test_websocket_sink_overflow_marker(spark, server):
    cli = WebSocketClient("127.0.0.1", server.port, collection="events")
    time.sleep(0.2)
    df = spark.range(8).selectExpr(
        "id AS event_id", "'click' AS event_type", "id AS user_id"
    )
    sink = websocket_sink(server, collection="events", max_rows_per_batch=3)
    sink(df, batch_id=7)
    got = _drain_n(cli, 4)
    types = [e.get("event_type") for e in got]
    assert types.count("_overflow") == 1
    marker = next(e for e in got if e["event_type"] == "_overflow")
    assert marker["dropped_beyond"] == 3 and marker["batch_id"] == 7
    assert len([e for e in got if e["event_type"] == "click"]) == 3
    cli.close()
