"""Subscription semantics over the RFC 6455 bus (reference
realtime.py:133-215): per-collection connect paths, in-band
subscription narrowing, filtered ring replay, and the bounded
foreachBatch sink's overflow marker.

(The base transport — handshake, frames, live broadcast, plain-replay,
ping/pong — is pinned in test_streaming.py; this file covers the
Subscription layer added on top.)
"""

from __future__ import annotations

import json
import time

import pytest

from fastpyvectordb_spark.streaming.ws import (
    Subscription,
    WebSocketBroadcaster,
    client_connect,
    websocket_sink,
)


@pytest.fixture()
def bus():
    b = WebSocketBroadcaster(history=5)
    yield b
    b.close()


def _register_barrier(bus, n, timeout=20.0):
    """Wait until ``n`` clients are registered (the accept loop runs in
    a thread; registration races the first broadcast otherwise)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        with bus._lock:
            if len(bus._clients) >= n:
                return
        time.sleep(0.02)
    raise AssertionError(f"{n} clients never registered")


def _read_until(client, pred, limit=30):
    for _ in range(limit):
        got = json.loads(client.recv_text())
        if pred(got):
            return got
    raise AssertionError("expected frame never arrived")


def test_subscription_matches_semantics():
    wild = Subscription("*")
    typed = Subscription("orders", event_types=["delete"], user_ids=["u1"])
    assert wild.matches({"collection": "anything", "event_type": "x"})
    assert wild.matches({})  # plain-string broadcasts
    assert typed.matches({"collection": "orders", "event_type": "delete",
                          "user_id": "u1"})
    assert not typed.matches({"collection": "other", "event_type": "delete",
                              "user_id": "u1"})
    assert not typed.matches({"collection": "orders", "event_type": "insert",
                              "user_id": "u1"})
    assert not typed.matches({"collection": "orders", "event_type": "delete",
                              "user_id": "u2"})
    # sink-wrapped rows: type/user live under "event"
    assert typed.matches({"collection": "orders",
                          "event": {"event_type": "delete", "user_id": "u1"}})
    # a field-less event (plain-string broadcast) must NOT leak into a
    # collection-scoped socket — wildcard subscribers only
    assert not Subscription("orders").matches({})
    assert not Subscription("orders").matches({"event_type": "delete"})
    # the overflow control marker bypasses event_type/user narrowing
    # (else a narrowed client sees a silent drop) but not collection
    # scoping
    assert typed.matches({"collection": "orders", "event_type": "_overflow"})
    assert not typed.matches({"collection": "other",
                              "event_type": "_overflow"})


def test_collection_path_filters_broadcasts(bus):
    a = client_connect(bus.host, bus.port, timeout=30, collection="orders")
    b = client_connect(bus.host, bus.port, timeout=30)  # wildcard
    _register_barrier(bus, 2)
    bus.broadcast({"collection": "orders", "event_type": "insert", "id": 1})
    bus.broadcast({"collection": "other", "event_type": "insert", "id": 2})
    bus.broadcast({"collection": "orders", "event_type": "insert", "id": 3})
    assert _read_until(a, lambda g: g.get("id") == 1)
    # id=2 must NOT arrive on the orders socket: next frame is id=3
    nxt = json.loads(a.recv_text())
    assert nxt["id"] == 3
    assert _read_until(b, lambda g: g.get("id") == 2)  # wildcard sees all
    a.send_close(); b.send_close()


def test_ring_replay_is_subscription_filtered(bus):
    for i in range(7):  # history=5 → ring keeps 2..6
        bus.broadcast({
            "collection": "orders" if i % 2 == 0 else "other",
            "event_type": "e", "id": i,
        })
    late = client_connect(bus.host, bus.port, timeout=30, collection="orders")
    # ring = ids 2..6; orders-only = 2, 4, 6
    got = [json.loads(late.recv_text())["id"] for _ in range(3)]
    assert got == [2, 4, 6]
    late.send_close()


def test_inband_subscription_update_narrows(bus):
    c = client_connect(bus.host, bus.port, timeout=30)
    _register_barrier(bus, 1)
    c.send_text(json.dumps({"event_types": ["delete"]}))
    # update is applied by the client loop thread; wait for it to land
    deadline = time.time() + 20
    while time.time() < deadline:
        with bus._lock:
            sub = next(iter(bus._clients.values()), None)
        if sub is not None and sub.event_types == {"delete"}:
            break
        time.sleep(0.02)
    bus.broadcast({"collection": "c", "event_type": "insert", "id": 1})
    bus.broadcast({"collection": "c", "event_type": "delete", "id": 2})
    first = json.loads(c.recv_text())
    assert first["id"] == 2  # the insert was filtered out server-side
    c.send_close()


def test_inband_updates_compose_and_tolerate_non_objects(bus):
    c = client_connect(bus.host, bus.port, timeout=30)
    _register_barrier(bus, 1)

    def wait_sub(pred, timeout=20):
        deadline = time.time() + timeout
        while time.time() < deadline:
            with bus._lock:
                sub = next(iter(bus._clients.values()), None)
            if sub is not None and pred(sub):
                return sub
            time.sleep(0.02)
        raise AssertionError("subscription state never reached")

    c.send_text(json.dumps({"event_types": ["delete"]}))
    wait_sub(lambda s: s.event_types == {"delete"})
    # non-object JSON is not an update and must NOT drop the client
    c.send_text(json.dumps("ping"))
    c.send_text(json.dumps([1, 2]))
    # a later update naming only user_ids keeps the event_types
    # narrowing (absent key = unchanged; explicit null clears)
    c.send_text(json.dumps({"user_ids": ["u1"]}))
    sub = wait_sub(
        lambda s: s.user_ids == {"u1"} and s.event_types == {"delete"}
    )
    assert sub.event_types == {"delete"}
    c.send_text(json.dumps({"event_types": None}))
    wait_sub(lambda s: s.event_types is None and s.user_ids == {"u1"})
    c.send_close()


def test_collection_names_with_spaces_roundtrip(bus):
    c = client_connect(bus.host, bus.port, timeout=30,
                       collection="my coll")
    _register_barrier(bus, 1)
    with bus._lock:
        sub = next(iter(bus._clients.values()))
    assert sub.collection == "my coll"
    bus.broadcast({"collection": "my coll", "event_type": "e", "id": 1})
    assert json.loads(c.recv_text())["id"] == 1
    c.send_close()


def test_websocket_sink_overflow_marker(spark, bus):
    c = client_connect(bus.host, bus.port, timeout=30)
    _register_barrier(bus, 1)
    df = spark.range(8).selectExpr(
        "id AS event_id", "'click' AS event_type", "CAST(id AS STRING) AS user_id"
    )
    websocket_sink(bus, max_rows=3, collection="events")(df, batch_id=7)
    rows, marker = [], None
    for _ in range(10):
        got = json.loads(c.recv_text())
        if got.get("event_type") == "_overflow":
            marker = got
            break
        rows.append(got)
    assert len(rows) == 3 and all(r["collection"] == "events" for r in rows)
    assert marker is not None
    assert marker["dropped_beyond"] == 3 and marker["batch_id"] == 7
    c.send_close()


def test_websocket_sink_no_marker_at_exact_cap(spark, bus):
    c = client_connect(bus.host, bus.port, timeout=30)
    _register_barrier(bus, 1)
    df = spark.range(3).selectExpr("id AS event_id", "'click' AS event_type")
    websocket_sink(bus, max_rows=3)(df, batch_id=1)
    bus.broadcast({"sentinel": True})
    seen = [json.loads(c.recv_text()) for _ in range(4)]
    assert sum(1 for s in seen if "event" in s) == 3
    assert not any(s.get("event_type") == "_overflow" for s in seen)
    assert seen[-1].get("sentinel") is True
    c.send_close()
