"""Minimal RFC 6455 WebSocket broadcast server (stdlib only).

Closes the reference's S10 transport gap (``realtime.py:184-215``:
live-socket event broadcast with a last-N ring buffer replayed to late
joiners). Round 1 shipped the *semantics* (per-subscriber predicate
push + ``replay_last_n``) over an injected HTTP POST; this module adds
the actual WebSocket wire protocol so a browser/`websockets` client can
connect: HTTP upgrade handshake (Sec-WebSocket-Accept =
b64(sha1(key + GUID))), server→client unmasked text frames with
7/16/64-bit length encoding, masked client→server frame parsing,
ping/pong and close handling.

Spark integration: :func:`websocket_sink` returns a ``foreachBatch``
handler that broadcasts each micro-batch's rows as JSON text frames —
the same driver-side fan-out shape as ``push_to_subscribers`` (batches
are micro-batch-sized; the transport is not a data-plane sink).

No third-party deps; the test suite drives it with a raw-socket client
implementing the same framing.
"""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading
import urllib.parse
from collections import deque

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class Subscription:
    """The reference's Subscription model (``realtime.py:133-178``):
    ``None`` means wildcard; an event matches when collection,
    event_type and user_id all pass. Clients pick a collection via the
    connect path ``/ws/{collection}`` and may narrow event_types /
    user_ids with an in-band JSON text frame at any time."""

    def __init__(self, collection: str = "*", event_types=None, user_ids=None):
        self.collection = collection
        self.event_types = set(event_types) if event_types is not None else None
        self.user_ids = set(user_ids) if user_ids is not None else None

    def matches(self, event: dict) -> bool:
        if self.collection != "*":
            # an event with NO collection field (plain-string broadcast,
            # field-less producer dict) is deliverable to wildcard
            # subscribers only — a scoped socket must never receive
            # traffic it didn't subscribe to; explicit "*" fans out
            ev_coll = event.get("collection")
            if ev_coll not in (self.collection, "*") or ev_coll is None:
                return False
        # websocket_sink wraps rows as {"batch_id", "event": row} —
        # type/user live one level down there
        row = event.get("event", event) if isinstance(event.get("event"), dict) else event
        if row.get("event_type") == "_overflow":
            # control event: the truncation marker must reach every
            # subscriber of the collection REGARDLESS of narrowing,
            # or narrowed clients would see a silent drop
            return True
        if (
            self.event_types is not None
            and row.get("event_type") not in self.event_types
        ):
            return False
        if self.user_ids is not None and row.get("user_id") not in self.user_ids:
            return False
        return True


def _accept_key(key: str) -> str:
    return base64.b64encode(
        hashlib.sha1((key + _WS_GUID).encode()).digest()
    ).decode()


def encode_text_frame(payload: str) -> bytes:
    """Server→client text frame (FIN, opcode 0x1, unmasked)."""
    data = payload.encode("utf-8")
    n = len(data)
    if n < 126:
        header = struct.pack("!BB", 0x81, n)
    elif n < 2**16:
        header = struct.pack("!BBH", 0x81, 126, n)
    else:
        header = struct.pack("!BBQ", 0x81, 127, n)
    return header + data


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("socket closed")
        buf += chunk
    return buf


def decode_frame(sock: socket.socket) -> tuple[int, bytes]:
    """Read one (client→server, masked) frame → (opcode, payload)."""
    b0, b1 = _read_exact(sock, 2)
    opcode = b0 & 0x0F
    masked = b1 & 0x80
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack("!H", _read_exact(sock, 2))
    elif n == 127:
        (n,) = struct.unpack("!Q", _read_exact(sock, 8))
    mask = _read_exact(sock, 4) if masked else b"\x00" * 4
    data = bytearray(_read_exact(sock, n))
    if masked:
        for i in range(len(data)):
            data[i] ^= mask[i % 4]
    return opcode, bytes(data)


class WebSocketBroadcaster:
    """Accept-loop + client registry + last-``history`` ring buffer.

    ``broadcast(obj)`` JSON-encodes and pushes a text frame to every
    connected client; new clients first receive the ring buffer (the
    reference's late-joiner replay, ``realtime.py:198-205``)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, history: int = 100):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(16)
        self.host, self.port = self._srv.getsockname()
        self._clients: dict[socket.socket, Subscription] = {}
        self._ring: deque = deque(maxlen=history)  # (text, event_dict)
        self._lock = threading.Lock()
        self._closed = False
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    # -- server side --------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._closed:
            try:
                conn, _addr = self._srv.accept()
            except OSError:
                return
            try:
                collection = self._handshake(conn)
            except Exception:
                conn.close()
                continue
            sub = Subscription(collection)
            with self._lock:
                for text, event in self._ring:  # late-joiner replay
                    if sub.matches(event):
                        conn.sendall(encode_text_frame(text))
                self._clients[conn] = sub
            threading.Thread(
                target=self._client_loop, args=(conn,), daemon=True
            ).start()

    def _handshake(self, conn: socket.socket) -> str:
        """Upgrade → 101; returns the collection from ``/ws/{name}``
        (any other path = ``*``, the reference's wildcard channel)."""
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = conn.recv(4096)
            if not chunk:
                raise ConnectionError("client closed during handshake")
            data += chunk
        lines = data.decode("latin1").split("\r\n")
        parts = lines[0].split(" ")
        path = parts[1] if len(parts) > 1 else "/"
        headers = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        key = headers.get("sec-websocket-key")
        if not key or "websocket" not in headers.get("upgrade", "").lower():
            raise ValueError("not a websocket upgrade request")
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n"
            ).encode()
        )
        if path.startswith("/ws/") and len(path) > len("/ws/"):
            # percent-decode so names with spaces/unicode round-trip
            # (the client quotes on its side; a raw space would have
            # already truncated the request-line split above)
            return urllib.parse.unquote(path[len("/ws/"):])
        return "*"

    def _client_loop(self, conn: socket.socket) -> None:
        """Consume client frames: answer pings, honor close, apply
        in-band subscription updates (text frame with JSON
        ``{"event_types": [...], "user_ids": [...]}`` — the
        reference's update_subscription, ``realtime.py:171-178``)."""
        try:
            while True:
                opcode, payload = decode_frame(conn)
                if opcode == 0x8:  # close
                    break
                if opcode == 0x9:  # ping → pong
                    conn.sendall(
                        struct.pack("!BB", 0x8A, len(payload)) + payload
                    )
                elif opcode == 0x1:  # subscription update
                    try:
                        upd = json.loads(payload.decode("utf-8"))
                    except ValueError:
                        continue
                    if not isinstance(upd, dict):
                        # valid-but-non-object JSON ("ping", [1,2]) is
                        # not an update; dropping the CLIENT for it
                        # would be absurd
                        continue
                    with self._lock:
                        cur = self._clients.get(conn)
                        if cur is not None:
                            # compose: absent keys keep their current
                            # narrowing; an explicit null clears one
                            # back to wildcard
                            self._clients[conn] = Subscription(
                                upd.get("collection", cur.collection),
                                upd["event_types"]
                                if "event_types" in upd
                                else (
                                    sorted(cur.event_types)
                                    if cur.event_types is not None
                                    else None
                                ),
                                upd["user_ids"]
                                if "user_ids" in upd
                                else (
                                    sorted(cur.user_ids)
                                    if cur.user_ids is not None
                                    else None
                                ),
                            )
        except Exception:
            pass
        with self._lock:
            self._clients.pop(conn, None)
        conn.close()

    # -- producer side ------------------------------------------------

    def broadcast(self, obj) -> int:
        """Send one JSON message to every matching client; returns
        #delivered. A plain-string payload has no fields to match on
        and goes to wildcard subscribers only."""
        if isinstance(obj, str):
            text, event = obj, {}
        else:
            text, event = json.dumps(obj), obj
        frame = encode_text_frame(text)
        delivered = 0
        with self._lock:
            self._ring.append((text, event))
            dead = []
            for c, sub in self._clients.items():
                if not sub.matches(event):
                    continue
                try:
                    c.sendall(frame)
                    delivered += 1
                except OSError:
                    dead.append(c)
            for c in dead:
                self._clients.pop(c, None)
        return delivered

    def close(self) -> None:
        self._closed = True
        try:
            self._srv.close()
        finally:
            with self._lock:
                for c in self._clients:
                    try:
                        c.sendall(struct.pack("!BB", 0x88, 0))
                        c.close()
                    except OSError:
                        pass
                self._clients.clear()


def websocket_sink(broadcaster: WebSocketBroadcaster, max_rows: int = 10_000,
                   collection: str = "*"):
    """``foreachBatch`` handler broadcasting each micro-batch's rows as
    JSON text frames (row dicts, timestamps stringified). Bounded like
    ``push_to_subscribers``: at most ``max_rows`` rows are pushed per
    batch, streamed via ``toLocalIterator``; an oversized batch (a
    replay/catch-up, where live-pushing history is noise) emits one
    ``_overflow`` marker so the drop is visible, never silent."""

    def handle(batch_df, batch_id: int) -> None:
        sent = 0
        overflow = False
        for row in batch_df.toLocalIterator():
            if sent >= max_rows:  # a row BEYOND the cap proves a drop
                overflow = True
                break
            d = {
                k: (v.isoformat() if hasattr(v, "isoformat") else v)
                for k, v in row.asDict().items()
            }
            broadcaster.broadcast(
                {"batch_id": batch_id, "collection": collection, "event": d}
            )
            sent += 1
        if overflow:
            broadcaster.broadcast({
                "batch_id": batch_id,
                "collection": collection,
                "event_type": "_overflow",
                "dropped_beyond": max_rows,
            })

    return handle


# -- test/client helper (masked client→server frames) ------------------


class WSClient:
    """Buffered raw-socket WebSocket client (tests and simple
    consumers; production clients use any standard library).

    Buffering matters: the server may send replayed frames in the SAME
    TCP segment as the 101 handshake response — a client that reads the
    handshake with a raw recv() silently discards them."""

    def __init__(self, host: str, port: int, timeout: float = 5.0,
                 collection: str = "*"):
        path = (
            "/" if collection == "*"
            else f"/ws/{urllib.parse.quote(collection, safe='')}"
        )
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        key = base64.b64encode(b"0123456789abcdef").decode()
        self.sock.sendall(
            (
                f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("no handshake response")
            resp += chunk
        head, _, rest = resp.partition(b"\r\n\r\n")
        self._buf = rest  # frames that rode along with the handshake
        status = head.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise ConnectionError(f"handshake failed: {status!r}")
        if _accept_key(key).encode() not in head:
            raise ConnectionError("bad Sec-WebSocket-Accept")

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("socket closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def recv_text(self) -> str:
        b0, b1 = self._read_exact(2)
        opcode = b0 & 0x0F
        n = b1 & 0x7F
        if n == 126:
            (n,) = struct.unpack("!H", self._read_exact(2))
        elif n == 127:
            (n,) = struct.unpack("!Q", self._read_exact(8))
        payload = self._read_exact(n)
        if opcode != 0x1:
            raise ValueError(f"unexpected opcode {opcode}")
        return payload.decode("utf-8")

    def send_text(self, payload: str) -> None:
        """Masked client→server text frame (RFC requires the mask);
        used for in-band subscription updates."""
        data = bytearray(payload.encode("utf-8"))
        mask = b"\x37\xfa\x21\x3d"
        for i in range(len(data)):
            data[i] ^= mask[i % 4]
        n = len(data)
        if n < 126:
            head = struct.pack("!BB", 0x81, 0x80 | n)
        elif n < 2**16:
            head = struct.pack("!BBH", 0x81, 0x80 | 126, n)
        else:
            head = struct.pack("!BBQ", 0x81, 0x80 | 127, n)
        self.sock.sendall(head + mask + bytes(data))

    def send_close(self) -> None:
        mask = b"\x00\x00\x00\x00"
        self.sock.sendall(struct.pack("!BB", 0x88, 0x80) + mask)


def client_connect(host: str, port: int, timeout: float = 5.0,
                   collection: str = "*") -> WSClient:
    return WSClient(host, port, timeout=timeout, collection=collection)


def client_recv_text(client: WSClient) -> str:
    return client.recv_text()


def client_send_close(client: WSClient) -> None:
    client.send_close()
