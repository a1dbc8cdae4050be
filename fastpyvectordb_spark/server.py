"""Thin REST shim over the catalog (SURVEY §2.1 S9).

Mirrors the reference FastAPI surface (``server.py:182-449``: health,
collection CRUD, vector insert/batch/upsert/get/delete, search,
batch search, ids listing, admin/save) as a stdlib
``ThreadingHTTPServer`` — deliberately framework-free: the engine is
the Spark catalog; the API layer is transport only, exactly the
"thin API layer" stance SURVEY §2.1 prescribes. One driver-side lock
serializes mutations (the reference serializes with an RLock too,
``vectordb_optimized.py:224``); reads go through the same DataFrame
plans as the Python API.

Search responses carry ``score`` = distance (lower is better) like the
reference's vector endpoints, and ``took_ms`` timing
(``server.py:376-389``).
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from fastpyvectordb_spark.catalog import VectorDB

_INTERNAL = ("id", "embedding")


def _meta(row: dict) -> dict:
    return {
        k: v
        for k, v in row.items()
        if k not in _INTERNAL and not k.startswith("_") and v is not None
    }


class _Handler(BaseHTTPRequestHandler):
    server_version = "fastpyvectordb-spark/0.1"

    # routes: (method, compiled pattern, handler name)
    ROUTES = [
        ("GET", r"^/health$", "health"),
        ("GET", r"^/$", "health"),
        ("GET", r"^/collections$", "list_collections"),
        ("POST", r"^/collections$", "create_collection"),
        ("GET", r"^/collections/([^/]+)$", "collection_info"),
        ("DELETE", r"^/collections/([^/]+)$", "delete_collection"),
        ("POST", r"^/collections/([^/]+)/vectors$", "insert_vector"),
        ("POST", r"^/collections/([^/]+)/vectors/batch$", "insert_batch"),
        ("PUT", r"^/collections/([^/]+)/vectors$", "upsert_vector"),
        ("GET", r"^/collections/([^/]+)/vectors/([^/]+)$", "get_vector"),
        ("DELETE", r"^/collections/([^/]+)/vectors/([^/]+)$", "delete_vector"),
        ("POST", r"^/collections/([^/]+)/search$", "search"),
        ("POST", r"^/collections/([^/]+)/search/batch$", "search_batch"),
        ("GET", r"^/collections/([^/]+)/ids$", "list_ids"),
        ("POST", r"^/admin/save$", "admin_save"),
    ]

    def log_message(self, *a):  # quiet
        pass

    # -- plumbing -----------------------------------------------------

    def _send(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if not n:
            return {}
        return json.loads(self.rfile.read(n))

    def _dispatch(self, method: str) -> None:
        path, _, query = self.path.partition("?")
        self.query = dict(
            p.split("=", 1) for p in query.split("&") if "=" in p
        )
        for m, pat, name in self.ROUTES:
            if m != method:
                continue
            match = re.match(pat, path)
            if match:
                try:
                    getattr(self, name)(*match.groups())
                except KeyError as e:
                    self._send(404, {"detail": str(e)})
                except ValueError as e:
                    self._send(400, {"detail": str(e)})
                except Exception as e:  # surface, don't crash the thread
                    self._send(500, {"detail": f"{type(e).__name__}: {e}"})
                return
        self._send(404, {"detail": f"no route {method} {path}"})

    def do_GET(self):
        self._dispatch("GET")

    def do_POST(self):
        self._dispatch("POST")

    def do_PUT(self):
        self._dispatch("PUT")

    def do_DELETE(self):
        self._dispatch("DELETE")

    # -- handlers -----------------------------------------------------

    @property
    def db(self) -> VectorDB:
        return self.server.db  # type: ignore[attr-defined]

    @property
    def lock(self) -> threading.Lock:
        return self.server.db_lock  # type: ignore[attr-defined]

    def _collection(self, name: str):
        return self.db.get_collection(name)

    def health(self):
        self._send(
            200,
            {
                "status": "ok",
                "collections": len(self.db.list_collections()),
                "engine": "fastpyvectordb_spark",
            },
        )

    def list_collections(self):
        self._send(200, self.db.list_collections())

    def create_collection(self):
        b = self._body()
        with self.lock:
            c = self.db.create_collection(
                b["name"], int(b["dimensions"]), b.get("metric", "cosine")
            )
        self._send(
            200,
            {
                "name": b["name"],
                "dimensions": c.config.dimensions,
                "metric": c.config.metric,
                "count": c.count(),
            },
        )

    def collection_info(self, name: str):
        c = self._collection(name)
        self._send(
            200,
            {
                "name": name,
                "dimensions": c.config.dimensions,
                "metric": c.config.metric,
                "count": c.count(),
            },
        )

    def delete_collection(self, name: str):
        with self.lock:
            self.db.delete_collection(name)
        self._send(200, {"deleted": name, "success": True})

    def insert_vector(self, name: str):
        b = self._body()
        c = self._collection(name)
        with self.lock:
            c.insert(b["vector"], b["id"], b.get("metadata"))
        self._send(200, {"id": b["id"], "success": True})

    def insert_batch(self, name: str):
        b = self._body()
        c = self._collection(name)
        ids = b["ids"]
        metas = b.get("metadatas") or [{}] * len(ids)
        rows = [
            {"id": i, "embedding": [float(x) for x in v], **(m or {})}
            for i, v, m in zip(ids, b["vectors"], metas)
        ]
        from pyspark.sql import functions as F

        batch = self.db.spark.createDataFrame(rows).withColumn(
            "embedding", F.col("embedding").cast("array<float>")
        )
        with self.lock:
            n = c.insert_batch(batch)
        self._send(200, {"ids": ids, "count": n, "success": True})

    def upsert_vector(self, name: str):
        b = self._body()
        c = self._collection(name)
        row = {
            "id": b["id"],
            "embedding": [float(x) for x in b["vector"]],
            **(b.get("metadata") or {}),
        }
        from pyspark.sql import functions as F

        batch = self.db.spark.createDataFrame([row]).withColumn(
            "embedding", F.col("embedding").cast("array<float>")
        )
        with self.lock:
            c.upsert(batch)
        self._send(200, {"id": b["id"], "success": True})

    def get_vector(self, name: str, vec_id: str):
        c = self._collection(name)
        rows = c.get([vec_id], include_vector=True).collect()
        if not rows:
            self._send(404, {"detail": f"id {vec_id!r} not found"})
            return
        row = rows[0].asDict()
        self._send(
            200,
            {
                "id": row["id"],
                "metadata": _meta(row),
                "vector": [float(x) for x in row["embedding"]],
            },
        )

    def delete_vector(self, name: str, vec_id: str):
        c = self._collection(name)
        with self.lock:
            c.delete(ids=[vec_id])
        self._send(200, {"deleted": vec_id, "success": True})

    def _run_search(self, c, vector, k, where, include_vectors):
        rows = [r.asDict() for r in c.search(vector, k=k, where=where).collect()]
        return [
            {
                "id": r["id"],
                "score": float(r["dist"]),
                "metadata": _meta({k2: v for k2, v in r.items() if k2 != "dist"}),
                **(
                    {"vector": [float(x) for x in r["embedding"]]}
                    if include_vectors and "embedding" in r
                    else {}
                ),
            }
            for r in rows
        ]

    def search(self, name: str):
        b = self._body()
        c = self._collection(name)
        t0 = time.perf_counter()
        results = self._run_search(
            c,
            b["vector"],
            int(b.get("k", 10)),
            b.get("filter"),
            bool(b.get("include_vectors", False)),
        )
        self._send(
            200,
            {
                "results": results,
                "took_ms": round((time.perf_counter() - t0) * 1e3, 3),
            },
        )

    def search_batch(self, name: str):
        b = self._body()
        c = self._collection(name)
        t0 = time.perf_counter()
        out = [
            self._run_search(c, v, int(b.get("k", 10)), b.get("filter"), False)
            for v in b["vectors"]
        ]
        self._send(
            200,
            {
                "results": out,
                "took_ms": round((time.perf_counter() - t0) * 1e3, 3),
            },
        )

    def list_ids(self, name: str):
        c = self._collection(name)
        limit = int(self.query.get("limit", 100))
        offset = int(self.query.get("offset", 0))
        self._send(
            200, {"ids": c.list_ids(limit=limit, offset=offset), "count": c.count()}
        )

    def admin_save(self):
        # every mutation commits an immutable version dir — nothing to
        # flush (the reference flushes its in-memory index here)
        self._send(200, {"saved": True, "collections": self.db.list_collections()})


def serve(db: VectorDB, host: str = "127.0.0.1", port: int = 8000):
    """Create (not start) a threaded HTTP server bound to ``db``.
    Call ``.serve_forever()`` (typically in a thread) and
    ``.shutdown()`` to stop. Port 0 picks an ephemeral port
    (``server.server_address[1]``)."""
    srv = ThreadingHTTPServer((host, port), _Handler)
    srv.db = db  # type: ignore[attr-defined]
    srv.db_lock = threading.Lock()  # type: ignore[attr-defined]
    return srv
