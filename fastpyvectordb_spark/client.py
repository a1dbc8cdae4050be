"""HTTP client for the REST server — the reference's ``client.py``
surface (``client.py:32-283``) on the Python stdlib.

The reference builds on ``httpx``; that package is not required here —
``urllib.request`` covers everything the API needs (JSON bodies, query
params, status handling), so the client runs anywhere the package does
with zero extra deps. Method names, signatures, payload keys and return
shapes mirror the reference one-for-one, so a user of the reference
client can point this one at the Spark-backed server unchanged:

    with VectorDBClient("http://localhost:8000") as client:
        client.create_collection("docs", dimensions=384)
        client.insert("docs", vector=[...], metadata={"title": "hi"})
        hits = client.search("docs", vector=[...], k=10)

Beyond the reference core, the server also exposes the ``server_full``
extras (text auto-embed, graph CRUD/query, embedding endpoints); the
client carries those too so the whole route table is reachable.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any


@dataclass
class SearchResult:
    """One hit (reference ``client.py:24-29``)."""

    id: str
    score: float
    metadata: dict = field(default_factory=dict)
    vector: list[float] | None = None


class ClientError(Exception):
    """Non-2xx response (the reference raises httpx.HTTPStatusError)."""

    def __init__(self, status: int, detail: str):
        super().__init__(f"HTTP {status}: {detail}")
        self.status = status
        self.detail = detail


class VectorDBClient:
    """Stdlib HTTP client for the vector-DB server (reference
    ``client.py:32``)."""

    def __init__(self, base_url: str = "http://localhost:8000",
                 timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    # -- context manager (reference client.py:39-46) -------------------
    def close(self) -> None:  # no pooled resources to release
        pass

    def __enter__(self) -> "VectorDBClient":
        return self

    def __exit__(self, *args) -> None:
        self.close()

    # -- transport -----------------------------------------------------
    def _request(self, method: str, path: str, body: dict | None = None,
                 params: dict | None = None) -> tuple[int, Any]:
        url = f"{self.base_url}{path}"
        if params:
            url += "?" + urllib.parse.urlencode(
                {k: str(v) for k, v in params.items()}
            )
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            url, data=data, method=method,
            headers={"Content-Type": "application/json"} if data else {},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, json.loads(resp.read() or b"null")
        except urllib.error.HTTPError as e:
            payload = e.read()
            try:
                js = json.loads(payload)
                # error body may be a bare string/list, not a dict
                # json.dumps, not str(): a bare-list/string error body
                # must surface as the server's JSON text, not a Python
                # repr with single quotes
                detail = (
                    js.get("detail", payload.decode())
                    if isinstance(js, dict)
                    else json.dumps(js)
                )
            except ValueError:
                detail = payload.decode(errors="replace")
            return e.code, {"detail": detail}

    def _ok(self, method: str, path: str, body: dict | None = None,
            params: dict | None = None) -> Any:
        status, js = self._request(method, path, body, params)
        if status >= 400:
            raise ClientError(status, js.get("detail", ""))
        return js

    # -- health (client.py:52-57) --------------------------------------
    def health(self) -> dict:
        return self._ok("GET", "/health")

    # -- collections (client.py:62-97) ---------------------------------
    def list_collections(self) -> list[str]:
        return self._ok("GET", "/collections")

    def create_collection(self, name: str, dimensions: int,
                          metric: str = "cosine", **kwargs) -> dict:
        return self._ok("POST", "/collections", {
            "name": name, "dimensions": dimensions, "metric": metric,
            **kwargs,
        })

    def get_collection(self, name: str) -> dict:
        return self._ok("GET", f"/collections/{urllib.parse.quote(name)}")

    def delete_collection(self, name: str) -> bool:
        js = self._ok("DELETE", f"/collections/{urllib.parse.quote(name)}")
        return bool(js.get("success", js.get("deleted")))

    # -- vectors (client.py:102-186) -----------------------------------
    def insert(self, collection: str, vector: list[float],
               id: str | None = None, metadata: dict | None = None) -> str:
        data: dict = {"vector": vector}
        if id:
            data["id"] = id
        if metadata:
            data["metadata"] = metadata
        return self._ok(
            "POST", f"/collections/{urllib.parse.quote(collection)}/vectors",
            data,
        )["id"]

    def insert_batch(self, collection: str, vectors: list[list[float]],
                     ids: list[str] | None = None,
                     metadata: list[dict] | None = None) -> list[str]:
        data: dict = {"vectors": vectors}
        if ids:
            data["ids"] = ids
        if metadata:
            data["metadata"] = metadata
        return self._ok(
            "POST",
            f"/collections/{urllib.parse.quote(collection)}/vectors/batch",
            data,
        )["ids"]

    def upsert(self, collection: str, id: str, vector: list[float],
               metadata: dict | None = None) -> str:
        data: dict = {"id": id, "vector": vector}
        if metadata:
            data["metadata"] = metadata
        return self._ok(
            "PUT", f"/collections/{urllib.parse.quote(collection)}/vectors",
            data,
        )["id"]

    def get(self, collection: str, id: str,
            include_vector: bool = False) -> dict | None:
        status, js = self._request(
            "GET",
            f"/collections/{urllib.parse.quote(collection)}"
            f"/vectors/{urllib.parse.quote(id)}",
            params={"include_vector": str(include_vector).lower()},
        )
        if status == 404:  # reference client.py:175-176
            return None
        if status >= 400:
            raise ClientError(status, js.get("detail", ""))
        return js

    def delete(self, collection: str, id: str) -> bool:
        js = self._ok(
            "DELETE",
            f"/collections/{urllib.parse.quote(collection)}"
            f"/vectors/{urllib.parse.quote(id)}",
        )
        return bool(js.get("success", js.get("deleted")))

    # -- search (client.py:192-262) ------------------------------------
    def search(self, collection: str, vector: list[float], k: int = 10,
               filter: dict | None = None, include_vectors: bool = False,
               ef_search: int | None = None,
               ann: bool = False) -> list[SearchResult]:
        data: dict = {"vector": vector, "k": k,
                      "include_vectors": include_vectors}
        if filter:
            data["filter"] = filter
        if ef_search:  # accepted-but-advisory, as in the server
            data["ef_search"] = ef_search
        if ann:  # route through the collection's IVF index (round 6)
            data["ann"] = True
        js = self._ok(
            "POST", f"/collections/{urllib.parse.quote(collection)}/search",
            data,
        )
        return [
            SearchResult(
                id=item["id"], score=item["score"],
                metadata=item.get("metadata", {}),
                vector=item.get("vector"),
            )
            for item in js["results"]
        ]

    def search_batch(self, collection: str, vectors: list[list[float]],
                     k: int = 10,
                     filter: dict | None = None) -> list[list[SearchResult]]:
        data: dict = {"vectors": vectors, "k": k}
        if filter:
            data["filter"] = filter
        js = self._ok(
            "POST",
            f"/collections/{urllib.parse.quote(collection)}/search/batch",
            data,
        )
        return [
            [
                SearchResult(id=item["id"], score=item["score"],
                             metadata=item.get("metadata", {}))
                for item in results
            ]
            for results in js["results"]
        ]

    # -- admin (client.py:264-283) -------------------------------------
    def save(self) -> None:
        self._ok("POST", "/admin/save")

    def list_ids(self, collection: str, limit: int = 100,
                 offset: int = 0) -> dict:
        return self._ok(
            "GET", f"/collections/{urllib.parse.quote(collection)}/ids",
            params={"limit": limit, "offset": offset},
        )

    # -- server_full extras (beyond the reference client) --------------
    def insert_texts(self, collection: str, texts: list[str],
                     ids: list[str] | None = None,
                     metadata: list[dict] | None = None) -> list[str]:
        data: dict = {"texts": texts}
        if ids:
            data["ids"] = ids
        if metadata:
            data["metadata"] = metadata
        return self._ok(
            "POST", f"/collections/{urllib.parse.quote(collection)}/texts",
            data,
        )["ids"]

    def graph_query(self, cypher: str) -> list[dict]:
        """Rows as dicts — the server sends ``{"columns", "rows"}``
        (positional lists); zip them back together here."""
        js = self._ok("POST", "/graph/query", {"query": cypher})
        if isinstance(js, list):
            return js
        cols = js.get("columns", [])
        return [dict(zip(cols, row)) for row in js.get("rows", [])]

    def embed(self, text: str) -> list[float]:
        return self._ok("POST", "/embeddings/embed", {"text": text})["embedding"]

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        return self._ok(
            "POST", "/embeddings/embed-batch", {"texts": texts}
        )["embeddings"]
