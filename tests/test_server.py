"""REST shim (S9) end-to-end: the reference server surface
(``server.py:182-449`` routes) driven over real HTTP against the Spark
catalog."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    from fastpyvectordb_spark.catalog import VectorDB
    from fastpyvectordb_spark.server import serve

    db = VectorDB(spark, str(tmp_path_factory.mktemp("restdb")))
    srv = serve(db, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()


def _req(base, method, path, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(
        base + path, data=data, method=method,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_rest_lifecycle(api):
    status, health = _req(api, "GET", "/health")
    assert status == 200 and health["status"] == "ok"

    status, info = _req(
        api, "POST", "/collections",
        {"name": "docs", "dimensions": 4, "metric": "l2"},
    )
    assert status == 200 and info["dimensions"] == 4

    status, names = _req(api, "GET", "/collections")
    assert names == ["docs"]

    status, r = _req(
        api, "POST", "/collections/docs/vectors/batch",
        {
            "ids": ["a", "b", "c"],
            "vectors": [[0, 0, 0, 1], [0, 0, 1, 0], [1, 0, 0, 0]],
            "metadatas": [{"tag": "x"}, {"tag": "y"}, {"tag": "x"}],
        },
    )
    assert status == 200 and r["count"] == 3

    status, r = _req(
        api, "POST", "/collections/docs/vectors",
        {"id": "d", "vector": [0.9, 0, 0, 0], "metadata": {"tag": "y"}},
    )
    assert status == 200 and r["success"]

    # duplicate id → 400 (reference rejects dup ids, D1)
    status, r = _req(
        api, "POST", "/collections/docs/vectors",
        {"id": "d", "vector": [1, 1, 1, 1]},
    )
    assert status == 400

    status, r = _req(api, "GET", "/collections/docs/vectors/a")
    assert status == 200 and r["metadata"] == {"tag": "x"}
    assert r["vector"] == [0.0, 0.0, 0.0, 1.0]

    status, r = _req(
        api, "POST", "/collections/docs/search",
        {"vector": [1, 0, 0, 0], "k": 2},
    )
    assert status == 200
    assert [x["id"] for x in r["results"]] == ["c", "d"]
    assert r["results"][0]["score"] == 0.0  # exact match c

    # filtered search: metadata equality (F6 dict form)
    status, r = _req(
        api, "POST", "/collections/docs/search",
        {"vector": [1, 0, 0, 0], "k": 2, "filter": {"tag": "x"}},
    )
    assert [x["id"] for x in r["results"]] == ["c", "a"]

    status, r = _req(
        api, "POST", "/collections/docs/search/batch",
        {"vectors": [[1, 0, 0, 0], [0, 0, 0, 1]], "k": 1},
    )
    assert [x[0]["id"] for x in r["results"]] == ["c", "a"]

    # upsert changes the vector in place
    status, r = _req(
        api, "PUT", "/collections/docs/vectors",
        {"id": "d", "vector": [0, 1, 0, 0], "metadata": {"tag": "z"}},
    )
    assert status == 200
    status, r = _req(api, "GET", "/collections/docs/vectors/d")
    assert r["vector"] == [0.0, 1.0, 0.0, 0.0] and r["metadata"] == {"tag": "z"}

    status, r = _req(api, "GET", "/collections/docs/ids?limit=2&offset=1")
    assert status == 200 and len(r["ids"]) == 2 and r["count"] == 4

    status, r = _req(api, "DELETE", "/collections/docs/vectors/a")
    assert status == 200
    status, r = _req(api, "GET", "/collections/docs/vectors/a")
    assert status == 404

    status, r = _req(api, "POST", "/admin/save")
    assert status == 200 and r["saved"]

    status, r = _req(api, "DELETE", "/collections/docs")
    assert status == 200
    status, names = _req(api, "GET", "/collections")
    assert names == []
