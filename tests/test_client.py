"""VectorDBClient ↔ server round-trip: the reference client surface
(``client.py:32-283``) driven over real HTTP against the Spark-backed
server — every core method, plus 404→None, optional ids, and the
server_full extras."""

from __future__ import annotations

import threading

import pytest

from fastpyvectordb_spark.client import ClientError, SearchResult, VectorDBClient


@pytest.fixture(scope="module")
def client(spark, tmp_path_factory):
    from fastpyvectordb_spark.catalog import VectorDB
    from fastpyvectordb_spark.server import serve

    db = VectorDB(spark, str(tmp_path_factory.mktemp("clientdb")))
    srv = serve(db, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    with VectorDBClient(f"http://127.0.0.1:{srv.server_address[1]}") as c:
        yield c
    srv.shutdown()


@pytest.mark.slow
def test_client_lifecycle(client):
    assert client.health()["status"] == "ok"
    client.create_collection("docs", dimensions=4, metric="l2")
    assert "docs" in client.list_collections()
    info = client.get_collection("docs")
    assert info["dimensions"] == 4 and info["metric"] == "l2"

    # insert with explicit id, then with a generated one (reference
    # client.py:102-121: id optional, server fills it in)
    assert client.insert("docs", [0.0, 0.0, 0.0, 1.0], id="a",
                         metadata={"tag": "x"}) == "a"
    gen = client.insert("docs", [0.0, 0.0, 1.0, 0.0])
    assert isinstance(gen, str) and len(gen) > 0 and gen != "a"

    # batch with ids + reference-spelled "metadata" list
    ids = client.insert_batch(
        "docs",
        [[0.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]],
        ids=["c", "d"],
        metadata=[{"tag": "y"}, {"tag": "x"}],
    )
    assert ids == ["c", "d"]
    # batch without ids → server generates
    gen_ids = client.insert_batch("docs", [[0.5, 0.5, 0.0, 0.0]])
    assert len(gen_ids) == 1 and gen_ids[0] not in ("a", "c", "d")

    got = client.get("docs", "a")
    assert got["id"] == "a" and got["metadata"]["tag"] == "x"
    assert "vector" not in got
    with_vec = client.get("docs", "a", include_vector=True)
    assert with_vec["vector"] == [0.0, 0.0, 0.0, 1.0]
    assert client.get("docs", "nope") is None  # 404 → None

    hits = client.search("docs", [0.0, 0.0, 0.0, 1.0], k=2)
    assert isinstance(hits[0], SearchResult)
    assert hits[0].id == "a"  # exact match ranks first under l2
    filtered = client.search(
        "docs", [0.0, 0.0, 0.0, 1.0], k=5, filter={"tag": "y"}
    )
    assert [h.id for h in filtered] == ["c"]
    with_vecs = client.search("docs", [0.0, 0.0, 0.0, 1.0], k=1,
                              include_vectors=True)
    assert with_vecs[0].vector == [0.0, 0.0, 0.0, 1.0]

    batches = client.search_batch(
        "docs", [[0.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 0.0]], k=1
    )
    assert [b[0].id for b in batches] == ["a", "c"]

    listing = client.list_ids("docs", limit=3)
    assert listing["count"] == 5 and len(listing["ids"]) == 3

    assert client.delete("docs", "d") is True
    assert client.get("docs", "d") is None
    client.save()  # no-op flush, must not raise
    assert client.delete_collection("docs") is True
    assert "docs" not in client.list_collections()


def test_client_error_surface(client):
    with pytest.raises(ClientError) as ei:
        client.get_collection("missing")
    assert ei.value.status == 404


def test_client_text_and_embedding_extras(client):
    # the embeddings endpoints use the server's global mock embedder
    # (384-dim, the reference default) — size the collection to match
    client.create_collection("texts", dimensions=384)
    ids = client.insert_texts("texts", ["hello world", "goodbye moon"],
                              ids=["t1", "t2"],
                              metadata=[{"topic": "greet"}, {"topic": "part"}])
    assert ids == ["t1", "t2"]
    assert client.get("texts", "t1")["metadata"]["topic"] == "greet"
    vec = client.embed("hello world")
    assert len(vec) == 384
    vecs = client.embed_batch(["a", "b"])
    assert len(vecs) == 2 and len(vecs[0]) == 384
    # the mock embedder is deterministic: same text → same vector →
    # a search by the embedded query returns its own document first
    hits = client.search("texts", vec, k=1)
    assert hits[0].id == "t1"
    client.delete_collection("texts")


def test_client_non_dict_json_error_body(monkeypatch):
    """A JSON error body that is a bare string/list (not a dict) must
    surface as ClientError, not AttributeError (ADVICE r2)."""
    import io
    import urllib.error
    import urllib.request

    def boom(req, timeout=None):
        raise urllib.error.HTTPError(
            req.full_url, 422, "Unprocessable", {},
            io.BytesIO(b'["field x is required"]'),
        )

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    c = VectorDBClient("http://127.0.0.1:1")
    with pytest.raises(ClientError) as ei:
        c.health()
    assert ei.value.status == 422
    assert "field x is required" in str(ei.value)


def test_client_search_ann_flag(client):
    """ann=True routes the request through the collection's IVF index
    (round 6 server opt-in); on a small collection with exhaustive
    probes the hits match the exact path."""
    import random

    rng = random.Random(21)
    client.create_collection("annclient", dimensions=6)
    vecs = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(80)]
    client.insert_batch(
        "annclient", vecs, ids=[f"v{i}" for i in range(80)]
    )
    q = vecs[11]
    exact = client.search("annclient", q, k=5)
    ann = client.search("annclient", q, k=5, ann=True)
    assert ann[0].id == "v11" and ann[0].score == 0.0
    assert {r.id for r in ann} == {r.id for r in exact}
