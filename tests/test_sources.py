"""Ingestion sources: corrupt-tolerant corpus readers and the two
reference-format migration importers (fixture files are written in the
exact byte layouts of ``vectordb.py:300-325`` and
``binary_persistence.py:96-140``)."""

from __future__ import annotations

import json
import pickle
import struct

import numpy as np
import pytest

from fastpyvectordb_spark.sources import (
    import_reference_binary,
    import_reference_collection,
    read_documents_csv,
    read_documents_jsonl,
    split_corrupt,
)


def test_jsonl_reader_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}\n'
        '{"doc_id": 2, "text": "no lang field"}\n'
        "THIS IS NOT JSON{{{\n"
        '{"text": "id synthesized from text hash"}\n'
    )
    # no explicit cache: split_corrupt must cache internally — on a raw
    # reader plan Spark rejects corrupt-column-only queries outright
    df = read_documents_jsonl(spark, str(p))
    clean, bad = split_corrupt(df)
    rows = {r["doc_id"]: r.asDict() for r in clean.collect()}
    assert rows[1]["lang"] == "en" and rows[1]["n_chars"] == 11
    assert rows[2]["lang"] is None  # missing fields → null, not error
    assert bad.count() == 1
    assert "NOT JSON" in bad.collect()[0]["_corrupt_record"]
    # synthesized id: deterministic across re-reads
    synth = [k for k in rows if k not in (1, 2)]
    assert len(synth) == 1 and synth[0] > 0
    df2 = read_documents_jsonl(spark, str(p))
    again = [r["doc_id"] for r in split_corrupt(df2)[0].collect()]
    assert sorted(again) == sorted(rows)
    df.unpersist()


def test_csv_reader_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text(
        "doc_id,text,lang,source\n"
        "1,alpha,en,web\n"
        "not_a_number,beta,en,web\n"
        "2,gamma,fr,book\n"
    )
    clean, bad = split_corrupt(read_documents_csv(spark, str(p)))
    ids = sorted(r["doc_id"] for r in clean.collect())
    assert ids == [1, 2]
    assert bad.count() == 1


@pytest.fixture()
def vdb(spark, tmp_path):
    from fastpyvectordb_spark.catalog import VectorDB

    return VectorDB(spark, str(tmp_path / "db"))


def _write_reference_default_layout(d, vecs, metadata):
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps({
        "name": "legacy", "dimensions": 4, "metric": "l2",
        "M": 16, "ef_construction": 200, "ef_search": 50,
    }))
    (d / "metadata.json").write_text(json.dumps(metadata))
    # the reference pickles a dict through np.save (vectordb.py:311)
    np.save(d / "vectors.npy", np.array(vecs, dtype=object))
    (d / "state.json").write_text(json.dumps({
        "id_to_label": {k: i for i, k in enumerate(vecs)},
        "label_to_id": {str(i): k for i, k in enumerate(vecs)},
        "next_label": len(vecs),
    }))


def test_import_reference_default_layout(spark, vdb, tmp_path):
    vecs = {
        "a": np.array([0, 0, 0, 1], dtype=np.float32),
        "b": np.array([0, 0, 1, 0], dtype=np.float32),
        "c": np.array([1, 0, 0, 0], dtype=np.float32),
    }
    meta = {"a": {"tag": "x"}, "b": {"tag": "y"}}
    src = tmp_path / "legacy"
    _write_reference_default_layout(src, vecs, meta)

    coll = import_reference_collection(vdb, str(src), batch_size=2)
    assert coll.count() == 3
    got = {r["id"]: r.asDict() for r in coll.get(["a", "b", "c"]).collect()}
    assert got["a"]["tag"] == "x" and got["c"]["tag"] is None
    hits = coll.search([0, 0, 0, 1], k=1).collect()
    assert hits[0]["id"] == "a" and abs(hits[0]["dist"]) < 1e-9
    assert coll.config.metric == "l2" and coll.config.dimensions == 4


def _write_pyvdb_binary(path, ids, mat, metadata, dims):
    with open(path, "wb") as f:
        f.write(b"PYVDB")
        f.write(struct.pack("B", 1))
        header = json.dumps({"name": "bin", "dimensions": dims}).encode()
        f.write(struct.pack("I", len(header)))
        f.write(header)
        id_mapping = {
            "ids": ids,
            "id_to_label": {k: i for i, k in enumerate(ids)},
            "label_to_id": {str(i): k for i, k in enumerate(ids)},
        }
        blob = pickle.dumps(id_mapping, protocol=pickle.HIGHEST_PROTOCOL)
        f.write(struct.pack("I", len(blob)))
        f.write(blob)
        mblob = pickle.dumps(metadata, protocol=pickle.HIGHEST_PROTOCOL)
        f.write(struct.pack("I", len(mblob)))
        f.write(mblob)
        f.write(struct.pack("II", len(ids), dims))
        np.asarray(mat, dtype=np.float32).tofile(f)


def test_import_pyvdb_binary(spark, vdb, tmp_path):
    ids = ["v1", "v2"]
    mat = [[1, 0, 0], [0, 1, 0]]
    _write_pyvdb_binary(
        tmp_path / "data.bin", ids, mat, {"v2": {"kind": "probe"}}, dims=3
    )
    # directory form: the writer's own layout is <dir>/data.bin
    coll = import_reference_binary(vdb, str(tmp_path), name="binc")
    assert coll.count() == 2
    row = coll.get(["v2"]).collect()[0]
    assert row["kind"] == "probe"
    hits = coll.search([0, 1, 0], k=1).collect()
    assert hits[0]["id"] == "v2"


def test_import_all_null_metadata_key(spark, vdb, tmp_path):
    """A metadata key whose values are None in an entire chunk must not
    abort the import (schema inference would); mixed None/typed and
    non-scalar values also land (non-scalars as JSON text)."""
    vecs = {
        "a": np.array([1, 0], dtype=np.float32),
        "b": np.array([0, 1], dtype=np.float32),
    }
    meta = {"a": {"note": None, "nested": {"k": 1}},
            "b": {"note": None, "nested": None}}
    src = tmp_path / "nulls"
    _write_reference_default_layout(src, vecs, meta)
    (src / "config.json").write_text(json.dumps({
        "name": "nulls", "dimensions": 2, "metric": "cosine",
    }))
    coll = import_reference_collection(vdb, str(src), batch_size=10)
    rows = {r["id"]: r.asDict() for r in coll.get(["a", "b"]).collect()}
    assert rows["a"]["note"] is None and rows["b"]["note"] is None
    assert json.loads(rows["a"]["nested"]) == {"k": 1}
    assert rows["b"]["nested"] is None


def test_import_pyvdb_rejects_bad_magic(vdb, tmp_path):
    p = tmp_path / "bogus.bin"
    p.write_bytes(b"NOTDB" + b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        import_reference_binary(vdb, str(p), name="x")


def test_import_metadata_cannot_clobber_id_or_embedding(spark, vdb, tmp_path):
    """A metadata key literally named 'id' or 'embedding' must not
    override the row's identity/vector (ADVICE r2: metadata spreads
    FIRST so the real values win)."""
    vecs = {"real": np.array([1, 0], dtype=np.float32)}
    meta = {"real": {"id": "evil", "embedding": [9.0, 9.0], "tag": "t"}}
    src = tmp_path / "clobber"
    _write_reference_default_layout(src, vecs, meta)
    (src / "config.json").write_text(json.dumps({
        "name": "clobber", "dimensions": 2, "metric": "l2",
    }))
    coll = import_reference_collection(vdb, str(src), batch_size=10)
    rows = coll.get(["real"]).collect()
    assert len(rows) == 1 and rows[0]["tag"] == "t"
    assert [round(x) for x in rows[0]["embedding"]] == [1, 0]

    _write_pyvdb_binary(
        tmp_path / "c.bin", ["real"], [[0.0, 1.0]],
        {"real": {"id": "evil", "embedding": [9.0, 9.0]}}, dims=2,
    )
    coll2 = import_reference_binary(vdb, str(tmp_path / "c.bin"), name="cb")
    rows2 = coll2.get(["real"]).collect()
    assert len(rows2) == 1
    assert [round(x) for x in rows2[0]["embedding"]] == [0, 1]


# ---------------------------------------------------------------------------
# Round 4: graph.json / bm25_index.json / graph-vector bin importers
# (reference graph.py:540-582, hybrid_search.py:181-204,
# hybrid_graph_vector.py:537-616) — losslessness round trips.
# ---------------------------------------------------------------------------


def _write_reference_graph(d):
    import json

    data = {
        "nodes": [
            {"id": "a", "labels": ["Person"], "properties": {"age": 30, "city": "oslo"}},
            # property key colliding with a reserved column
            {"id": "b", "labels": ["Person", "Admin"], "properties": {"labels": "raw", "age": 41}},
            {"id": "c", "labels": [], "properties": {}},
        ],
        "edges": [
            {"id": "e1", "from": "a", "to": "b", "type": "KNOWS", "properties": {"since": 2019}},
            {"id": "e2", "from": "b", "to": "c", "type": "LIKES", "properties": {}},
        ],
        "hyperedges": [
            {"id": "h1", "nodes": ["a", "b", "c"], "type": "TEAM", "properties": {"name": "x"}},
        ],
    }
    (d / "graph.json").write_text(json.dumps(data))
    return data


def test_import_reference_graph_round_trip(spark, tmp_path):
    from fastpyvectordb_spark.graphs import load_graph
    from fastpyvectordb_spark.operators.graph import find_nodes, neighbors
    from fastpyvectordb_spark.sources import import_reference_graph

    _write_reference_graph(tmp_path)
    dest = str(tmp_path / "g")
    nodes, edges, hyper = import_reference_graph(spark, str(tmp_path), dest)

    got = {r["node_id"]: r.asDict() for r in nodes.collect()}
    assert set(got) == {"a", "b", "c"}
    assert got["a"]["labels"] == ["Person"] and got["a"]["age"] == 30
    assert got["b"]["prop_labels"] == "raw"  # collision prefixed
    assert got["c"]["age"] is None  # missing property -> NULL (F7 rule)
    e = {r["edge_id"]: r.asDict() for r in edges.collect()}
    assert e["e1"]["src"] == "a" and e["e1"]["dst"] == "b" and e["e1"]["since"] == 2019
    h = hyper.collect()[0]
    assert h["nodes"] == ["a", "b", "c"] and h["type"] == "TEAM"

    # persisted layout serves the graph operators
    n2, e2, h2 = load_graph(spark, dest)
    assert {r["node_id"] for r in find_nodes(n2, label="Person").collect()} == {"a", "b"}
    nb = neighbors(e2, "b").collect()
    assert {(r["neighbor_id"], r["direction"]) for r in nb} == {("c", "out"), ("a", "in")}
    assert h2.count() == 1


def test_import_reference_bm25(spark, tmp_path):
    import json

    from fastpyvectordb_spark.sources import import_reference_bm25

    data = {
        "docs": {"1": "spark shuffles data", "2": "spark joins tables"},
        "doc_lengths": {"1": 3, "2": 3},
        "avg_doc_length": 3.0,
        "total_docs": 2,
        "inverted_index": {
            "spark": {"1": 1, "2": 1},
            "shuffles": {"1": 1},
            "data": {"1": 1},
            "joins": {"2": 1},
            "tables": {"2": 1},
        },
        "config": {"k1": 1.7, "b": 0.6},
    }
    (tmp_path / "bm25_index.json").write_text(json.dumps(data))
    idx, cfg = import_reference_bm25(spark, str(tmp_path))
    assert cfg == {"k1": 1.7, "b": 0.6}
    assert idx.n_docs == 2 and idx.avgdl == 3.0
    posts = {(r["doc_id"], r["term"]): r["tf"] for r in idx.postings.collect()}
    assert posts[("1", "shuffles")] == 1 and len(posts) == 6
    lens = {r["doc_id"]: r["doc_len"] for r in idx.doc_lengths.collect()}
    assert lens == {"1": 3, "2": 3}
    # the imported index serves queries with the reference's constants
    top = idx.search("spark shuffles", k=2, k1=cfg["k1"], b=cfg["b"])
    rows = top.collect()
    assert rows and rows[0]["doc_id"] == "1"


def _write_reference_embeddings_bin(path, ids, mat):
    import pickle
    import struct

    import numpy as np

    with open(path, "wb") as f:
        f.write(struct.pack("II", len(ids), mat.shape[1]))
        id_bytes = pickle.dumps(list(ids))
        f.write(struct.pack("I", len(id_bytes)))
        f.write(id_bytes)
        if len(ids):
            np.asarray(mat, dtype=np.float32).tofile(f)


def test_import_reference_graph_embeddings(spark, vdb, tmp_path):
    import numpy as np

    from fastpyvectordb_spark.sources import import_reference_graph_embeddings

    nmat = np.arange(12, dtype=np.float32).reshape(3, 4)
    emat = np.ones((2, 4), dtype=np.float32) * 0.5
    _write_reference_embeddings_bin(tmp_path / "node_embeddings.bin", ["n1", "n2", "n3"], nmat)
    _write_reference_embeddings_bin(tmp_path / "edge_embeddings.bin", ["e1", "e2"], emat)
    out = import_reference_graph_embeddings(vdb, str(tmp_path))
    assert out["nodes"].count() == 3 and out["edges"].count() == 2
    got = out["nodes"].get(["n2"], include_vector=True).collect()[0]
    assert [float(x) for x in got["embedding"]] == [4.0, 5.0, 6.0, 7.0]
    # edge file absent -> None entry, nodes still import
    d2 = tmp_path / "only_nodes"
    d2.mkdir()
    _write_reference_embeddings_bin(d2 / "node_embeddings.bin", ["z"], np.zeros((1, 4), dtype=np.float32))
    out2 = import_reference_graph_embeddings(
        vdb, str(d2), node_collection="n2c", edge_collection="e2c"
    )
    assert out2["edges"] is None and out2["nodes"].count() == 1


def test_import_reference_mmap_store(spark, vdb, tmp_path):
    """Byte-layout round trip for the reference mmap store
    (parallel_search.py:441-555): 64-byte PYVEC001 header, over-
    allocated float32 region, ids.json / metadata.json sidecars."""
    import os

    from fastpyvectordb_spark.sources import import_reference_mmap

    src = tmp_path / "mmapstore"
    src.mkdir()
    dims, n, cap = 4, 3, 8  # over-allocated beyond n_vectors
    vecs = np.arange(n * dims, dtype=np.float32).reshape(n, dims)
    header = b"PYVEC001" + struct.pack("<III", 1, n, dims)
    header += b"\x00" * (64 - len(header))
    with open(src / "vectors.mmap", "wb") as f:
        f.write(header)
        f.write(vecs.tobytes())
        f.write(b"\x00" * ((cap - n) * dims * 4))  # pre-allocated tail
    # two named ids, one auto-named (reference appends vec_<idx>)
    with open(src / "ids.json", "w") as f:
        json.dump(["a", "b"], f)
    with open(src / "metadata.json", "w") as f:
        json.dump({"a": {"tag": "x"}}, f)

    c = import_reference_mmap(vdb, str(src), "frommmap")
    rows = {r["id"]: r for r in c.df().collect()}
    assert set(rows) == {"a", "b", "vec_2"}
    assert [round(x) for x in rows["a"]["embedding"]] == [0, 1, 2, 3]
    assert [round(x) for x in rows["vec_2"]["embedding"]] == [8, 9, 10, 11]
    assert rows["a"]["tag"] == "x" and rows["b"]["tag"] is None

    # bad magic rejected
    with open(src / "vectors.mmap", "r+b") as f:
        f.write(b"NOTPYVEC")
    with pytest.raises(ValueError, match="magic"):
        import_reference_mmap(vdb, str(src), "bad")


def test_import_reference_streaming_binary(spark, vdb, tmp_path):
    """Byte-layout round trip for StreamingBinaryWriter output
    (binary_persistence.py:212-275): header.json + ids.pkl +
    metadata.pkl + raw float32 vectors_stream.bin in id order."""
    from fastpyvectordb_spark.sources import import_reference_stream

    src = tmp_path / "streambin"
    src.mkdir()
    dims, n = 3, 5
    vecs = (np.arange(n * dims, dtype=np.float32) / 2).reshape(n, dims)
    with open(src / "vectors_stream.bin", "wb") as f:
        for row in vecs:  # exactly the writer's per-row tofile stream
            row.tofile(f)
    with open(src / "header.json", "w") as f:
        json.dump({"count": n, "dimensions": dims, "note": "cfg"}, f)
    with open(src / "ids.pkl", "wb") as f:
        pickle.dump([f"s{i}" for i in range(n)], f, protocol=pickle.HIGHEST_PROTOCOL)
    with open(src / "metadata.pkl", "wb") as f:
        pickle.dump({"s1": {"lang": "en"}}, f, protocol=pickle.HIGHEST_PROTOCOL)

    c = import_reference_stream(vdb, str(src), "fromstream", batch_size=2)
    rows = {r["id"]: r for r in c.df().collect()}
    assert set(rows) == {f"s{i}" for i in range(n)}
    assert [float(x) for x in rows["s0"]["embedding"]] == [0.0, 0.5, 1.0]
    assert rows["s1"]["lang"] == "en" and rows["s0"]["lang"] is None

    # truncated stream is a hard error, not silent short data
    with open(src / "vectors_stream.bin", "r+b") as f:
        f.truncate(n * dims * 4 - 8)
    with pytest.raises(ValueError, match="truncated"):
        import_reference_stream(vdb, str(src), "trunc")
