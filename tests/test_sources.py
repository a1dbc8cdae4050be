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
