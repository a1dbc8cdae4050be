"""Parity extras: single insert (D1), coarse+rerank (K9), text
extraction (T6), graph persistence (S8), streaming parquet sink (S5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.catalog import VectorDB
from fastpyvectordb_spark.graphs import load_graph, save_graph
from fastpyvectordb_spark.operators.knn import coarse_then_rerank, knn
from fastpyvectordb_spark.operators.textanalysis import extract_text


def test_single_insert(spark, tmp_path):
    db = VectorDB(spark, str(tmp_path / "d1"))
    c = db.create_collection("one", dimensions=4)
    rid = c.insert([1.0, 2.0, 3.0, 4.0], id="a", metadata={"tag": "x"})
    assert rid == "a" and c.count() == 1
    row = c.get(["a"]).head()
    assert row["tag"] == "x" and list(row["embedding"]) == [1.0, 2.0, 3.0, 4.0]
    with pytest.raises(ValueError, match="duplicate id"):
        c.insert([1.0, 2.0, 3.0, 4.0], id="a")


def test_coarse_then_rerank_matches_exact_when_superset(embeddings):
    qvec = embeddings.filter(F.col("vec_id") == 0).head()["embedding"]
    exact = [r["vec_id"] for r in knn(embeddings, qvec, k=5).collect()]
    # a coarse stage that returns everything must rerank to the exact answer
    cands = embeddings.select("vec_id")
    got = [
        r["vec_id"]
        for r in coarse_then_rerank(embeddings, cands, qvec, k=5).collect()
    ]
    assert got == exact
    # a restricted candidate set restricts the output
    few = embeddings.filter(F.col("vec_id") < 50).select("vec_id")
    got2 = coarse_then_rerank(embeddings, few, qvec, k=5).collect()
    assert all(r["vec_id"] < 50 for r in got2)


def test_extract_text_concat(spark):
    df = spark.createDataFrame(
        [("a", "Title", None, "body"), ("b", None, "sub", "text")],
        "id string, title string, subtitle string, content string",
    )
    out = {r["id"]: r["text"] for r in extract_text(df, ["title", "subtitle", "content"]).collect()}
    assert out == {"a": "Title body", "b": "sub text"}


def test_graph_save_load_roundtrip(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("n1", ["A"], 1), ("n2", ["B"], 2)], "id string, labels array<string>, x int"
    )
    edges = spark.createDataFrame(
        [("e1", "n1", "n2", "REL")], "id string, src string, dst string, type string"
    )
    save_graph(str(tmp_path / "g"), nodes, edges)
    n2, e2, h2 = load_graph(spark, str(tmp_path / "g"))
    assert n2.count() == 2 and e2.count() == 1 and h2 is None
    assert {r["type"] for r in e2.collect()} == {"REL"}
    # typed edge read prunes by partition
    plan = e2.filter(F.col("type") == "REL")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_streaming_parquet_sink(spark, tmp_path, documents):
    from fastpyvectordb_spark.streaming.events import stream_from_parquet_dir

    src = str(tmp_path / "src")
    documents.limit(100).repartition(4).write.parquet(src)
    stream = stream_from_parquet_dir(spark, src)
    out = str(tmp_path / "sink")
    q = (
        stream.select("doc_id", "lang")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100
