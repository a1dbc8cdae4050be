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


def test_embedder_factory_and_cache(spark, tmp_path):
    """get_embedder_udf auto-detect lands on mock here; the cached
    embedding stage embeds misses once, then serves every repeat from
    the parquet cache with identical vectors."""
    from fastpyvectordb_spark.embeddings import (
        embed_column_cached,
        get_embedder_udf,
        mock_embed_batch,
    )
    import pandas as pd

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "id long, text string"
    )
    udf = get_embedder_udf("auto", dimensions=8)
    direct = df.withColumn("e", udf(F.col("text"))).collect()
    want = {
        r["id"]: [round(float(x), 5) for x in r["e"]] for r in direct
    }
    expected_alpha = [
        round(float(x), 5) for x in mock_embed_batch(pd.Series(["alpha"]), 8)[0]
    ]
    assert want[1] == expected_alpha == want[3]

    cache = str(tmp_path / "emb_cache")
    out1 = embed_column_cached(df, cache, dimensions=8).collect()
    got1 = {r["id"]: [round(float(x), 5) for x in r["embedding"]] for r in out1}
    assert got1 == want
    # second pass: all hits, no new cache rows beyond the 2 distinct texts
    out2 = embed_column_cached(df, cache, dimensions=8).collect()
    got2 = {r["id"]: [round(float(x), 5) for x in r["embedding"]] for r in out2}
    assert got2 == want
    n_cache = spark.read.parquet(cache).count()
    assert n_cache == 2, f"cache should hold 2 distinct texts, has {n_cache}"


def test_provider_embedders_feature_gated(spark):
    """Provider embedder UDFs execute for real only where their client
    lib + API key exist; in this sandbox the call raises
    NotImplementedError (plumbing still builds the UDF and plan). With
    the lib installed but no key, the error names the missing key."""
    import pytest

    from fastpyvectordb_spark.embeddings import (
        cohere_embedder_udf, openai_embedder_udf,
    )

    df = spark.createDataFrame([("hello",)], "text string")
    for udf in (openai_embedder_udf(), cohere_embedder_udf()):
        plan = df.withColumn("emb", udf(df.text))
        with pytest.raises(Exception, match="NotImplementedError|not installed|not set"):
            plan.collect()


def test_triangle_counts_hand_checked(spark):
    """K4 on {a,b,c,d} minus edge (c,d) has exactly two triangles
    (abc, abd); a/b sit in both, c/d in one. Directed duplicates and
    self-loops must not change the count."""
    from fastpyvectordb_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),          # duplicate reversed edge
            ("a", "c"), ("b", "c"),
            ("a", "d"), ("b", "d"),
            ("a", "a"),                       # self-loop ignored
        ],
        "src string, dst string",
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_pagerank_fixed_point_hand_checked(spark):
    """a→b, c→b, b→a for two iterations, worked by hand in exact
    micro-unit arithmetic."""
    from fastpyvectordb_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame(
        [("a", "b"), ("c", "b"), ("b", "a")], "src string, dst string"
    )
    out = {
        r["node"]: r["r"]
        for r in pagerank_fixed_point(edges, iters=2).collect()
    }
    # iter1: r=(1.0, 1.85, 0.15)e6; iter2 below
    assert out == {"a": 1_722_500, "b": 1_127_500, "c": 150_000}


def test_vector_search_edges_twin(spark):
    """Edge-embedding kNN twin of vector_search_nodes (VERDICT r9 #8):
    the reference stores edge embeddings (hybrid_graph_vector.py:
    235-247) but has no search over them — this pins our twin's
    ordering, type filter, and (src, dst, type) tie-break against a
    hand-computed cosine ranking."""
    from fastpyvectordb_spark.operators.graphvector import (
        vector_search_edges,
    )

    edges = spark.createDataFrame(
        [
            ("a", "b", "REL", [1.0, 0.0, 0.0]),
            ("b", "c", "REL", [0.9, 0.1, 0.0]),
            ("c", "d", "OTHER", [1.0, 0.0, 0.0]),
            ("a", "c", "REL", [0.0, 1.0, 0.0]),
            # exact duplicate embedding of (a, b, REL): similarity ties,
            # (src, dst, type) ordering must break it deterministically
            ("a", "z", "REL", [1.0, 0.0, 0.0]),
            # dst contains '#': the old src->dst#type concat key sorted
            # 'a->b##REL' BEFORE 'a->b#REL' ('#' < 'R'), inverting the
            # tuple order — pins the ADVICE-r10 fix to tuple tie-break
            ("a", "b#", "REL", [1.0, 0.0, 0.0]),
        ],
        "src string, dst string, type string, embedding array<float>",
    )
    q = [1.0, 0.0, 0.0]
    out = vector_search_edges(edges, q, k=5).collect()
    got = [(r["src"], r["dst"], r["type"]) for r in out]
    # ties at sim=1.0 break on the ACTUAL (src, dst, type) tuple:
    # (a,b) < (a,b#) < (a,z) < (c,d)
    assert got == [
        ("a", "b", "REL"),
        ("a", "b#", "REL"),
        ("a", "z", "REL"),
        ("c", "d", "OTHER"),
        ("b", "c", "REL"),
    ]
    assert out[0]["similarity"] == 1.0
    assert out[4]["similarity"] < 1.0

    typed = vector_search_edges(edges, q, k=4, edge_type="REL").collect()
    assert [(r["src"], r["dst"]) for r in typed] == [
        ("a", "b"), ("a", "b#"), ("a", "z"), ("b", "c")
    ]
