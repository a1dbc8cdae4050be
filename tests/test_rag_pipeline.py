"""End-to-end RAG ingestion: chunk → embed → index → retrieve.

Composes chunk_documents (operators/textanalysis.py), the mock
embedder (embeddings.py — deterministic, so retrieval is exact), the
Collection catalog, and the ChromaDB-style query() path into the full
pipeline a reference user runs. Pins that an exact-text query
retrieves its own chunk first (mock embeddings are injective per
text) and that chunk provenance (doc id, offset) survives the trip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.catalog import Collection, CollectionConfig
from fastpyvectordb_spark.embeddings import embed_column
from fastpyvectordb_spark.operators.textanalysis import chunk_documents

DIMS = 32


@pytest.fixture(scope="module")
def rag_collection(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [
            (1, "alpha " * 120),     # multi-chunk
            (2, "bravo " * 120),
            (3, "charlie delta echo unique payload sentence"),
        ],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_chars=256, overlap=32)
    embedded = embed_column(
        chunks, "chunk_text", out_col="embedding", dimensions=DIMS
    ).select(
        F.concat_ws("#", "doc_id", "chunk_idx").alias("id"),
        "embedding",
        F.col("doc_id").cast("string").alias("src_doc"),
        F.col("start_char").cast("string").alias("offset"),
        F.col("chunk_text").alias("_document"),
    )
    c = Collection(
        spark,
        str(tmp_path_factory.mktemp("rag") / "chunks"),
        CollectionConfig(dimensions=DIMS, n_buckets=4),
    )
    c.insert_batch(embedded)
    return c, {r["id"]: r for r in embedded.collect()}


def test_chunks_indexed_with_provenance(rag_collection):
    c, by_id = rag_collection
    assert c.count() == len(by_id) >= 5  # docs 1,2 multi-chunk


def test_exact_chunk_retrieval(rag_collection):
    c, by_id = rag_collection
    probe = by_id["3#0"]["_document"]
    out = c.query(query_texts=[probe], n_results=3)
    assert out["ids"][0][0] == "3#0"
    assert out["distances"][0][0] == pytest.approx(0.0, abs=1e-5)
    assert out["metadatas"][0][0]["src_doc"] == "3"
    assert out["documents"][0][0] == probe


def test_filtered_retrieval_by_source_doc(rag_collection):
    from fastpyvectordb_spark import filters as Flt

    c, by_id = rag_collection
    probe = by_id["1#0"]["_document"]
    out = c.query(
        query_texts=[probe], n_results=5, where=Flt.eq("src_doc", "2")
    )
    assert out["ids"][0]
    assert all(i.startswith("2#") for i in out["ids"][0])
