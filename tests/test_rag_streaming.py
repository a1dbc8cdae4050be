"""Continuous RAG ingestion: a real readStream of documents chunked,
mock-embedded, and appended into a Collection via foreachBatch —
the streaming face of the batch pipeline in test_rag_pipeline.py.
Exactly-once at this layer comes from the collection's snapshot
commits (each micro-batch is one atomic append commit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.catalog import Collection, CollectionConfig
from fastpyvectordb_spark.embeddings import embed_column
from fastpyvectordb_spark.operators.textanalysis import chunk_documents

DIMS = 16


@pytest.mark.slow
def test_streaming_chunk_embed_ingest(spark, tmp_path):
    from fastpyvectordb_spark.streaming.events import stream_from_parquet_dir

    src = tmp_path / "incoming"
    docs = spark.createDataFrame(
        [(i, f"doc number {i} " * 40) for i in range(20)],
        "doc_id long, text string",
    )
    # two source files -> at maxFilesPerTrigger=1 this is >=2 micro-batches
    docs.filter("doc_id < 10").coalesce(1).write.parquet(str(src))
    docs.filter("doc_id >= 10").coalesce(1).write.mode("append").parquet(
        str(src)
    )

    coll = Collection(
        spark, str(tmp_path / "chunks"),
        CollectionConfig(dimensions=DIMS, n_buckets=4),
    )

    def ingest(batch_df, batch_id):
        chunks = chunk_documents(batch_df, chunk_chars=256, overlap=32)
        embedded = embed_column(
            chunks, "chunk_text", dimensions=DIMS
        ).select(
            F.concat_ws("#", "doc_id", "chunk_idx").alias("id"),
            "embedding",
            F.col("doc_id").cast("string").alias("src_doc"),
        )
        coll.insert_batch(embedded)

    stream = stream_from_parquet_dir(
        spark, str(src), max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    # every doc produced chunks; ids unique across micro-batches
    got = coll.df().select("id", "src_doc").collect()
    assert len(got) == len({r["id"] for r in got})
    assert {r["src_doc"] for r in got} == {str(i) for i in range(20)}
    # retrieval works over the streamed-in chunks
    out = coll.query(query_texts=["doc number 7 " * 40][:1], n_results=1)
    assert out["ids"][0]
