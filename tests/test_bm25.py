"""BM25 prebuilt-index lifecycle: the build-once/query-many index must
score identically to the one-shot pipeline, and survive a parquet
save/load round-trip (the persisted-derived-table story at scale)."""

from __future__ import annotations

QUERY = "spark filter join stream table"


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_index_search_equals_oneshot(spark, documents):
    from fastpyvectordb_spark.operators.bm25 import BM25Index, bm25_search

    idx = BM25Index.build(documents)
    got = _rows(idx.search(QUERY, k=10))
    want = _rows(bm25_search(documents, QUERY, k=10))
    assert got == want
    assert len(got) == 10


def test_index_save_load_round_trip(spark, documents, tmp_path):
    from fastpyvectordb_spark.operators.bm25 import BM25Index

    idx = BM25Index.build(documents)
    path = str(tmp_path / "bm25_index")
    idx.save(path)
    loaded = BM25Index.load(spark, path)
    assert loaded.n_docs == idx.n_docs
    assert abs(loaded.avgdl - idx.avgdl) < 1e-9
    assert _rows(loaded.search(QUERY, k=10)) == _rows(idx.search(QUERY, k=10))


def test_index_multi_query_reuse(spark, documents):
    from fastpyvectordb_spark.operators.bm25 import BM25Index, bm25_search

    idx = BM25Index.build(documents)
    for q in ("data pipeline quality", "vector index search"):
        assert _rows(idx.search(q, k=5)) == _rows(
            bm25_search(documents, q, k=5)
        )
