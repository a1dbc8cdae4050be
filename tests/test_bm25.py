"""BM25 prebuilt-index lifecycle: the build-once/query-many index must
score identically to the one-shot pipeline, and survive a parquet
save/load round-trip (the persisted-derived-table story at scale)."""

from __future__ import annotations

import pytest

QUERY = "spark filter join stream table"


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.slow
def test_index_search_equals_oneshot(spark, documents):
    from fastpyvectordb_spark.operators.bm25 import BM25Index, bm25_search

    idx = BM25Index.build(documents)
    got = _rows(idx.search(QUERY, k=10))
    want = _rows(bm25_search(documents, QUERY, k=10))
    assert got == want
    assert len(got) == 10


@pytest.mark.slow
def test_index_save_load_round_trip(spark, documents, tmp_path):
    from fastpyvectordb_spark.operators.bm25 import BM25Index

    idx = BM25Index.build(documents)
    path = str(tmp_path / "bm25_index")
    idx.save(path)
    loaded = BM25Index.load(spark, path)
    assert loaded.n_docs == idx.n_docs
    assert abs(loaded.avgdl - idx.avgdl) < 1e-9
    assert _rows(loaded.search(QUERY, k=10)) == _rows(idx.search(QUERY, k=10))


@pytest.mark.slow
def test_index_multi_query_reuse(spark, documents):
    from fastpyvectordb_spark.operators.bm25 import BM25Index, bm25_search

    idx = BM25Index.build(documents)
    for q in ("data pipeline quality", "vector index search"):
        assert _rows(idx.search(q, k=5)) == _rows(
            bm25_search(documents, q, k=5)
        )


@pytest.mark.slow
def test_search_batch_equals_per_query(spark, documents):
    """One-job batched search must return, per query, exactly what the
    per-query path returns (same scores, same tie order, ranks 1..k)."""
    from fastpyvectordb_spark.operators.bm25 import BM25Index

    idx = BM25Index.build(documents)
    queries = [QUERY, "data pipeline quality", "vector index search",
               "graph traversal nodes"]
    got = idx.search_batch(queries, k=5).toPandas()
    for qid, q in enumerate(queries):
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert sub["rank"].tolist() == list(range(1, len(sub) + 1))
        assert [tuple(r) for r in sub[["doc_id", "score"]].to_numpy()] == _rows(
            idx.search(q, k=5)
        )


@pytest.mark.slow
def test_bm25_incremental_equals_rebuild(spark):
    """T2 add/remove_document parity: an index built on docs A then
    incrementally extended with docs B (and one built on A∪B minus the
    removed set) must score every query exactly like a fresh build on
    the same corpus — same (N, avgdl, df), same postings."""
    from pyspark.sql import functions as F

    from fastpyvectordb_spark.operators.bm25 import BM25Index
    from fastpyvectordb_spark.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") < 80)
    b = docs.filter((F.col("doc_id") >= 80) & (F.col("doc_id") < 120))

    inc = BM25Index.build(a).add_documents(b)
    full = BM25Index.build(docs.filter(F.col("doc_id") < 120))
    assert inc.n_docs == full.n_docs
    assert abs(inc.avgdl - full.avgdl) < 1e-9

    for q in ("data pipeline quality", "vector index search"):
        got = [tuple(r) for r in inc.search(q, k=10).collect()]
        want = [tuple(r) for r in full.search(q, k=10).collect()]
        assert got == want, q

    removed = inc.remove_documents(list(range(80, 120)))
    back = BM25Index.build(a)
    assert removed.n_docs == back.n_docs
    assert abs(removed.avgdl - back.avgdl) < 1e-9
    for q in ("data pipeline quality", "graph traversal nodes"):
        got = [tuple(r) for r in removed.search(q, k=10).collect()]
        want = [tuple(r) for r in back.search(q, k=10).collect()]
        assert got == want, q

    # duplicate add rejected
    import pytest

    with pytest.raises(ValueError, match="already indexed"):
        inc.add_documents(b)
