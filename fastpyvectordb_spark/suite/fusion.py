"""Hybrid vector+keyword fusion suite queries (SURVEY §2.7 H2-H4, J3).

Corpus = documents ⋈ embeddings on doc_id = vec_id (the driver's two
tables share the id space). Query vector = embedding of vec_id 0;
query text = the canonical suite query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.distances import duckdb_distance
from fastpyvectordb_spark.operators.bm25 import duckdb_bm25_scores_cte
from fastpyvectordb_spark.operators.fusion import hybrid_search
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table

QUERY = "spark filter join stream table"
K = 10
FETCH_K = K * 5


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )


def _fusion_oracle(alpha: float) -> str:
    d = duckdb_distance("c.embedding", "q.qvec", "cosine")
    return f"""
WITH corpus AS (
  SELECT d.doc_id AS doc_id, d.text AS text, e.embedding AS embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
vec_top AS (
  SELECT c.doc_id AS doc_id, ROUND({d}, 6) AS dist
  FROM corpus c CROSS JOIN q
  ORDER BY dist, doc_id
  LIMIT {FETCH_K}
),
vec_norm AS (
  SELECT doc_id,
         CASE WHEN MAX(dist) OVER () > 0 THEN 1.0 - dist / MAX(dist) OVER ()
              ELSE 1.0 END AS vector_score
  FROM vec_top
),
{duckdb_bm25_scores_cte(QUERY, table="corpus")},
kw_top AS (
  SELECT doc_id, ROUND(score, 6) AS score
  FROM bm25_scores
  ORDER BY score DESC, doc_id
  LIMIT {FETCH_K}
),
kw_norm AS (
  SELECT doc_id,
         CASE WHEN MAX(score) OVER () > 0 THEN score / MAX(score) OVER ()
              ELSE 0.0 END AS keyword_score
  FROM kw_top
),
fused AS (
  SELECT COALESCE(v.doc_id, w.doc_id) AS doc_id,
         COALESCE(v.vector_score, 0.0) AS vector_score,
         COALESCE(w.keyword_score, 0.0) AS keyword_score
  FROM vec_norm v FULL OUTER JOIN kw_norm w ON v.doc_id = w.doc_id
)
SELECT doc_id,
       ROUND({alpha} * vector_score + (1 - {alpha}) * keyword_score, 6) AS score,
       ROUND(vector_score, 6) AS vector_score,
       ROUND(keyword_score, 6) AS keyword_score
FROM fused
ORDER BY score DESC, doc_id
LIMIT {K}
"""


@register("hybrid_search_alpha05", _fusion_oracle(0.5))
def hybrid_search_alpha05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2: balanced fusion (ref hybrid_search.py:360-477)."""
    c = _corpus(spark, sf_dir)
    qv = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    )
    return hybrid_search(c, qv, QUERY, k=K, alpha=0.5)


@register("hybrid_search_alpha08", _fusion_oracle(0.8))
def hybrid_search_alpha08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2/H3: vector-weighted fusion (alpha sweep per test_comprehensive
    suite 5)."""
    c = _corpus(spark, sf_dir)
    qv = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    )
    return hybrid_search(c, qv, QUERY, k=K, alpha=0.8)
