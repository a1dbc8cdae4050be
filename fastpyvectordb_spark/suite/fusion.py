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


BATCH_TEXTS = [
    "spark filter join stream table",
    "data pipeline quality",
    "vector index search",
]
_HB_VALUES = ", ".join(f"({i}, '{t}')" for i, t in enumerate(BATCH_TEXTS))
_HB_ALPHA = 0.5


def _fusion_batch_oracle() -> str:
    d = duckdb_distance("c.embedding", "q.qvec", "cosine")
    tok = "list_filter(string_split_regex(lower({0}), '[^a-z0-9_]+'), t -> t <> '')"
    return f"""
WITH corpus AS (
  SELECT d.doc_id AS doc_id, d.text AS text, e.embedding AS embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
queries AS (
  SELECT v.query_id, e.embedding AS qvec, v.qtext
  FROM (VALUES {_HB_VALUES}) AS v(query_id, qtext)
  JOIN embeddings e ON e.vec_id = v.query_id
),
vec_scored AS (
  SELECT q.query_id, c.doc_id, ROUND({d}, 6) AS dist
  FROM corpus c CROSS JOIN queries q
),
vec_top AS (
  SELECT query_id, doc_id, dist FROM vec_scored
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dist, doc_id) <= {FETCH_K}
),
vec_norm AS (
  SELECT query_id, doc_id,
         CASE WHEN MAX(dist) OVER (PARTITION BY query_id) > 0
              THEN 1.0 - dist / MAX(dist) OVER (PARTITION BY query_id)
              ELSE 1.0 END AS vector_score
  FROM vec_top
),
toks AS (
  SELECT doc_id, {tok.format('text')} AS tokens FROM corpus
),
doc_lengths AS (SELECT doc_id, len(tokens) AS doc_len FROM toks),
postings_tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(doc_len) AS DOUBLE) / COUNT(*) AS avgdl
  FROM doc_lengths
),
qterms AS (
  SELECT query_id, term, CAST(COUNT(*) AS BIGINT) AS qtf
  FROM (
    SELECT query_id, unnest({tok.format('qtext')}) AS term FROM queries
  )
  GROUP BY query_id, term
),
df_per_term AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM postings_tf
  WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY term
),
kw_scores AS (
  SELECT q.query_id, p.doc_id,
         SUM(
           q.qtf * ln((s.n_docs - d2.df + 0.5) / (d2.df + 0.5) + 1.0)
           * (p.tf * (1.5 + 1))
           / (p.tf + 1.5 * (1 - 0.75 + 0.75 * l.doc_len / s.avgdl))
         ) AS score
  FROM postings_tf p
  JOIN qterms q ON p.term = q.term
  JOIN df_per_term d2 ON p.term = d2.term
  JOIN doc_lengths l ON p.doc_id = l.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
kw_top AS (
  SELECT query_id, doc_id, ROUND(score, 6) AS score FROM kw_scores
  QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY ROUND(score, 6) DESC, doc_id
  ) <= {FETCH_K}
),
kw_norm AS (
  SELECT query_id, doc_id,
         CASE WHEN MAX(score) OVER (PARTITION BY query_id) > 0
              THEN score / MAX(score) OVER (PARTITION BY query_id)
              ELSE 0.0 END AS keyword_score
  FROM kw_top
),
fused AS (
  SELECT COALESCE(v.query_id, w.query_id) AS query_id,
         COALESCE(v.doc_id, w.doc_id) AS doc_id,
         ROUND({_HB_ALPHA} * COALESCE(v.vector_score, 0.0)
               + (1 - {_HB_ALPHA}) * COALESCE(w.keyword_score, 0.0), 6) AS score,
         ROUND(COALESCE(v.vector_score, 0.0), 6) AS vector_score,
         ROUND(COALESCE(w.keyword_score, 0.0), 6) AS keyword_score
  FROM vec_norm v
  FULL OUTER JOIN kw_norm w
    ON v.query_id = w.query_id AND v.doc_id = w.doc_id
)
SELECT query_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY score DESC, doc_id
       ) AS BIGINT) AS rank,
       doc_id, score, vector_score, keyword_score
FROM fused
QUALIFY rank <= {K}
ORDER BY query_id, rank
"""


@register("hybrid_search_batch", _fusion_batch_oracle())
def hybrid_search_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 batched: whole-query-batch fusion in one job — per-query k*5
    fetch each side, window max normalization, full-outer union,
    weighted sum (ref hybrid_search.py:360-477 applied per query)."""
    import pandas as pd

    from fastpyvectordb_spark.operators.fusion import hybrid_search_batch

    c = _corpus(spark, sf_dir)
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < len(BATCH_TEXTS))
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = {r["vec_id"]: list(r["embedding"]) for r in rows}
    qpdf = pd.DataFrame(
        {
            "query_id": range(len(BATCH_TEXTS)),
            "query_vec": [by_id[i] for i in range(len(BATCH_TEXTS))],
            "query_text": BATCH_TEXTS,
        }
    )
    res = hybrid_search_batch(c, qpdf, k=K, alpha=_HB_ALPHA)
    return res.select(
        "query_id", F.col("rank").cast("long").alias("rank"),
        "doc_id", "score", "vector_score", "keyword_score",
    ).orderBy("query_id", "rank")
