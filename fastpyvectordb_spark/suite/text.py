"""BM25 / text-index suite queries (SURVEY §2.6 T1-T5, §2.7 H1).

Corpus: the driver's ``documents`` table (doc_id, text, lang, source,
n_chars). Canonical query string below uses the synthetic corpus
vocabulary so it has non-trivial hit sets at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.text import tokenize
from fastpyvectordb_spark.operators.bm25 import (
    bm25_search,
    build_postings,
    duckdb_bm25_scores_cte,
)
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table

QUERY = "spark filter join stream table"
K = 10


_BM25_ORACLE = f"""
WITH {duckdb_bm25_scores_cte(QUERY)}
SELECT doc_id, ROUND(score, 6) AS score
FROM bm25_scores
ORDER BY score DESC, doc_id
LIMIT {K}
"""


@register("bm25_search", _BM25_ORACLE)
def bm25_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/H1: BM25 top-k keyword search (ref hybrid_search.py:156-179)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_search(docs, QUERY, k=K)


_POSTINGS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS tokens
  FROM documents
),
postings AS (
  SELECT doc_id, unnest(tokens) AS term FROM toks
)
SELECT term,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS total_tf
FROM postings
GROUP BY term
ORDER BY total_tf DESC, term
LIMIT 20
"""


@register("text_postings_top_terms", _POSTINGS_ORACLE)
def text_postings_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T2: tokenizer + inverted-index build; top terms by frequency."""
    docs = load_table(spark, sf_dir, "documents")
    postings, _ = build_postings(docs)
    return (
        postings.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.sum("tf").alias("total_tf"),
        )
        .orderBy(F.desc("total_tf"), "term")
        .limit(20)
    )


_DOCSTATS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS tokens
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(tokens)) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(len(tokens)) AS DOUBLE) / COUNT(*), 6) AS avgdl
FROM toks
"""


@register("text_corpus_stats", _DOCSTATS_ORACLE)
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: BM25 corpus statistics (N, total tokens, avgdl)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokenize(F.col("text")).alias("tokens"))
    return toks.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("tokens")).alias("total_tokens"),
        F.round(
            F.sum(F.size("tokens")).cast("double") / F.count("*"), 6
        ).alias("avgdl"),
    )


BATCH_QUERIES = [
    "spark filter join stream table",
    "data pipeline quality",
    "vector index search",
]
_BQ_VALUES = ", ".join(
    f"({i}, '{q}')" for i, q in enumerate(BATCH_QUERIES)
)

_BM25_BATCH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS tokens
  FROM documents
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
queries(query_id, qtext) AS (VALUES {_BQ_VALUES}),
qterms AS (
  SELECT query_id, term, CAST(COUNT(*) AS BIGINT) AS qtf
  FROM (
    SELECT query_id,
           unnest(list_filter(string_split_regex(lower(qtext), '[^a-z0-9_]+'), t -> t <> '')) AS term
    FROM queries
  )
  GROUP BY query_id, term
),
df_per_term AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM postings_tf
  WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY term
),
scores AS (
  SELECT q.query_id, p.doc_id,
         SUM(
           q.qtf * ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * (1.5 + 1))
           / (p.tf + 1.5 * (1 - 0.75 + 0.75 * l.doc_len / s.avgdl))
         ) AS score
  FROM postings_tf p
  JOIN qterms q ON p.term = q.term
  JOIN df_per_term d ON p.term = d.term
  JOIN doc_lengths l ON p.doc_id = l.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
)
SELECT query_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY ROUND(score, 6) DESC, doc_id
       ) AS BIGINT) AS rank,
       doc_id,
       ROUND(score, 6) AS score
FROM scores
QUALIFY rank <= {K}
ORDER BY query_id, rank
"""


@register("bm25_search_batch", _BM25_BATCH_ORACLE)
def bm25_search_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 batched: whole-query-batch BM25 in one job (broadcast query
    terms, one postings join, per-query window top-k). Same formula as
    bm25_search, amortizing the per-action floor across the batch."""
    from fastpyvectordb_spark.operators.bm25 import BM25Index

    docs = load_table(spark, sf_dir, "documents")
    idx = BM25Index.build(docs)
    res = idx.search_batch(BATCH_QUERIES, k=K)
    return res.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score"
    ).orderBy("query_id", "rank")
