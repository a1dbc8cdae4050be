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
