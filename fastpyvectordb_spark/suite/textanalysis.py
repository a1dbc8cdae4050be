"""Text-analysis suite queries: language ID, quality scoring, token
counting, fingerprinting — all over ``documents``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators import textanalysis as T
from fastpyvectordb_spark.operators.textanalysis import STOPWORDS
from fastpyvectordb_spark.functions.text import tokenize
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _sw_count(lang: str) -> str:
    return (
        f"len(list_filter(toks, t -> list_contains({_sw_list(lang)}, t)))"
    )


# argmax with first-wins tie-break in the same lang order as the Spark
# expression (en, es, de, fr), then CJK override and zero-hit -> 'und'
_LANG_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS toks,
         regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS has_cjk
  FROM documents
),
counts AS (
  SELECT doc_id, has_cjk,
         {_sw_count("en")} AS c_en,
         {_sw_count("es")} AS c_es,
         {_sw_count("de")} AS c_de,
         {_sw_count("fr")} AS c_fr
  FROM t
)
SELECT doc_id,
       CASE WHEN has_cjk THEN 'zh'
            WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
            WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
            WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
            WHEN c_de >= c_fr THEN 'de'
            ELSE 'fr'
       END AS lang_pred
FROM counts
ORDER BY doc_id
"""


@register("text_lang_id", _LANG_ORACLE)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.lang_id_expr(F.col("text")).alias("lang_pred")
    ).orderBy("doc_id")


_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS mean_tok_len,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN {_sw_count("en")} / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS digit_ratio
  FROM t
)
SELECT doc_id, n_chars, n_tokens,
       ROUND(mean_tok_len, 6) AS mean_tok_len,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(digit_ratio, 6) AS digit_ratio,
       ROUND(
         (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000 THEN 1.0 ELSE 0.4 END) * 0.5
         + (1.0 - least(1.0, (punct_ratio + digit_ratio) * 2.0)) * 0.3
         + stop_ratio * 0.2, 6) AS quality_score
FROM m
ORDER BY doc_id
"""


@register("text_quality", _QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.quality_metrics(docs).orderBy("doc_id")


@register(
    "text_token_counts",
    r"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
       CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '')) AS BIGINT) AS wordish_tokens
FROM documents
ORDER BY doc_id
""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.token_counts(docs).orderBy("doc_id")


@register(
    "text_fingerprint",
    r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
ORDER BY doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.fingerprint(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# End-to-end training-data pipeline: quality filter → language ID →
# exact dedup (normalized-text fingerprint, keep lowest doc_id) →
# per-language corpus stats. Composes the gated operators above the way
# a 100 TB pre-training cleanup job would chain them; every stage is a
# single keyed shuffle. avg_quality uses the integer-micro trick so the
# aggregation order can't affect the hash (scores are already rounded
# to 6 decimals, so micro units are exact).
# --------------------------------------------------------------------------

_PIPE_THR = 0.81

_PIPELINE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS toks,
         regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS has_cjk
  FROM documents
),
counts AS (
  SELECT doc_id, has_cjk,
         {_sw_count("en")} AS c_en,
         {_sw_count("es")} AS c_es,
         {_sw_count("de")} AS c_de,
         {_sw_count("fr")} AS c_fr
  FROM t
),
lang AS (
  SELECT doc_id,
         CASE WHEN has_cjk THEN 'zh'
              WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
              WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
              WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
              WHEN c_de >= c_fr THEN 'de'
              ELSE 'fr'
         END AS lang_pred
  FROM counts
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN {_sw_count("en")} / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS digit_ratio
  FROM t
),
quality AS (
  SELECT doc_id, n_tokens,
         ROUND(
           (CASE WHEN n_tokens >= 10 AND n_tokens <= 5000 THEN 1.0 ELSE 0.4 END) * 0.5
           + (1.0 - least(1.0, (punct_ratio + digit_ratio) * 2.0)) * 0.3
           + stop_ratio * 0.2, 6) AS quality_score
  FROM m
),
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
),
kept AS (
  SELECT q.doc_id, l.lang_pred, q.n_tokens, q.quality_score, f.fingerprint
  FROM quality q
  JOIN lang l USING (doc_id)
  JOIN fp f USING (doc_id)
  WHERE q.quality_score >= {_PIPE_THR}
),
dedup AS (
  SELECT * FROM kept
  QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
)
SELECT lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(CAST(floor(quality_score * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000 / COUNT(*), 6) AS avg_quality
FROM dedup
GROUP BY lang_pred
ORDER BY lang_pred
"""


@register("pipeline_clean_corpus", _PIPELINE_ORACLE)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # every stage is a row-local expression, so the whole
    # quality→lang→fingerprint front of the pipeline fuses into ONE
    # projection over one scan (no per-stage joins: at 100 TB, three
    # scans plus two doc_id shuffles vs one codegen pass)
    exprs = T.quality_exprs(F.col("text"))
    kept = docs.select(
        "doc_id",
        exprs["n_tokens"].alias("n_tokens"),
        exprs["quality_score"].alias("quality_score"),
        T.lang_id_expr(F.col("text")).alias("lang_pred"),
        T.fingerprint_expr(F.col("text")).alias("fingerprint"),
    ).filter(F.col("quality_score") >= _PIPE_THR)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    dedup = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        dedup.groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum(
                    F.floor(F.col("quality_score") * 1000000 + 0.5).cast("long")
                ).cast("double")
                / 1000000
                / F.count("*"),
                6,
            ).alias("avg_quality"),
        )
        .orderBy("lang_pred")
    )


# Deterministic train/val/test split: pure-arithmetic hash of doc_id →
# identical assignment in any engine; counts per (split, token bucket)
_SPLIT_SQL = T.deterministic_split_sql("doc_id", {"train": 80, "val": 10, "test": 10})
_SPLIT_ORACLE = f"""
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                                t -> t <> ''))) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, text, {_SPLIT_SQL} AS split FROM documents)
GROUP BY split ORDER BY split
"""


@register("pipeline_split_counts", _SPLIT_ORACLE)
def pipeline_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 split of the corpus with per-split doc and
    token counts — the dataset-freeze step of a training pipeline. The
    assignment is a pure function of doc_id (stable across runs,
    engines, partitionings)."""
    docs = load_table(spark, sf_dir, "documents")
    split = T.deterministic_split_expr(
        F.col("doc_id"), {"train": 80, "val": 10, "test": 10}
    )
    return (
        docs.select(
            split.alias("split"),
            F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("split")
    )


# PII scrub audit: per-source counts of masked entities + total chars
# removed. duckdb regexp_replace(g) ≡ Spark regexp_replace (global).
_SCRUB_ORACLE = r"""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_email,
       CAST(SUM(len(regexp_extract_all(text, 'https?://[^\s]+'))) AS BIGINT) AS n_url,
       CAST(SUM(len(regexp_extract_all(text, '\+?\d[\d\s().-]{7,}\d'))) AS BIGINT) AS n_phone,
       CAST(SUM(length(text) - length(
         regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^\s]+', '<URL>', 'g'),
           '\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g')
       )) AS BIGINT) AS chars_removed
FROM documents
GROUP BY source ORDER BY source
"""


@register("text_scrub_audit", _SCRUB_ORACLE)
def text_scrub_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit per source: masked-entity counts and net chars
    removed by the scrubbing projection (T.scrub_pii_expr)."""
    docs = load_table(spark, sf_dir, "documents")
    stats = T.scrub_stats_exprs(F.col("text"))
    return (
        docs.select(
            "source",
            stats["n_email"].alias("e"),
            stats["n_url"].alias("u"),
            stats["n_phone"].alias("p"),
            (
                F.length("text") - F.length(T.scrub_pii_expr(F.col("text")))
            ).alias("removed"),
        )
        .groupBy("source")
        .agg(
            F.sum("e").alias("n_email"),
            F.sum("u").alias("n_url"),
            F.sum("p").alias("n_phone"),
            F.sum("removed").alias("chars_removed"),
        )
        .orderBy("source")
    )


@register(
    "text_repetition_filter",
    """
WITH _toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS t
  FROM documents
),
_grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN unnest(list_transform(range(1, len(t)),
                     i -> array_to_string(list_slice(t, i, i + 1), ' ')))
              ELSE array_to_string(t, ' ')
         END AS g
  FROM _toks
),
_per AS (SELECT doc_id, g, COUNT(*) AS c FROM _grams GROUP BY doc_id, g),
_doc AS (
  SELECT doc_id, SUM(c) AS n_grams, COUNT(*) AS n_distinct, MAX(c) AS top_c
  FROM _per GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       ROUND(1.0 - n_distinct / n_grams, 6) AS dup_gram_frac,
       ROUND(top_c / n_grams, 6) AS top_gram_frac,
       ((1.0 - n_distinct / n_grams) > 0.05 OR (top_c / n_grams) > 0.05)
         AS repetitive
FROM _doc
ORDER BY doc_id
""",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition rules: per-doc duplicate-2-gram and
    top-2-gram fractions with corpus-tuned flag thresholds."""
    from fastpyvectordb_spark.operators.textanalysis import repetition_metrics

    docs = load_table(spark, sf_dir, "documents")
    return repetition_metrics(
        docs, n=2, top_frac_threshold=0.05, dup_frac_threshold=0.05
    ).orderBy("doc_id")


_MIX_RATES = {"src0": 0.25, "src1": 0.5, "src2": 1.0}


@register(
    "pipeline_stratified_counts",
    f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN {T.stratified_keep_sql("doc_id", "source", _MIX_RATES, default_rate=0.1)}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents
GROUP BY source
ORDER BY source
""",
)
def pipeline_stratified_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture control: deterministic per-source sampling
    (src0@25%, src1@50%, src2@100%, everything else@10%) — per-source
    total vs kept counts. The keep decision is a pure projection (no
    rand(), no shuffle beyond the count agg); both engines assign
    identically."""
    docs = load_table(spark, sf_dir, "documents")
    keep = T.stratified_keep_expr(
        F.col("doc_id"), F.col("source"), _MIX_RATES, default_rate=0.1
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_token_budget",
    """
WITH tok AS (
  SELECT source, lang,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                         t -> t <> '')) AS n_tok
  FROM documents
)
SELECT source, lang,
       CAST(SUM(n_tok) AS BIGINT) AS tokens,
       CAST(COUNT(*) AS BIGINT) AS docs
FROM tok
GROUP BY source, lang
HAVING SUM(n_tok) > 300
ORDER BY tokens DESC, source, lang
""",
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget report (the mixture table every data recipe is
    written against): wordish tokens per (source, lang), largest cells
    first, floor-filtered."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "lang", F.size(tokenize(F.col("text"))).alias("n_tok")
    )
    return (
        toks.groupBy("source", "lang")
        .agg(
            F.sum("n_tok").cast("long").alias("tokens"),
            F.count(F.lit(1)).cast("long").alias("docs"),
        )
        .filter(F.col("tokens") > 300)
        .orderBy(F.desc("tokens"), "source", "lang")
    )


# ---------------------------------------------------------------------------
# Word-distribution entropy (perplexity-proxy quality signal): the 25
# most repetitive (lowest-entropy) docs = removal candidates.
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = f"""
WITH {T.duckdb_word_entropy_cte("documents").lstrip()}
SELECT doc_id, n_tokens, entropy
FROM entropy_stats
ORDER BY entropy, doc_id
LIMIT 25
"""


@register("text_word_entropy", _ENTROPY_ORACLE)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        T.word_entropy(docs)
        .orderBy("entropy", "doc_id")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Moore-Lewis data selection: score non-English docs by similarity to
# the English unigram LM — the 20 best candidates for the 'en' mixture.
# ---------------------------------------------------------------------------

_ML_ORACLE = f"""
WITH {T.duckdb_moore_lewis_cte("documents", "lang = 'en'").lstrip()}
SELECT doc_id, n_tokens, ml_score
FROM ml_scores
ORDER BY ml_score DESC, doc_id
LIMIT 20
"""


@register("text_moore_lewis_selection", _ML_ORACLE)
def text_moore_lewis_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        T.moore_lewis_scores(docs, in_domain=(F.col("lang") == "en"))
        .orderBy(F.desc("ml_score"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Sequence packing: concat-and-chunk layout stats per source stream
# (operators/packing.py). L = 512 tokens, whitespace tokenization.
# ---------------------------------------------------------------------------

_PACK_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
  FROM tok
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST((sum(n_tokens) + 511) // 512 AS BIGINT) AS n_seqs,
       CAST(count(*) FILTER (WHERE n_tokens > 0
            AND (start_tok + n_tokens - 1) // 512 > start_tok // 512)
            AS BIGINT) AS n_straddlers,
       CASE WHEN (sum(n_tokens) + 511) // 512 > 0
            THEN (CAST(sum(n_tokens) AS DOUBLE)
                  - ((sum(n_tokens) + 511) // 512 - 1) * 512) / 512.0
       END AS last_fill
FROM c GROUP BY source ORDER BY source
"""


@register("pipeline_pack_sequences", _PACK_ORACLE)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-sequence packing table: how many 512-token
    sequences each stream yields and how many documents straddle a
    sequence boundary. Window cumsum per stream (one shuffle on
    source); the single-stream global path is the two-pass prefix sum
    in operators/packing.py (parity-pinned in tests/test_packing.py)."""
    from fastpyvectordb_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(
        F.filter(F.split(F.col("text"), "\\s+"), lambda x: x != F.lit(""))
    ).cast("long")
    tok = docs.select("doc_id", "source", ws.alias("n_tokens"))
    packed = pack_sequences(
        tok, seq_len=512, tokens_col="n_tokens", stream_col="source"
    )
    return packing_stats(packed, seq_len=512, tokens_col="n_tokens").orderBy(
        "source"
    )


# ---------------------------------------------------------------------------
# Filter-funnel report: stagewise attrition for a C4/Gopher-style
# cleaning pipeline, one corpus scan (operators/textanalysis.py
# funnel_counts).
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = r"""
WITH p AS (
  SELECT length(text) >= 50 AS c1,
         length(text) <= 1500 AS c2,
         lang = 'en' AS c3,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) >= 20 AS c4,
         contains(' ' || text || ' ', ' the ') AS c5
  FROM documents
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(count(*) FILTER (c1) AS BIGINT) AS n1,
         CAST(count(*) FILTER (c1 AND c2) AS BIGINT) AS n2,
         CAST(count(*) FILTER (c1 AND c2 AND c3) AS BIGINT) AS n3,
         CAST(count(*) FILTER (c1 AND c2 AND c3 AND c4) AS BIGINT) AS n4,
         CAST(count(*) FILTER (c1 AND c2 AND c3 AND c4 AND c5) AS BIGINT) AS n5
  FROM p
)
SELECT * FROM (
  SELECT 1 AS stage_idx, 'min_50_chars' AS stage, n0 AS n_in, n1 AS n_out, n0 - n1 AS n_dropped FROM s
  UNION ALL SELECT 2, 'max_1500_chars', n1, n2, n1 - n2 FROM s
  UNION ALL SELECT 3, 'lang_en', n2, n3, n2 - n3 FROM s
  UNION ALL SELECT 4, 'min_20_ws_tokens', n3, n4, n3 - n4 FROM s
  UNION ALL SELECT 5, 'has_the', n4, n5, n4 - n5 FROM s
) ORDER BY stage_idx
"""


@register("pipeline_filter_funnel", _FUNNEL_ORACLE)
def pipeline_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    ws = F.size(F.filter(F.split(t, "\\s+"), lambda x: x != F.lit("")))
    stages = [
        ("min_50_chars", F.length(t) >= 50),
        ("max_1500_chars", F.length(t) <= 1500),
        ("lang_en", F.col("lang") == "en"),
        ("min_20_ws_tokens", ws >= 20),
        ("has_the", F.concat(F.lit(" "), t, F.lit(" ")).contains(" the ")),
    ]
    return T.funnel_counts(docs, stages).withColumn(
        "stage_idx", F.col("stage_idx").cast("int")
    ).orderBy("stage_idx")


# ---------------------------------------------------------------------------
# RAG chunking: fixed 512-char windows, 64-char overlap (step 448).
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = """
SELECT d.doc_id,
       CAST(g.k AS INT) AS chunk_idx,
       CAST(g.k * 448 AS BIGINT) AS start_char,
       substring(d.text, CAST(g.k * 448 + 1 AS INT), 512) AS chunk_text
FROM documents d,
     LATERAL (SELECT unnest(generate_series(
                0, CAST(floor((length(d.text) - 1) / 448.0) AS BIGINT)))
              AS k) g
WHERE length(d.text) > 0
ORDER BY d.doc_id, chunk_idx
"""


@register("pipeline_chunk_documents", _CHUNK_ORACLE)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.chunk_documents(
        docs, chunk_chars=512, overlap=64
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Mixture re-weighting (round 4): deterministic epoch-level up/down-
# sampling by source — floor(w) copies + Bernoulli(frac(w)) via the
# shared Knuth-hash bucket; weight 0 drops a source, absent sources
# pass through at 1. Aggregated per source so the oracle stays small
# while checking every per-row copy decision (counts are exact sums of
# the deterministic per-doc decisions).
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = {"src0": 2.5, "src1": 0.5, "src2": 0.0, "src3": 1.25}

_MIX_ORACLE = f"""
WITH copies AS (
  SELECT doc_id, source,
         {T.upsample_copies_sql(_MIX_WEIGHTS)} AS n_copies
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_copies) AS BIGINT) AS n_rows_out,
       CAST(SUM(CASE WHEN n_copies = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM copies
GROUP BY source
ORDER BY source
"""


@register("pipeline_upsample_mixture", _MIX_ORACLE)
def pipeline_upsample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    up = T.upsample_mixture(docs, _MIX_WEIGHTS)
    out_counts = up.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows_out"),
    )
    base = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    kept_docs = up.select("source", "doc_id").distinct().groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept_docs")
    )
    return (
        base.join(out_counts, "source", "left")
        .join(kept_docs, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_rows_out", F.lit(0)).alias("n_rows_out"),
            (F.col("n_docs") - F.coalesce("n_kept_docs", F.lit(0))).alias(
                "n_dropped"
            ),
        )
        .orderBy("source")
    )


# Per-source document cap (C4/RefinedWeb "max N docs per domain"):
# keep the 10 longest docs per source (ties by doc_id), report what
# survived. ROW_NUMBER is deterministic in both engines under the
# (n_chars DESC, doc_id) total order.
_CAP_ORACLE = """
WITH ranked AS (
  SELECT source, n_chars, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
         ) AS rn
  FROM documents
), base AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
)
SELECT b.source,
       b.n_docs,
       CAST(COUNT(r.doc_id) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(r.n_chars), 0) AS BIGINT) AS kept_chars
FROM base b
LEFT JOIN ranked r ON r.source = b.source AND r.rn <= 10
GROUP BY b.source, b.n_docs
ORDER BY b.source
"""


@register("pipeline_source_cap", _CAP_ORACLE)
def pipeline_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-cap retention report: cap each source at its 10 longest
    documents (``cap_per_group``), then per-source kept counts/chars —
    the skew-control step a web corpus applies before mixing."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    kept = T.cap_per_group(docs, group_col="source", cap=10)
    base = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    return (
        base.join(agg, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).alias("kept_chars"),
        )
        .orderBy("source")
    )
