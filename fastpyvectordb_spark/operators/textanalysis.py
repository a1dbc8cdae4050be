"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure codegen expressions (no Python UDFs) with DuckDB oracle twins,
designed so a 100 TB corpus pays one projection scan per metric set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.text import tokenize

# small, fixed stopword lists per language (heuristic n-gram/stopword
# language ID — the classic cheap approach)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}


def _count_tokens_in(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(words)))


def lang_id_expr(text: Column) -> Column:
    """Predicted language: CJK-character presence → 'zh'; else argmax
    of per-language stopword hits — first language in STOPWORDS order
    wins ties (the suite oracle codifies first-wins); zero hits →
    'und'."""
    tokens = tokenize(text)
    counts = [
        (lang, _count_tokens_in(tokens, words)) for lang, words in STOPWORDS.items()
    ]
    best = None
    best_lang = F.lit("und")
    for lang, cnt in counts:
        if best is None:
            best = cnt
            best_lang = F.when(cnt > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when(cnt > best, F.lit(lang)).otherwise(best_lang)
            best = F.greatest(cnt, best)
    has_cjk = text.rlike("[\\u4e00-\\u9fff]")
    return F.when(has_cjk, F.lit("zh")).otherwise(best_lang)


def quality_exprs(t: Column) -> dict[str, Column]:
    """The quality signals as named column expressions — all row-local,
    so callers can fuse them with other per-row stages (lang-id,
    fingerprint) into a single projection/scan instead of joining
    per-stage DataFrames back together (one pass over 100 TB, not
    three plus two shuffles)."""
    tokens = tokenize(t)
    n_chars = F.length(t)
    n_tokens = F.size(tokens)
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(
            tokens, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
        )
        / n_tokens,
    ).otherwise(F.lit(0.0))
    n_punct = F.length(F.regexp_replace(t, "[^.,;:!?'\"()\\[\\]{}-]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars.cast("double")).otherwise(0.0)
    n_digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    digit_ratio = F.when(n_chars > 0, n_digits / n_chars.cast("double")).otherwise(0.0)
    en_stop = _count_tokens_in(tokens, STOPWORDS["en"])
    stop_ratio = F.when(
        n_tokens > 0, en_stop / n_tokens.cast("double")
    ).otherwise(0.0)
    # composite score: length sweet-spot + low punct/digit noise +
    # nonzero stopword presence (C4/Gopher-style cheap quality rules)
    length_ok = F.when((n_tokens >= 10) & (n_tokens <= 5000), 1.0).otherwise(0.4)
    noise_ok = F.lit(1.0) - F.least(
        F.lit(1.0), (punct_ratio + digit_ratio) * F.lit(2.0)
    )
    score = F.round(length_ok * 0.5 + noise_ok * 0.3 + stop_ratio * 0.2, 6)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_tok_len": F.round(mean_tok_len, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "stop_ratio": F.round(stop_ratio, 6),
        "digit_ratio": F.round(digit_ratio, 6),
        "quality_score": score,
    }


def quality_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality signals: n_chars, n_tokens, mean token length,
    punctuation ratio, stopword ratio, digit ratio, and a composite
    quality score in [0,1]."""
    exprs = quality_exprs(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(name) for name, c in exprs.items()],
    )


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace-split count and wordish-regex (BPE-ish pre-tokenizer)
    count per doc."""
    t = F.col(text_col)
    ws = F.size(
        F.filter(F.split(t, "\\s+"), lambda x: x != F.lit(""))
    )
    wordish = F.size(tokenize(t))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        wordish.cast("long").alias("wordish_tokens"),
    )


def extract_text(docs: DataFrame, fields: list[str], out_col: str = "text") -> DataFrame:
    """T6 (ref hybrid_search.py:266-281): concatenate the string fields
    used for indexing into one text column (space-joined, nulls
    skipped)."""
    return docs.withColumn(out_col, F.concat_ws(" ", *[F.col(f) for f in fields]))


def fingerprint_expr(text: Column) -> Column:
    """md5 over lowercased, whitespace-collapsed text — the
    exact-dedup/content-address key, as a fusable expression."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), "\\s+", " ")))


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Normalized content fingerprint: md5 over lowercased,
    whitespace-collapsed text — the exact-dedup/content-address key."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_expr(F.col(text_col)).alias("fingerprint"),
    )


def deterministic_split_expr(
    id_col: Column, weights: dict[str, int], salt: int = 42
) -> Column:
    """Deterministic dataset split (train/val/test) from the row id —
    the reproducibility contract a training pipeline needs: the split
    is a pure function of (id, salt), stable across runs, engines, and
    partitionings (no rand()). Knuth multiplicative hash mod 100;
    ``weights`` maps split name → percent (must sum to 100).

    Pure integer arithmetic so any SQL engine computes the identical
    assignment (cross-engine oracle-checkable, unlike xxhash64).
    """
    if sum(weights.values()) != 100:
        raise ValueError(f"weights must sum to 100: {weights}")
    # overflow-free Knuth-hash bucket — the ONE shared implementation
    # (_det_bucket_expr); duplicating this trickiest arithmetic would
    # mean any future fix must land in four places or the twins diverge
    bucket = _det_bucket_expr(id_col, salt, 100)
    expr = None
    lo = 0
    for name, pct in weights.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return expr


def deterministic_split_sql(
    id_sql: str, weights: dict[str, int], salt: int = 42
) -> str:
    """DuckDB twin of :func:`deterministic_split_expr` (same arithmetic,
    same bucket boundaries, same overflow-free 16-bit-split product —
    via the shared ``_det_bucket_sql``)."""
    bucket = _det_bucket_sql(id_sql, salt, 100)
    cases = []
    lo = 0
    for name, pct in weights.items():
        cases.append(f"WHEN {bucket} >= {lo} AND {bucket} < {lo + pct} THEN '{name}'")
        lo += pct
    return "CASE " + " ".join(cases) + " END"


# PII/content scrubbing patterns (order matters: URLs before emails
# would eat mailto:, so emails go first; all are RE2-safe)
_SCRUB_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def scrub_pii_expr(text: Column) -> Column:
    """Mask emails, URLs, and phone-shaped digit runs — the standard
    pre-training content filter, as chained ``regexp_replace`` (pure
    codegen; at 100 TB this is a projection, no shuffle)."""
    out = text
    for _, pat, repl in _SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_stats_exprs(text: Column) -> dict[str, Column]:
    """Per-doc counts of each PII class (for corpus audit reports)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for name, pat, _ in _SCRUB_PATTERNS
    }


# ---------------------------------------------------------------------------
# Repetition filtering (Gopher, Rae et al. 2021 Table A1): per-doc
# duplicate n-gram fraction and top n-gram fraction — the workhorse
# quality rules for web-scale corpus cleaning.
# ---------------------------------------------------------------------------

def repetition_metrics(
    docs,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_frac_threshold: float = 0.04,
    dup_frac_threshold: float = 0.55,
    round_digits: int = 6,
):
    """Per-doc word n-gram repetition statistics →
    (doc_id, n_grams, dup_gram_frac, top_gram_frac, repetitive).

    ``dup_gram_frac`` = 1 − distinct/total n-grams;
    ``top_gram_frac`` = occurrences of the most frequent n-gram / total.
    One explode + one two-level aggregation, both keyed on doc_id —
    shuffles hashes, never gram strings (the shingle-hash trick from
    dedup). Thresholds follow Gopher's shape; exact values are corpus
    knobs."""
    from pyspark.sql import DataFrame, functions as F

    from fastpyvectordb_spark.functions.text import tokenize

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("t")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda i: F.array_join(F.slice(F.col("t"), i, n), " "),
                ),
            ).otherwise(F.array(F.array_join(F.col("t"), " "))),
        ).alias("g"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long").alias("gh"),
    )
    per_gram = grams.groupBy("doc_id", "gh").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    dup = F.lit(1.0) - F.col("n_distinct") / F.col("n_grams")
    top = F.col("top_c") / F.col("n_grams")
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.round(dup, round_digits).alias("dup_gram_frac"),
        F.round(top, round_digits).alias("top_gram_frac"),
        (
            (dup > dup_frac_threshold) | (top > top_frac_threshold)
        ).alias("repetitive"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling — training-mixture control (the
# "domain weights" step of every corpus recipe: sample source s at
# rate r_s). Same overflow-free integer hash as the split operator, so
# the kept set is a pure function of (id, salt) and identical across
# engines, runs, and partitionings.
# ---------------------------------------------------------------------------

def _det_bucket_expr(id_col: Column, salt: int, mod: int) -> Column:
    a = F.pmod(id_col.cast("bigint") + F.lit(salt), F.lit(2**32))
    hi = F.floor(a / F.lit(65536))
    lo = a % F.lit(65536)
    prod_mod = F.pmod(
        lo * F.lit(2654435761)
        + F.pmod(hi * F.lit(2654435761), F.lit(65536)) * F.lit(65536),
        F.lit(2**32),
    )
    return prod_mod % mod


def _det_bucket_sql(id_sql: str, salt: int, mod: int) -> str:
    a = f"((({id_sql} + {salt}) % 4294967296 + 4294967296) % 4294967296)"
    hi = f"CAST(FLOOR({a} / 65536) AS BIGINT)"
    lo = f"({a} % 65536)"
    prod = (
        f"(({lo} * 2654435761 + (({hi} * 2654435761) % 65536) * 65536)"
        f" % 4294967296)"
    )
    return f"({prod} % {mod})"


def stratified_keep_expr(
    id_col: Column,
    key_col: Column,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: int = 7,
) -> Column:
    """True iff the row survives sampling at its key's rate (rates are
    per-key keep fractions in [0, 1]; resolution 1/10000). A pure
    projection — no shuffle, no rand(), re-runnable anywhere."""
    bucket = _det_bucket_expr(id_col, salt, 10_000)
    expr = None
    for key, rate in rates.items():
        cond = key_col == F.lit(key)
        keep = bucket < F.lit(int(round(rate * 10_000)))
        expr = F.when(cond, keep) if expr is None else expr.when(cond, keep)
    fallback = bucket < F.lit(int(round(default_rate * 10_000)))
    return expr.otherwise(fallback) if expr is not None else fallback


def stratified_keep_sql(
    id_sql: str,
    key_sql: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: int = 7,
) -> str:
    """DuckDB twin of :func:`stratified_keep_expr`."""
    bucket = _det_bucket_sql(id_sql, salt, 10_000)
    cases = [
        f"WHEN {key_sql} = '{k}' THEN {bucket} < {int(round(r * 10_000))}"
        for k, r in rates.items()
    ]
    fallback = f"{bucket} < {int(round(default_rate * 10_000))}"
    if not cases:
        return fallback
    return "CASE " + " ".join(cases) + f" ELSE {fallback} END"


# ---------------------------------------------------------------------------
# Word-distribution entropy — a perplexity-proxy quality signal
# (low-entropy docs are repetitive/templated; cf. Gopher's repetition
# rules and CCNet's LM-perplexity filter, which this approximates
# without a model).  Pure keyed aggregation: one groupBy on
# (doc_id, word) with map-side combine, then one per-doc fold.
# ---------------------------------------------------------------------------

def word_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc Shannon entropy (nats) of the word distribution →
    (doc_id, n_tokens BIGINT, entropy DOUBLE rounded to 6).

    Cross-engine determinism: the per-doc fold runs over word counts
    sorted by word, accumulated sequentially in doubles — the same
    left-to-right ``list_sum(list_transform(...))`` shape the DuckDB
    twin uses (FIXTURES.md §6), so both engines see an identical
    float-addition order."""
    counts = (
        docs.select(
            F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("t")
        )
        .select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.array_sort(F.collect_list(F.struct("w", "c"))).alias("cs"),
    )
    tot = F.col("n_tokens").cast("double")
    ent = -F.aggregate(
        F.col("cs"),
        F.lit(0.0),
        lambda acc, s: acc + (s["c"].cast("double") / tot)
        * F.log(s["c"].cast("double") / tot),
    )
    return per.select(
        "doc_id", "n_tokens", F.round(ent, 6).alias("entropy")
    )


def duckdb_word_entropy_cte(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """CTE ``entropy_stats(doc_id, n_tokens, entropy)`` — the identical
    sorted sequential fold in DuckDB."""
    return f"""
_etoks AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(string_split_regex(lower({text_col}), '[^a-z0-9_]+'), t -> t <> '')) AS w
  FROM {table}
),
_ecounts AS (
  SELECT doc_id, w, count(*) AS c FROM _etoks GROUP BY doc_id, w
),
_elists AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         list(CAST(c AS DOUBLE) ORDER BY w) AS cs
  FROM _ecounts GROUP BY doc_id
),
entropy_stats AS (
  SELECT doc_id, n_tokens,
         round(-list_sum(list_transform(cs,
             c -> (c / n_tokens) * ln(c / n_tokens))), 6) AS entropy
  FROM _elists
)"""


# ---------------------------------------------------------------------------
# Moore-Lewis cross-entropy-difference selection (Moore & Lewis 2010,
# "Intelligent Selection of Language Model Training Data") — score each
# out-of-domain document by how in-domain its unigram distribution
# looks: score(d) = (1/|d|) Σ_w c_dw · [ln p_in(w) − ln p_out(w)],
# add-one smoothed. High score = keep for the target mixture.
# ---------------------------------------------------------------------------

def moore_lewis_scores(
    docs: DataFrame,
    in_domain: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_tokens, ml_score) for documents NOT matching
    ``in_domain`` (the selection candidates), scored against the
    unigram LM of the matching ones.

    Determinism: all probabilities are exact integer-count ratios
    (add-one smoothing over corpus vocabulary V), each word's
    log-ratio is a single ``ln`` of a ratio of exact-in-double int64
    products, and the per-doc sum folds over words in sorted order —
    the FIXTURES.md §6 discipline, extended to a three-way join of
    count tables.

    Scale shape: two corpus-wide word-count aggregations (map-side
    combinable, 8-byte-ish keys), scalar totals broadcast as one-row
    joins, then one equi-join per candidate-doc word. No all-pairs
    anything; the LM tables shuffle once each.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        in_domain.alias("_in"),
        F.explode(tokenize(F.col(text_col))).alias("w"),
    )
    all_counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c_all"))
    in_counts = (
        toks.filter(F.col("_in"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_in"))
    )
    totals = all_counts.agg(
        F.sum("c_all").alias("n_all"),
        F.count(F.lit(1)).alias("v"),
    ).crossJoin(
        toks.filter(F.col("_in")).agg(F.count(F.lit(1)).alias("n_in"))
    )
    doc_counts = (
        toks.filter(~F.col("_in"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c_dw"))
    )
    joined = (
        doc_counts.join(all_counts, "w")
        .join(in_counts, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "w",
            "c_dw",
            # ln(p_in/p_out) = ln( (c_in+1)(n_all+V) / (n_in+V)(c_all+1) )
            # — each FACTOR cast to double BEFORE multiplying: at
            # corpus scale (c_in+1)·(n_all+V) passes int64, where
            # Spark wraps silently and DuckDB raises (divergence). The
            # same double products round identically in both engines.
            F.log(
                (
                    (F.coalesce(F.col("c_in"), F.lit(0)) + 1).cast("double")
                    * (F.col("n_all") + F.col("v")).cast("double")
                )
                / (
                    (F.col("n_in") + F.col("v")).cast("double")
                    * (F.col("c_all") + 1).cast("double")
                )
            ).alias("term"),
        )
    )
    per = joined.groupBy("doc_id").agg(
        F.sum("c_dw").alias("n_tokens"),
        F.array_sort(F.collect_list(F.struct("w", "c_dw", "term"))).alias("ts"),
    )
    score = F.aggregate(
        F.col("ts"),
        F.lit(0.0),
        lambda acc, s: acc + s["c_dw"].cast("double") * s["term"],
    ) / F.col("n_tokens").cast("double")
    return per.select(
        "doc_id", "n_tokens", F.round(score, 6).alias("ml_score")
    )


def duckdb_moore_lewis_cte(
    table: str,
    in_domain_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """CTE ``ml_scores(doc_id, n_tokens, ml_score)`` — the identical
    add-one-smoothed log-ratio scoring in DuckDB."""
    return f"""
_mtoks AS (
  SELECT {id_col} AS doc_id, ({in_domain_sql}) AS _in,
         unnest(list_filter(string_split_regex(lower({text_col}), '[^a-z0-9_]+'), t -> t <> '')) AS w
  FROM {table}
),
_mall AS (SELECT w, count(*) AS c_all FROM _mtoks GROUP BY w),
_min AS (SELECT w, count(*) AS c_in FROM _mtoks WHERE _in GROUP BY w),
_mtot AS (
  SELECT (SELECT CAST(sum(c_all) AS BIGINT) FROM _mall) AS n_all,
         (SELECT CAST(count(*) AS BIGINT) FROM _mall) AS v,
         (SELECT CAST(count(*) AS BIGINT) FROM _mtoks WHERE _in) AS n_in
),
_mdoc AS (
  SELECT doc_id, w, count(*) AS c_dw FROM _mtoks WHERE NOT _in GROUP BY doc_id, w
),
_mterms AS (
  SELECT d.doc_id, d.w, d.c_dw,
         ln((CAST(COALESCE(i.c_in, 0) + 1 AS DOUBLE)
             * CAST(t.n_all + t.v AS DOUBLE))
            / (CAST(t.n_in + t.v AS DOUBLE)
               * CAST(a.c_all + 1 AS DOUBLE))) AS term
  FROM _mdoc d
  JOIN _mall a ON d.w = a.w
  LEFT JOIN _min i ON d.w = i.w
  CROSS JOIN _mtot t
),
_mlists AS (
  SELECT doc_id,
         CAST(sum(c_dw) AS BIGINT) AS n_tokens,
         list(CAST(c_dw AS DOUBLE) * term ORDER BY w) AS ts
  FROM _mterms GROUP BY doc_id
),
ml_scores AS (
  SELECT doc_id, n_tokens,
         round(list_sum(ts) / n_tokens, 6) AS ml_score
  FROM _mlists
)"""


# ---------------------------------------------------------------------------
# Filter-funnel report: stagewise survivor counts for a cleaning
# pipeline, in ONE scan (no reference twin — LLM-pipeline
# observability; the attrition table every data-cleaning run reports).
# ---------------------------------------------------------------------------


def funnel_counts(
    docs: DataFrame, stages: list[tuple[str, Column]]
) -> DataFrame:
    """Cumulative filter funnel: stage k's survivors satisfy stages
    1..k. All counts come from a single aggregate pass (conditional
    sums — no per-stage scan, no shuffle beyond the final 1-row agg);
    the one row then unpivots to (stage_idx, stage, n_in, n_out,
    n_dropped) via an inline explode. 100 TB cost = one corpus scan."""
    if not stages:
        raise ValueError("funnel_counts needs at least one stage")
    conds = []
    acc = None
    for _, pred in stages:
        acc = pred if acc is None else (acc & pred)
        conds.append(acc)
    # coalesce: SUM over zero rows is NULL (count is 0) — an empty
    # corpus must report 0/0 per stage, not NULL arithmetic downstream
    aggs = [F.count(F.lit(1)).alias("_n0")] + [
        F.coalesce(
            F.sum(F.coalesce(c, F.lit(False)).cast("long")), F.lit(0)
        ).alias(f"_n{i + 1}")
        for i, c in enumerate(conds)
    ]
    row = docs.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col(f"_n{i}").alias("n_in"),
                F.col(f"_n{i + 1}").alias("n_out"),
            )
            for i, (name, _) in enumerate(stages)
        ]
    )
    return (
        row.select(F.explode(entries).alias("e"))
        .select("e.*")
        .withColumn("n_dropped", F.col("n_in") - F.col("n_out"))
    )


# ---------------------------------------------------------------------------
# RAG ingestion chunking: fixed-size character windows with overlap.
# Pure Catalyst (sequence → transform → posexplode) — no UDF, fully
# parallel per document; the op every embed-and-index pipeline runs
# first. (The reference embeds whole documents — chunking is a
# north-star LLM-pipeline add.)
# ---------------------------------------------------------------------------


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into windows of ``chunk_chars`` characters
    whose starts advance by ``chunk_chars - overlap``. Returns
    (id, chunk_idx, start_char, chunk_text). Short documents yield one
    chunk; empty ones yield none. The final window may be shorter —
    never empty — and no window starts past the end."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError(
            f"need 0 <= overlap < chunk_chars, got {overlap}/{chunk_chars}"
        )
    step = chunk_chars - overlap
    t = F.col(text_col)
    n = F.length(t)
    # start offsets: 0, step, 2*step, … while start < n
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0),
            F.floor((n - F.lit(1)) / step).cast("int"),
        ),
        F.lit(1),
    )
    chunks = F.when(n > 0, F.transform(starts, lambda i: i * step))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(chunks).alias("chunk_idx", "start_char"),
            t.alias("_t"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.col("start_char").cast("long").alias("start_char"),
            F.substring(
                F.col("_t"), F.col("start_char") + 1, chunk_chars
            ).alias("chunk_text"),
        )
    )


def upsample_mixture(
    docs: "DataFrame",
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: int = 7,
) -> "DataFrame":
    """Deterministic mixture re-weighting (epoch-level up/down-sampling
    by source — the data-mixing step of a pre-training pipeline): each
    document emits ``floor(w)`` copies plus one more with probability
    ``frac(w)``, decided by the shared overflow-free Knuth-hash bucket
    of (id, salt) — a pure projection + explode, reproducible across
    runs, engines, and partitionings (no ``rand()``). Weights < 1
    downsample (0 copies drops the doc); sources absent from
    ``weights`` pass through at weight 1.

    → original columns + ``copy_idx`` (0-based). Scale shape: no
    shuffle at all — the copy count is a row-local expression and the
    explode multiplies rows in place; a 2× average weight costs 2× scan
    output, never a join."""
    frac_mod = 10_000
    bucket = _det_bucket_expr(F.col(id_col), salt, frac_mod)
    n_copies = None
    for src, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {src!r}: {w}")
        base = int(w)
        frac_bp = int(round((w - base) * frac_mod))
        n = F.lit(base) + F.when(bucket < frac_bp, 1).otherwise(0)
        cond = F.col(source_col) == src
        n_copies = F.when(cond, n) if n_copies is None else n_copies.when(cond, n)
    n_copies = (
        n_copies.otherwise(F.lit(1)) if n_copies is not None else F.lit(1)
    )
    out = docs.withColumn("_n_copies", n_copies).filter(F.col("_n_copies") > 0)
    return out.select(
        *docs.columns,
        F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)).alias(
            "copy_idx"
        ),
    )


def upsample_copies_sql(
    weights: dict[str, float],
    id_sql: str = "doc_id",
    source_sql: str = "source",
    salt: int = 7,
) -> str:
    """DuckDB twin of the per-row copy count in :func:`upsample_mixture`
    (same bucket arithmetic via ``_det_bucket_sql``)."""
    if not weights:
        # CASE with zero WHEN branches is invalid SQL; every source
        # passes through at weight 1, same as the Spark twin
        return "1"
    frac_mod = 10_000
    bucket = _det_bucket_sql(id_sql, salt, frac_mod)
    cases = []
    for src, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {src!r}: {w}")
        base = int(w)
        frac_bp = int(round((w - base) * frac_mod))
        cases.append(
            f"WHEN {source_sql} = '{src}' THEN "
            f"({base} + CASE WHEN {bucket} < {frac_bp} THEN 1 ELSE 0 END)"
        )
    return "CASE " + " ".join(cases) + " ELSE 1 END"


def cap_per_group(
    df: "DataFrame",
    group_col: str = "source",
    cap: int = 10,
    order_by: list | None = None,
    rank_col: str = "_rank",
):
    """Per-group document cap — the C4/RefinedWeb "at most N documents
    per domain" retention step (the domain-skew control every
    web-corpus pipeline applies before mixing). Keeps the ``cap``
    best-ranked rows of each group; rank is a ``row_number`` window
    ordered by ``order_by`` (default: ``n_chars`` DESC then the id —
    deterministic cross-engine, no sampling).

    Plan: ONE shuffle on ``group_col`` + a per-group sort — the
    canonical top-k-per-group shape. At 100 TB the only hazard is a
    pathologically hot group (one domain = one window partition);
    mitigate by pre-pruning per input partition first (each partition
    can keep at most ``cap`` rows per group before the shuffle —
    ``mapInPandas`` per-partition head) or salting the rank into a
    two-stage cap. The suite-scale corpus has bounded groups, so the
    single-window plan is the right default.
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    order_by = order_by or [F.desc("n_chars"), F.asc("doc_id")]
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= cap)
        .drop(rank_col)
    )
