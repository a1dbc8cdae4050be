"""BM25 inverted index + keyword search (reference ``hybrid_search.py:40-179``).

The reference maintains a mutable in-memory inverted index
(``term -> {doc_id: tf}`` + doc lengths + avgdl). Spark-first, the
index *is* a derived DataFrame pipeline:

    tokenize → explode → groupBy(term, doc) count      (postings)
    groupBy(doc) size                                   (doc lengths)
    one global agg                                      (N, avgdl)

and a query is: broadcast the (tiny) query-term table, semi-join the
postings, evaluate the BM25 expression JVM-side, partial-agg per doc,
top-k. At 100 TB the postings build is a single shuffle keyed by term,
and queries touch only the matching postings partitions — no Python in
the loop anywhere.

Pinned formulas (k1=1.5, b=0.75):
    idf(t)        = ln((N - df + 0.5) / (df + 0.5) + 1)
    score(d)      = Σ_t qtf_t · idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·len_d/avgdl))
(qtf multiplicity: the reference loops over query tokens, so a term
repeated in the query contributes once per occurrence.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpyvectordb_spark.functions.text import tokenize, duckdb_tokenize

K1 = 1.5
B = 0.75
ROUND = 6


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Returns (postings(doc_id, term, tf), doc_lengths(doc_id, doc_len))."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("tokens")
    )
    doc_lengths = toks.select("doc_id", F.size("tokens").alias("doc_len"))
    postings = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return postings, doc_lengths


def bm25_score_df(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    reuse_index: bool = True,
) -> DataFrame:
    """Scores every candidate doc (≥1 query term) → (doc_id, score).

    With ``reuse_index`` the postings/doc-length tables are
    checkpointed so the stats agg, the df-per-term agg, and the scoring
    join all read the tokenized corpus once instead of re-exploding it
    per consumer (in production the postings table is a persisted
    derived table — this is the in-session equivalent).
    """
    spark = docs.sparkSession
    postings, doc_lengths = build_postings(docs, id_col, text_col)
    if reuse_index:
        postings = postings.localCheckpoint()
        doc_lengths = doc_lengths.localCheckpoint()

    # tiny: query terms with multiplicity
    qtoks = spark.range(1).select(
        F.explode(tokenize(F.lit(query))).alias("term")
    )
    qterms = qtoks.groupBy("term").agg(F.count("*").alias("qtf"))

    stats = doc_lengths.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    # document frequency per term — only needed for query terms
    df_per_term = (
        postings.join(F.broadcast(qterms), "term")
        .groupBy("term", "qtf")
        .agg(F.count("*").alias("df"))
    )

    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .join(doc_lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("qtf")
            * F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("doc_len") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(F.sum("term_score").alias("score"))


class BM25Index:
    """Prebuilt inverted index: build once, query many (reference
    ``BM25Index`` lifecycle, ``hybrid_search.py:40-117``).

    The postings and doc-length tables are materialized once
    (checkpoint in-session; ``save``/``load`` persist them as parquet —
    at 100 TB these are the derived tables you'd maintain next to the
    corpus, partitioned/bucketed by term so a query's semi-join prunes
    to the matching term partitions). Corpus stats (N, avgdl) collapse
    to driver-side literals, so a query plan is just:
    broadcast query terms → postings semi-join → score expr → top-k.
    """

    def __init__(self, postings: DataFrame, doc_lengths: DataFrame,
                 n_docs: int, avgdl: float,
                 term_stats: DataFrame | None = None):
        self.postings = postings
        self.doc_lengths = doc_lengths
        self.n_docs = n_docs
        self.avgdl = avgdl
        # (term, df) — document frequency is query-independent, so it
        # is computed ONCE here instead of re-aggregated per query (the
        # reference's index stores it the same way,
        # hybrid_search.py:60-69). At scale: a persisted derived table.
        self.term_stats = (
            term_stats
            if term_stats is not None
            else postings.groupBy("term")
            .agg(F.count("*").alias("df"))
            .localCheckpoint()
        )

    @classmethod
    def build(cls, docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> "BM25Index":
        postings, doc_lengths = build_postings(docs, id_col, text_col)
        postings = postings.localCheckpoint()
        doc_lengths = doc_lengths.localCheckpoint()
        stats = doc_lengths.agg(
            F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
        ).head()
        return cls(postings, doc_lengths, int(stats["n"]),
                   float(stats["avgdl"] or 0.0))

    def add_documents(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> "BM25Index":
        """T2 incremental add (``hybrid_search.py:77-98``): tokenize
        only the NEW docs, union their postings/lengths into the
        derived tables, re-derive (N, avgdl, df) with delta
        aggregations — O(new docs), never a corpus rebuild. Returns a
        NEW index (snapshot semantics, same as collection commits);
        duplicate doc ids are rejected like the reference's re-add."""
        dup = (
            docs.select(F.col(id_col).alias("doc_id"))
            .join(self.doc_lengths.select("doc_id"), "doc_id", "inner")
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(f"doc {dup[0]['doc_id']!r} already indexed")
        new_postings, new_lengths = build_postings(docs, id_col, text_col)
        # materialize the new docs' derivations ONCE: four consumers
        # follow (both union checkpoints, the delta agg, the df agg) and
        # each would otherwise re-run tokenize+explode+groupBy over the
        # new docs
        new_postings = new_postings.localCheckpoint()
        new_lengths = new_lengths.localCheckpoint()
        postings = self.postings.unionByName(new_postings).localCheckpoint()
        doc_lengths = self.doc_lengths.unionByName(new_lengths).localCheckpoint()
        delta = new_lengths.agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("s")
        ).head()
        n = self.n_docs + int(delta["n"])
        total = self.avgdl * self.n_docs + float(delta["s"] or 0.0)
        term_stats = (
            self.term_stats.unionByName(
                new_postings.groupBy("term").agg(F.count("*").alias("df"))
            )
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .localCheckpoint()
        )
        return BM25Index(
            postings, doc_lengths, n, total / n if n else 0.0, term_stats
        )

    def remove_documents(self, doc_ids) -> "BM25Index":
        """T2 incremental remove (``hybrid_search.py:100-117``):
        anti-join the doomed ids out of postings/lengths, decrement
        (N, avgdl, df) from the removed rows — O(index), zero
        retokenization."""
        ids = list(doc_ids)
        doomed_post = self.postings.filter(F.col("doc_id").isin(ids))
        doomed_len = self.doc_lengths.filter(F.col("doc_id").isin(ids))
        gone = doomed_len.agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("s")
        ).head()
        n = self.n_docs - int(gone["n"])
        total = self.avgdl * self.n_docs - float(gone["s"] or 0.0)
        postings = self.postings.filter(~F.col("doc_id").isin(ids)).localCheckpoint()
        doc_lengths = self.doc_lengths.filter(
            ~F.col("doc_id").isin(ids)
        ).localCheckpoint()
        term_stats = (
            self.term_stats.join(
                doomed_post.groupBy("term").agg(F.count("*").alias("gone_df")),
                "term",
                "left",
            )
            .select(
                "term",
                (F.col("df") - F.coalesce("gone_df", F.lit(0))).alias("df"),
            )
            .filter(F.col("df") > 0)
            .localCheckpoint()
        )
        return BM25Index(
            postings, doc_lengths, n, total / n if n else 0.0, term_stats
        )

    def save(self, path: str) -> None:
        self.postings.write.mode("overwrite").parquet(f"{path}/postings")
        self.doc_lengths.write.mode("overwrite").parquet(f"{path}/doc_lengths")
        self.term_stats.write.mode("overwrite").parquet(f"{path}/term_stats")

    @classmethod
    def load(cls, spark, path: str) -> "BM25Index":
        import os

        postings = spark.read.parquet(f"{path}/postings")
        doc_lengths = spark.read.parquet(f"{path}/doc_lengths")
        stats = doc_lengths.agg(
            F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
        ).head()
        term_stats = (
            spark.read.parquet(f"{path}/term_stats")
            if os.path.isdir(f"{path}/term_stats")
            else None
        )
        return cls(postings, doc_lengths, int(stats["n"]),
                   float(stats["avgdl"] or 0.0), term_stats=term_stats)

    def pack(self) -> "BM25Packed":
        """Driver-local packed form (cached) — see :class:`BM25Packed`."""
        if getattr(self, "_packed", None) is None:
            self._packed = bm25_pack(self)
        return self._packed

    def score(self, query: str, k1: float = K1, b: float = B) -> DataFrame:
        spark = self.postings.sparkSession
        qtoks = spark.range(1).select(
            F.explode(tokenize(F.lit(query))).alias("term")
        )
        qterms = qtoks.groupBy("term").agg(F.count("*").alias("qtf"))
        # df comes from the prebuilt (term, df) table — no per-query agg
        df_per_term = self.term_stats.join(F.broadcast(qterms), "term")
        scored = (
            self.postings.join(F.broadcast(df_per_term), "term")
            .join(self.doc_lengths, "doc_id")
            .withColumn(
                "idf",
                F.log(
                    (F.lit(self.n_docs) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5) + 1.0
                ),
            )
            .withColumn(
                "term_score",
                F.col("qtf") * F.col("idf") * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("doc_len") / F.lit(self.avgdl))
                ),
            )
        )
        return scored.groupBy("doc_id").agg(
            F.sum("term_score").alias("score")
        )

    def search(self, query: str, k: int = 10, k1: float = K1, b: float = B,
               round_digits: int | None = ROUND) -> DataFrame:
        score = F.col("score")
        if round_digits is not None:
            score = F.round(score, round_digits)
        return (
            self.score(query, k1=k1, b=b)
            .select("doc_id", score.alias("score"))
            .orderBy(F.desc("score"), "doc_id")
            .limit(k)
        )

    def search_batch(self, queries, k: int = 10, k1: float = K1,
                     b: float = B,
                     round_digits: int | None = ROUND) -> DataFrame:
        """Top-k per query for a whole query batch in ONE job — the
        Spark-right way to get query throughput out of an engine with a
        per-action latency floor (SURVEY §6 caveat): broadcast the
        (query_id, term, qtf) table, join postings once, score
        everything JVM-side, window top-k per query.

        ``queries`` is a list of query strings (query_id = position) or
        a list of ``(query_id, query_string)`` pairs.
        Output: ``(query_id, rank, doc_id, score)``, score desc, ties
        by doc_id, per-query ranks 1..k.
        """
        from pyspark.sql import Window

        spark = self.postings.sparkSession
        pairs = [
            q if isinstance(q, tuple) else (i, q)
            for i, q in enumerate(queries)
        ]
        qdf = spark.createDataFrame(pairs, "query_id long, query string")
        qterms = (
            qdf.select(
                "query_id", F.explode(tokenize(F.col("query"))).alias("term")
            )
            .groupBy("query_id", "term")
            .agg(F.count("*").alias("qtf"))
        )
        # df comes from the prebuilt (term, df) table; both sides are
        # bounded by the number of distinct query terms — broadcast so
        # the plan never sort-merges on a tiny dimension
        df_per_term = self.term_stats.join(
            F.broadcast(qterms.select("term").distinct()), "term"
        )
        qjoin = qterms.join(F.broadcast(df_per_term), "term")
        scored = (
            self.postings.join(F.broadcast(qjoin), "term")
            .join(self.doc_lengths, "doc_id")
            .withColumn(
                "idf",
                F.log(
                    (F.lit(self.n_docs) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5) + 1.0
                ),
            )
            .withColumn(
                "term_score",
                F.col("qtf") * F.col("idf") * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("doc_len") / F.lit(self.avgdl))
                ),
            )
            .groupBy("query_id", "doc_id")
            .agg(F.sum("term_score").alias("score"))
        )
        score = F.col("score")
        if round_digits is not None:
            score = F.round(score, round_digits)
        scored = scored.select("query_id", "doc_id", score.alias("score"))
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score")
        )


class BM25Packed:
    """Driver-resident packed inverted index — the reference's
    in-memory regime (``hybrid_search.py:60-69``: dict postings resident
    across queries) re-expressed as contiguous NumPy arrays, the same
    adaptive-local pattern as ``ann.ivf.ivf_pack``: when the index fits
    on the driver, a query is term-dict lookups + vectorized score
    accumulation (~ms), no job scheduling; at scale the distributed
    ``BM25Index`` plans are the same math. Parity-tested against them.
    """

    def __init__(self, doc_ids, denom, terms, offsets, post_doc, post_tf,
                 idf, k1: float = K1, b: float = B):
        self.doc_ids = doc_ids      # (N,) int64 sorted asc
        self.denom = denom          # (N,) f64 = k1*(1-b+b*len/avgdl)
        self.terms = terms          # dict term -> slot
        self.offsets = offsets      # (T+1,) postings row ranges per slot
        self.post_doc = post_doc    # (P,) doc row index
        self.post_tf = post_tf      # (P,) f64 term frequency
        self.idf = idf              # (T,) f64 ln((N-df+.5)/(df+.5)+1)
        self.k1 = k1
        self.b = b

    @staticmethod
    def _tokenize(text: str) -> list[str]:
        import re

        return [t for t in re.split("[^a-z0-9_]+", text.lower()) if t]

    def _scores(self, query: str):
        """Dense (N,) f64 score vector; untouched docs stay exactly 0."""
        import numpy as np
        from collections import Counter

        s = np.zeros(len(self.doc_ids))
        for term, qtf in Counter(self._tokenize(query)).items():
            slot = self.terms.get(term)
            if slot is None:
                continue
            lo, hi = int(self.offsets[slot]), int(self.offsets[slot + 1])
            rows = self.post_doc[lo:hi]
            tf = self.post_tf[lo:hi]
            s[rows] += (
                qtf * self.idf[slot] * tf * (self.k1 + 1)
                / (tf + self.denom[rows])
            )
        return s

    def topk_arrays(self, query: str, k: int = 10,
                    round_digits: int | None = ROUND):
        """``(doc_ids, scores)`` NumPy pair for the top-k — the
        allocation-lean form the hybrid serving kernel consumes
        directly (same values/ordering as :meth:`search`, which is
        this plus tuple boxing)."""
        import numpy as np

        s = self._scores(query)
        cand = np.nonzero(s)[0]
        sc = s[cand]
        if round_digits is not None:
            sc = np.round(sc, round_digits)
        order = np.lexsort((self.doc_ids[cand], -sc))[:k]
        return self.doc_ids[cand[order]], sc[order]

    def search(self, query: str, k: int = 10,
               round_digits: int | None = ROUND):
        """Top-k ``[(doc_id, score), ...]`` — same values/ordering as
        ``BM25Index.search`` (score desc rounded, ties by doc_id)."""
        ids, sc = self.topk_arrays(query, k, round_digits)
        return [(int(i), float(v)) for i, v in zip(ids, sc)]

    def search_batch(self, queries, k: int = 10,
                     round_digits: int | None = ROUND):
        """Pandas ``(query_id, rank, doc_id, score)`` — the local twin
        of ``BM25Index.search_batch``."""
        import pandas as pd

        pairs = [
            q if isinstance(q, tuple) else (i, q)
            for i, q in enumerate(queries)
        ]
        out = []
        for qid, q in pairs:
            for rank, (doc_id, score) in enumerate(
                self.search(q, k, round_digits), 1
            ):
                out.append((qid, rank, doc_id, score))
        return pd.DataFrame(
            out, columns=["query_id", "rank", "doc_id", "score"]
        )


def bm25_pack(index: "BM25Index", k1: float = K1, b: float = B) -> BM25Packed:
    """Collect the postings/doc-length tables once (Arrow) into a
    :class:`BM25Packed`. Postings are sorted by (term, doc row) so each
    term is one contiguous slice."""
    import numpy as np

    dl = index.doc_lengths.select("doc_id", "doc_len").toArrow()
    doc_ids = dl["doc_id"].to_numpy()
    doc_len = dl["doc_len"].to_numpy().astype("float64")
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = np.ascontiguousarray(doc_ids[order])
    denom = k1 * (1 - b + b * doc_len[order] / (index.avgdl or 1.0))

    pt = index.postings.select("term", "doc_id", "tf").toArrow()
    terms_arr = pt["term"].to_numpy(zero_copy_only=False)
    pdoc_ids = pt["doc_id"].to_numpy()
    tf = pt["tf"].to_numpy().astype("float64")
    # doc id -> packed row
    rows = np.searchsorted(doc_ids, pdoc_ids)
    t_order = np.argsort(terms_arr, kind="stable")
    terms_sorted = terms_arr[t_order]
    uniq, starts = np.unique(terms_sorted, return_index=True)
    offsets = np.append(starts, len(terms_sorted))
    df = np.diff(offsets).astype("float64")
    n = len(doc_ids)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return BM25Packed(
        doc_ids=doc_ids,
        denom=denom,
        terms={t: i for i, t in enumerate(uniq)},
        offsets=offsets,
        post_doc=np.ascontiguousarray(rows[t_order]),
        post_tf=np.ascontiguousarray(tf[t_order]),
        idf=idf,
        k1=k1,
        b=b,
    )


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int | None = ROUND,
    pre_filter=None,
) -> DataFrame:
    """T5/H1: top-k by BM25 score desc, ties by doc_id (rounded scores).

    ``pre_filter`` is the filtered keyword search (H1,
    ``hybrid_search.py:318-358``): the reference over-fetches k*10 then
    post-filters (can return <k rows); we pre-filter — the filter
    applies before scoring, so recall never drops (SURVEY §4).
    Corpus statistics (N, avgdl, df) are computed over the *filtered*
    corpus, consistent with scoring a sub-collection.
    """
    if pre_filter is not None:
        docs = docs.filter(pre_filter)
    scores = bm25_score_df(docs, query, id_col, text_col)
    score = F.col("score")
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        scores.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twin (same CTE pipeline, same formula shape)
# ---------------------------------------------------------------------------

def duckdb_bm25_scores_cte(
    query: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> str:
    """CTE chain ending in ``bm25_scores(doc_id, score)`` (unrounded)."""
    q = query.replace("'", "''")
    return f"""
toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokenize(text_col)} AS tokens FROM {table}
),
doc_lengths AS (SELECT doc_id, len(tokens) AS doc_len FROM toks),
postings AS (
  SELECT doc_id, unnest(tokens) AS term FROM toks
),
postings_tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM postings GROUP BY doc_id, term
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(doc_len) AS DOUBLE) / COUNT(*) AS avgdl
  FROM doc_lengths
),
qterms AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS qtf
  FROM (SELECT unnest({duckdb_tokenize(f"'{q}'")}) AS term)
  GROUP BY term
),
df_per_term AS (
  SELECT p.term, q.qtf, CAST(COUNT(*) AS BIGINT) AS df
  FROM postings_tf p JOIN qterms q USING (term)
  GROUP BY p.term, q.qtf
),
bm25_scores AS (
  SELECT p.doc_id,
         SUM(
           d.qtf * ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * ({k1} + 1))
           / (p.tf + {k1} * (1 - {b} + {b} * l.doc_len / s.avgdl))
         ) AS score
  FROM postings_tf p
  JOIN df_per_term d ON p.term = d.term
  JOIN doc_lengths l ON p.doc_id = l.doc_id
  CROSS JOIN stats s
  GROUP BY p.doc_id
)"""
