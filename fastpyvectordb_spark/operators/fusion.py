"""Hybrid vector+keyword score fusion (reference ``hybrid_search.py:360-477``).

Pinned semantics:
- fetch_k = k*5 candidates from each side
- vector side: cosine distances → normalized similarity
  ``1 - dist/max_dist`` where ``max_dist`` is the max over the fetched
  vector candidate set (per-result-set normalization)
- keyword side: BM25 ``score/max_score`` over the fetched keyword set
- candidate union, missing side contributes 0
- combined = ``alpha·v + (1-alpha)·kw``, sort desc, ties by id, head k

Spark shape: two small top-k sub-DataFrames (each already reduced to
k*5 rows by TakeOrdered) → window ``max() over ()`` for the per-set
max → **full outer join** on id → ``coalesce(score, 0)`` → weighted
sum → TakeOrdered(k). The expensive parts (corpus scans) happen before
the join; the fusion itself touches ≤ 2·k·5 rows regardless of corpus
size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators.bm25 import bm25_score_df
from fastpyvectordb_spark.operators.knn import knn

ROUND = 6


def hybrid_search(
    corpus: DataFrame,
    query_vec: Sequence[float],
    query_text: str | None,
    k: int = 10,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    text_col: str = "text",
    bm25_index=None,
    vector_weight: float | None = None,
    keyword_weight: float | None = None,
) -> DataFrame:
    """Returns (doc_id, score, vector_score, keyword_score), score desc.

    ``vector_weight``/``keyword_weight`` are the reference's H3 alias
    pair (``hybrid_search.py:392-395``): when both are set,
    ``alpha = vector_weight / (vector_weight + keyword_weight)``
    (0.5 on zero total), overriding ``alpha``.

    ``corpus`` needs both an embedding column and a text column.
    ``bm25_index`` (a prebuilt :class:`~...operators.bm25.BM25Index`
    over the same corpus) skips the per-query postings rebuild — the
    reference's engine keeps its inverted index resident across queries
    (``hybrid_search.py:60-69``); this is the query-many path. Scores
    are identical when the index was built on ``corpus``.
    """
    if vector_weight is not None and keyword_weight is not None:
        total = vector_weight + keyword_weight
        alpha = vector_weight / total if total > 0 else 0.5
    fetch_k = k * 5

    vec_top = knn(
        corpus, query_vec, k=fetch_k, metric="cosine",
        id_col=id_col, vec_col=vec_col,
    ).withColumnRenamed(id_col, "doc_id")
    # per-result-set normalization: 1 - dist/max_dist (max==0 → 1.0)
    wall = Window.partitionBy()
    vec_norm = vec_top.withColumn("max_dist", F.max("dist").over(wall)).select(
        "doc_id",
        F.when(F.col("max_dist") > 0, 1.0 - F.col("dist") / F.col("max_dist"))
        .otherwise(F.lit(1.0))
        .alias("vector_score"),
    )

    if not query_text:
        return (
            vec_norm.select(
                "doc_id",
                F.round(F.col("vector_score"), ROUND).alias("score"),
                F.round(F.col("vector_score"), ROUND).alias("vector_score"),
                F.lit(0.0).alias("keyword_score"),
            )
            .orderBy(F.desc("score"), "doc_id")
            .limit(k)
        )

    kw_scores = (
        bm25_index.score(query_text)
        if bm25_index is not None
        else bm25_score_df(corpus, query_text, id_col=id_col, text_col=text_col)
    )
    kw_top = (
        kw_scores
        .select("doc_id", F.round(F.col("score"), ROUND).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(fetch_k)
    )
    kw_norm = kw_top.withColumn("max_score", F.max("score").over(wall)).select(
        "doc_id",
        F.when(F.col("max_score") > 0, F.col("score") / F.col("max_score"))
        .otherwise(F.lit(0.0))
        .alias("keyword_score"),
    )

    fused = (
        vec_norm.join(kw_norm, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("vector_score", F.lit(0.0)).alias("vector_score"),
            F.coalesce("keyword_score", F.lit(0.0)).alias("keyword_score"),
        )
        .withColumn(
            "score",
            F.round(
                alpha * F.col("vector_score") + (1 - alpha) * F.col("keyword_score"),
                ROUND,
            ),
        )
        .select(
            "doc_id",
            "score",
            F.round("vector_score", ROUND).alias("vector_score"),
            F.round("keyword_score", ROUND).alias("keyword_score"),
        )
    )
    return fused.orderBy(F.desc("score"), "doc_id").limit(k)


def _vmat64(packed):
    """Lazy f64 copy of a packed vector matrix + sequential-equivalent
    norms, cached on the object: the distributed fusion path computes
    distances as double-precision SQL expressions, so the local twin
    must run the kernel in f64 too or 6-decimal rounding won't close
    the f32 gap."""
    import numpy as np

    cached = getattr(packed, "_vmat64", None)
    if cached is None:
        m = packed.vmat.astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", m, m)) + 1e-10
        cached = (m, norms)
        packed._vmat64 = cached
    return cached


def hybrid_search_local(
    vec_packed,
    bm25_packed,
    query_vec: Sequence[float],
    query_text: str | None,
    k: int = 10,
    alpha: float = 0.5,
):
    """Driver-local twin of :func:`hybrid_search` over packed indexes
    (``ann.ivf.IVFPacked`` / ``ivf_pack`` output for the vector side,
    ``operators.bm25.BM25Packed`` for the keyword side) — the
    reference's resident-index hybrid regime (``hybrid_search.py:
    360-477``: both indexes in memory, per-query work is two lookups +
    a dict merge). Pinned semantics identical: k*5 fetch each side,
    per-result-set max normalization, union with missing side 0,
    ``alpha·v+(1-alpha)·kw``. Returns ``[(doc_id, score, vector_score,
    keyword_score), ...]`` score desc, ties by id. Parity-tested
    against the distributed plan; at scale the distributed path is the
    same math."""
    import numpy as np

    fetch_k = k * 5
    m, norms = _vmat64(vec_packed)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) + 1e-10)
    d = 1.0 - (m @ qn) / norms
    d = np.round(d, ROUND)  # knn rounds before its ORDER BY dist, id
    kk = min(fetch_k, d.shape[0])
    # (dist, id)-exact sampled cut (round 9): rounded distances tie
    # often, and a bare argpartition could keep an arbitrary tied
    # member at the fetch_k boundary where ORDER BY dist, id keeps the
    # smaller id — topk_rows_tied applies the exact rule, faster
    from fastpyvectordb_spark.operators.knn import topk_rows_tied

    part = topk_rows_tied(d[None, :], vec_packed.ids, kk)[0]
    sel = part[np.lexsort((vec_packed.ids[part], d[part]))]
    vids = np.asarray(vec_packed.ids[sel], dtype=np.int64)
    dsel = d[sel]
    max_dist = dsel[-1] if len(sel) else 0.0  # sel is dist-ascending
    v = 1.0 - dsel / max_dist if max_dist > 0 else np.ones_like(dsel)

    if not query_text:
        # H4 fallback: pure vector, score == vector_score (unweighted)
        vr = np.round(v, ROUND)
        order = np.lexsort((vids, -vr))[:k]
        return [
            (int(vids[i]), float(vr[i]), float(vr[i]), 0.0) for i in order
        ]

    kw_ids, kw_raw = bm25_packed.topk_arrays(query_text, k=fetch_k)
    if len(kw_ids):
        kw_ids = np.asarray(kw_ids, dtype=np.int64)
        mx = kw_raw.max()
        kw = kw_raw / mx if mx > 0 else np.zeros_like(kw_raw)
    else:
        kw_ids = np.empty(0, dtype=np.int64)
        kw = np.empty(0, dtype=np.float64)

    # candidate union + missing-side-0, all vectorized: scatter each
    # side's scores onto the unique-id axis
    uniq, inv = np.unique(np.concatenate([vids, kw_ids]), return_inverse=True)
    vv = np.zeros(len(uniq))
    vv[inv[: len(vids)]] = v
    kk_s = np.zeros(len(uniq))
    kk_s[inv[len(vids):]] = kw
    score = np.round(alpha * vv + (1 - alpha) * kk_s, ROUND)
    vr = np.round(vv, ROUND)
    kr = np.round(kk_s, ROUND)
    order = np.lexsort((uniq, -score))[:k]
    return [
        (int(uniq[i]), float(score[i]), float(vr[i]), float(kr[i]))
        for i in order
    ]


def hybrid_search_batch(
    corpus: DataFrame,
    queries,
    k: int = 10,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    text_col: str = "text",
    bm25_index=None,
) -> DataFrame:
    """Whole-query-batch hybrid fusion in ONE job — same pinned
    semantics as :func:`hybrid_search` applied per query (k*5 fetch
    each side, per-result-set max normalization, union, weighted sum),
    with the per-set max becoming a ``max() over (partition by
    query_id)`` window. This is how the engine reaches the reference's
    in-memory hybrid throughput regime (``hybrid_search.py:360-477``):
    the corpus is scanned once for all queries on each side instead of
    once per query.

    ``queries`` is a pandas DataFrame with columns ``query_id`` (int64),
    ``query_vec`` (list[float]) and ``query_text`` (str). Returns
    ``(query_id, rank, doc_id, score, vector_score, keyword_score)``.
    """
    from fastpyvectordb_spark.operators.bm25 import BM25Index
    from fastpyvectordb_spark.operators.knn import knn_join

    fetch_k = k * 5
    spark = corpus.sparkSession

    qdf = spark.createDataFrame(
        [
            (int(r.query_id), [float(x) for x in r.query_vec])
            for r in queries.itertuples()
        ],
        f"query_id long, query_vec array<float>",
    )
    vec_top = knn_join(
        corpus, qdf, k=fetch_k, metric="cosine",
        id_col=id_col, vec_col=vec_col,
    ).withColumnRenamed(id_col, "doc_id")
    wq = Window.partitionBy("query_id")
    vec_norm = vec_top.withColumn("max_dist", F.max("dist").over(wq)).select(
        "query_id",
        "doc_id",
        F.when(F.col("max_dist") > 0, 1.0 - F.col("dist") / F.col("max_dist"))
        .otherwise(F.lit(1.0))
        .alias("vector_score"),
    )

    if bm25_index is None:
        bm25_index = BM25Index.build(corpus, id_col=id_col, text_col=text_col)
    # None must not become the literal token 'None'; textless queries
    # take hybrid_search's unweighted pure-vector fallback below
    qtexts = [
        (int(r.query_id), "" if r.query_text is None else str(r.query_text))
        for r in queries.itertuples()
    ]
    kw_top = bm25_index.search_batch(qtexts, k=fetch_k)
    kw_norm = kw_top.withColumn(
        "max_score", F.max("score").over(wq)
    ).select(
        "query_id",
        "doc_id",
        F.when(F.col("max_score") > 0, F.col("score") / F.col("max_score"))
        .otherwise(F.lit(0.0))
        .alias("keyword_score"),
    )

    # per-query text flag: an empty-text query scores as the UNWEIGHTED
    # vector score (hybrid_search's `if not query_text` branch) — the
    # two documented-equivalent paths must agree
    has_text = F.broadcast(
        spark.createDataFrame(
            [(qid, bool(t.strip())) for qid, t in qtexts],
            "query_id long, has_text boolean",
        )
    )
    fused = (
        vec_norm.join(kw_norm, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("vector_score", F.lit(0.0)).alias("vector_score"),
            F.coalesce("keyword_score", F.lit(0.0)).alias("keyword_score"),
        )
        .join(has_text, "query_id")
        .withColumn(
            "score",
            F.round(
                F.when(
                    F.col("has_text"),
                    alpha * F.col("vector_score")
                    + (1 - alpha) * F.col("keyword_score"),
                ).otherwise(F.col("vector_score")),
                ROUND,
            ),
        )
        .select(
            "query_id",
            "doc_id",
            "score",
            F.round("vector_score", ROUND).alias("vector_score"),
            F.round("keyword_score", ROUND).alias("keyword_score"),
        )
    )
    wrank = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id", "score",
            "vector_score", "keyword_score",
        )
    )
