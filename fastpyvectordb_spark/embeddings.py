"""Embedding UDFs (reference ``embeddings.py``).

The reference's embedder layer is the de-facto scalar-UDF surface:
pluggable providers (OpenAI/SentenceTransformers/Cohere) plus a
deterministic mock. Spark-first, an embedder is an Arrow-batched
pandas UDF: text column in, ``ARRAY<FLOAT>`` out, batched per
partition — the only sane shape for a provider call or a local model
at 100 TB.

The mock embedder reproduces the reference algorithm exactly
(``embeddings.py:361-371``): seed = first 8 hex chars of sha256(text),
``RandomState(seed).randn(D)`` L2-normalized — bit-identical across
runtimes, which is what makes text→vector tests deterministic.

Provider-backed embedders (OpenAI etc.) are structured the same way
but stubbed: this environment has no network/SDKs, so they raise
``NotImplementedError`` at call time with the batching plumbing real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def mock_embed_batch(texts: "pd.Series", dimensions: int) -> "pd.Series":
    """Vectorized mock embedding of a pandas Series of strings."""
    import hashlib

    import numpy as np

    out = []
    for t in texts:
        seed = int(hashlib.sha256(str(t).encode()).hexdigest()[:8], 16)
        rng = np.random.RandomState(seed)
        v = rng.randn(dimensions).astype(np.float32)
        v = v / np.linalg.norm(v)
        out.append([float(x) for x in v])
    return pd.Series(out)


def mock_embedder_udf(dimensions: int = 384):
    """pandas_udf: text → deterministic mock embedding."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield mock_embed_batch(texts, dimensions)

    return _embed


def openai_embedder_udf(model: str = "text-embedding-3-small", dimensions: int = 1536):
    """Provider-backed embedder (ref embeddings.py:95-193): the client
    lazy-loads once per Python worker and each Arrow batch becomes one
    embeddings API call. Feature-gated: without the ``openai`` package
    and ``OPENAI_API_KEY`` in the worker env it raises
    NotImplementedError at call time (this sandbox has neither); the
    batching plumbing is exercised either way."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import os

        try:
            from openai import OpenAI
        except ImportError as ex:
            raise NotImplementedError(
                "openai package not installed; use mock_embedder_udf "
                "for deterministic local runs"
            ) from ex
        if not os.environ.get("OPENAI_API_KEY"):
            raise NotImplementedError(
                "OPENAI_API_KEY not set in the executor environment"
            )
        client = OpenAI()  # one client per worker
        for texts in batches:
            resp = client.embeddings.create(
                model=model, input=list(texts), dimensions=dimensions
            )
            yield pd.Series(
                [[float(x) for x in d.embedding] for d in resp.data]
            )

    return _embed


def embed_column(df, text_col: str, out_col: str = "embedding", dimensions: int = 384):
    """EmbeddingCollection.add pipeline stage (ref embeddings.py:563-597):
    attach an embedding column computed from text."""
    return df.withColumn(out_col, mock_embedder_udf(dimensions)(F.col(text_col)))


def sentence_transformers_embedder_udf(
    model: str = "all-MiniLM-L6-v2", dimensions: int = 384
):
    """Local-model embedder shape (ref embeddings.py:200-256): the model
    would lazy-load ONCE PER PYTHON WORKER (inside the UDF closure, not
    per row) and encode each Arrow batch. STUB: the library is not in
    this environment; lazy-load raises, the batching plumbing is real.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        try:
            from sentence_transformers import SentenceTransformer  # noqa: F401
        except ImportError as ex:  # pragma: no cover - always taken here
            raise NotImplementedError(
                "sentence-transformers not installed; use "
                "mock_embedder_udf for deterministic local runs"
            ) from ex
        m = SentenceTransformer(model)  # lazy per-worker load
        for texts in batches:
            yield pd.Series(
                [[float(x) for x in v] for v in m.encode(list(texts))]
            )

    return _embed


def cohere_embedder_udf(model: str = "embed-english-v3.0", dimensions: int = 1024):
    """Provider-backed embedder (ref embeddings.py:263-336).
    Feature-gated like :func:`openai_embedder_udf`: runs for real where
    the ``cohere`` package and ``COHERE_API_KEY`` exist, raises
    NotImplementedError here."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import os

        try:
            import cohere
        except ImportError as ex:
            raise NotImplementedError(
                "cohere package not installed; use mock_embedder_udf "
                "for deterministic local runs"
            ) from ex
        key = os.environ.get("COHERE_API_KEY")
        if not key:
            raise NotImplementedError(
                "COHERE_API_KEY not set in the executor environment"
            )
        client = cohere.Client(key)
        for texts in batches:
            resp = client.embed(
                texts=list(texts), model=model, input_type="search_document"
            )
            yield pd.Series(
                [[float(x) for x in v] for v in resp.embeddings]
            )

    return _embed


def get_embedder_udf(provider: str = "auto", dimensions: int = 384):
    """Factory with the reference's auto-detect order (embeddings.py:
    455-514): openai → sentence-transformers → mock. In this
    environment auto always lands on mock; explicit providers return
    their (stubbed) UDFs."""
    if provider == "openai":
        return openai_embedder_udf(dimensions=dimensions)
    if provider == "sentence-transformers":
        return sentence_transformers_embedder_udf(dimensions=dimensions)
    if provider == "cohere":
        return cohere_embedder_udf(dimensions=dimensions)
    if provider in ("auto", "mock"):
        if provider == "auto":
            import importlib.util
            import os

            # remote providers need their key too — picking openai on
            # package presence alone would fail at call time in every
            # executor instead of falling through to a usable provider
            if (
                importlib.util.find_spec("openai") is not None
                and os.environ.get("OPENAI_API_KEY")
            ):
                return openai_embedder_udf(dimensions=dimensions)
            if importlib.util.find_spec("sentence_transformers") is not None:
                return sentence_transformers_embedder_udf(
                    dimensions=dimensions
                )
        return mock_embedder_udf(dimensions=dimensions)
    raise ValueError(f"unknown embedder provider: {provider}")


def embed_column_cached(
    df,
    cache_path: str,
    text_col: str = "text",
    out_col: str = "embedding",
    dimensions: int = 384,
    embedder=None,
):
    """Cached embedding stage (ref CachedEmbedder, embeddings.py:
    374-448 — a disk JSON text→vec cache). Spark-first the cache is a
    parquet table keyed by text hash: misses are embedded and APPENDED
    to the cache, hits skip the (expensive) embedder entirely. At
    100 TB this is the difference between re-embedding a corpus and an
    incremental join — the cache table is the persisted artifact.

    Returns ``df`` with ``out_col`` attached.
    """
    spark = df.sparkSession
    if embedder is None:
        embedder = mock_embedder_udf(dimensions)
    # cache key = (text hash, dimensions): a cache written at one
    # dimensionality must never serve hits to a differently-sized
    # embed call — mixed-length embedding columns break kNN downstream
    keyed = df.withColumn(
        "_text_hash", F.md5(F.col(text_col).cast("string"))
    ).withColumn("_dims", F.lit(int(dimensions)))
    try:
        cache = spark.read.parquet(cache_path)
        if "_dims" not in cache.columns:  # pre-keying caches: one dim
            cache = cache.withColumn("_dims", F.lit(int(dimensions)))
        have_cache = True
    except Exception:
        have_cache = False
    # plain joins on the hash key — NO forced broadcast: the cache
    # grows with the distinct-text corpus and force-broadcasting it
    # collects the whole table to the driver (8 GB hard cap, OOM far
    # earlier). AQE still broadcasts small caches on its own.
    if have_cache:
        hits = keyed.join(
            cache.withColumnRenamed("vec", out_col),
            ["_text_hash", "_dims"],
            "left",
        )
        misses = (
            hits.filter(F.col(out_col).isNull())
            .select("_text_hash", "_dims", text_col)
            .distinct()
        )
    else:
        misses = keyed.select("_text_hash", "_dims", text_col).distinct()
    new_entries = misses.withColumn("vec", embedder(F.col(text_col))).select(
        "_text_hash", "_dims", "vec"
    )
    new_entries.write.mode("append").parquet(cache_path)
    fresh = spark.read.parquet(cache_path).withColumnRenamed(
        "vec", "_fresh_vec"
    )
    if "_dims" not in fresh.columns:
        fresh = fresh.withColumn("_dims", F.lit(int(dimensions)))
    return (
        keyed.join(fresh, ["_text_hash", "_dims"], "left")
        .withColumn(out_col, F.col("_fresh_vec"))
        .drop("_fresh_vec", "_text_hash", "_dims")
    )
