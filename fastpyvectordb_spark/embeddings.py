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
    """Provider-backed embedder shape (ref embeddings.py:95-193).

    STUB: no network in this environment. The pandas-UDF batching,
    schema, and retry slot are the real plumbing; the API call raises.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            raise NotImplementedError(
                "openai embedder requires network access; use "
                "mock_embedder_udf for deterministic local runs"
            )
            yield  # pragma: no cover

    return _embed


def embed_column(df, text_col: str, out_col: str = "embedding", dimensions: int = 384):
    """EmbeddingCollection.add pipeline stage (ref embeddings.py:563-597):
    attach an embedding column computed from text."""
    return df.withColumn(out_col, mock_embedder_udf(dimensions)(F.col(text_col)))
