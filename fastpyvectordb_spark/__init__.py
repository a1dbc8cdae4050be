"""fastpyvectordb_spark — a PySpark-native analytics/vector engine.

A ground-up re-expression of the capabilities of the reference engine
(jcolano/fastpyvectordb: single-node NumPy/hnswlib vector DB + BM25 +
property graph + quantization + realtime events) as idiomatic Spark
DataFrame plans designed for 100 TB scale:

- collections are parquet tables ``(id, embedding ARRAY<FLOAT>, ...meta)``
- every query is a declarative DataFrame plan (Catalyst optimizes it)
- kNN = distance expression + TakeOrderedAndProject (exact mode), with
  GEMM/LSH/IVF accelerated paths for scale
- BM25 = postings DataFrame + score expression
- graph = nodes/edges DataFrames + iterative frontier joins
- quantization = aggregate-trained codebooks broadcast to encode/search
- streaming = Structured Streaming over an event table

See SURVEY.md at the repo root for the full operator blueprint.
"""

__version__ = "0.1.0"

from fastpyvectordb_spark.session import get_spark  # noqa: F401
from fastpyvectordb_spark.tables import load_table, TABLES  # noqa: F401
