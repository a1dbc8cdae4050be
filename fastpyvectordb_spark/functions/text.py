"""Text scalar functions.

Tokenization mirrors the reference BM25 tokenizer
(``hybrid_search.py:71-75``): lowercase + ``\\b\\w+\\b``. We express it
as a split on non-word characters with empties dropped, which is
equivalent on ASCII text and identical between Spark (Java regex) and
DuckDB (RE2) — important because the tokenizer feeds the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# split on anything that is not [a-z0-9_] after lowercasing
TOKEN_SPLIT_RE = "[^a-z0-9_]+"


def tokenize(text: Column) -> Column:
    """lowercase + split on non-word chars; drops empty tokens."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE),
        lambda t: t != F.lit(""),
    )


def duckdb_tokenize(text_expr: str) -> str:
    """The identical tokenizer as a DuckDB SQL fragment."""
    return (
        f"list_filter(string_split_regex(lower({text_expr}), '{TOKEN_SPLIT_RE}'), "
        f"t -> t <> '')"
    )
