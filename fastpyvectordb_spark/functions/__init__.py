from fastpyvectordb_spark.functions.distances import (  # noqa: F401
    dot,
    l2_distance,
    norm,
    cosine_similarity,
    cosine_distance,
    ip_distance,
    distance,
    METRICS,
)
from fastpyvectordb_spark.functions.text import tokenize, TOKEN_SPLIT_RE  # noqa: F401
from fastpyvectordb_spark.functions.hashes import portable_hash64, md5_prefix  # noqa: F401
