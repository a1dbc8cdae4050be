"""Multimodal suite queries over a deterministic synthetic media table
derived from ``documents`` (payload = utf-8 text bytes, mime cycles
image/audio/video). The mapInPandas plumbing is exercised for real;
the oracle reproduces the stubbed checksums in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fastpyvectordb_spark.operators.multimodal import (
    extract_features,
    media_manifest,
    sample_frames,
    synthetic_media,
)
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table

_MEDIA_CTE = """
media AS (
  SELECT 'm:' || doc_id AS media_id,
         ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INT)] AS mime,
         encode(text) AS payload,
         CAST(n_chars % 640 + 64 AS INT) AS width,
         CAST(n_chars % 480 + 48 AS INT) AS height,
         CAST(n_chars * 10 AS BIGINT) AS duration_ms
  FROM documents
)"""


@register(
    "media_features",
    f"""
WITH {_MEDIA_CTE.lstrip()}
SELECT media_id, mime,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       md5(hex(payload)) AS checksum
FROM media
ORDER BY media_id
""",
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage: the mapInPandas pipeline runs for
    real; the oracle checks ids/sizes/checksums (the stub feature
    vector itself is pinned by pytest, not SQL-expressible)."""
    media = synthetic_media(spark, load_table(spark, sf_dir, "documents"))
    return (
        extract_features(media, dims=16)
        .select("media_id", "mime", "n_bytes", "checksum")
        .orderBy("media_id")
    )


@register(
    "media_frame_sample",
    f"""
WITH {_MEDIA_CTE.lstrip()}
SELECT media_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * 1000 AS BIGINT) AS ts_ms,
       md5(hex(payload) || '#' || i) AS frame_checksum
FROM media, unnest(range(0, greatest(1, duration_ms // 1000))) AS t(i)
WHERE mime = 'video/mp4'
ORDER BY media_id, frame_idx
""",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1 fps stub) — one row per frame with
    deterministic checksums."""
    from pyspark.sql import functions as F

    media = synthetic_media(spark, load_table(spark, sf_dir, "documents"))
    video = media.filter(F.col("mime") == "video/mp4")
    return sample_frames(video, every_ms=1000).orderBy("media_id", "frame_idx")


@register(
    "media_manifest",
    f"""
WITH {_MEDIA_CTE.lstrip()}
SELECT mime,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       MIN(width) AS min_width,
       MAX(width) AS max_width
FROM media
GROUP BY mime
ORDER BY mime
""",
)
def media_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata manifest aggregation (payload column pruned)."""
    media = synthetic_media(spark, load_table(spark, sf_dir, "documents"))
    return media_manifest(media)
