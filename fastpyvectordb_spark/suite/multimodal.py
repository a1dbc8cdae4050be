"""Multimodal suite queries over a deterministic synthetic media table
derived from ``documents`` (payload = utf-8 text bytes, mime cycles
image/audio/video). The mapInPandas plumbing is exercised for real;
the oracle reproduces the stubbed checksums in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators import multimodal as M

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


# audio chunking: window/hop arithmetic + real byte slicing, all
# SQL-expressible → fully oracle-gated (chunk bytes compared by length)
_CHUNK_ORACLE = """
WITH media AS (
  SELECT 'm:' || doc_id AS media_id,
         ['image/png', 'audio/wav', 'video/mp4'][(doc_id % 3 + 1)] AS mime,
         encode(text) AS payload,
         CAST(length(text) AS BIGINT) * 10 AS duration_ms
  FROM documents
),
audio AS (
  SELECT media_id, payload, duration_ms,
         octet_length(payload) / CAST(greatest(duration_ms, 1) AS DOUBLE) AS bpm,
         greatest(1, CAST(ceil((duration_ms - 5000) / 2500.0) AS INT) + 1) AS n_chunks
  FROM media WHERE mime LIKE 'audio/%'
)
SELECT media_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(i * 2500 AS BIGINT) AS start_ms,
       CAST(least(i * 2500 + 5000, duration_ms) AS BIGINT) AS end_ms,
       CAST(CAST(CASE WHEN i * 2500 + 5000 >= duration_ms
                      THEN octet_length(payload)
                      ELSE floor(least(i * 2500 + 5000, duration_ms) * bpm)
                 END AS INT)
            - CAST(floor(i * 2500 * bpm) AS INT) AS INT) AS chunk_bytes
FROM audio, unnest(range(n_chunks)) AS t(i)
ORDER BY media_id, chunk_idx
"""


@register("media_audio_chunks", _CHUNK_ORACLE)
def media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 5s/2.5s audio windows with real payload byte
    slicing (M.chunk_audio) — compared to the oracle on the window
    arithmetic + slice lengths."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.synthetic_media(spark, docs)
    chunks = M.chunk_audio(media, window_ms=5000, hop_ms=2500)
    return chunks.select(
        "media_id",
        "chunk_idx",
        "start_ms",
        "end_ms",
        F.length("chunk_payload").cast("int").alias("chunk_bytes"),
    ).orderBy("media_id", "chunk_idx")
