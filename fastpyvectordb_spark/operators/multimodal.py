"""Multimodal columns for training-data pipelines.

Images/audio/video ride through Spark as opaque ``BINARY`` payload
columns plus typed metadata (mime, width/height/duration, checksum).
All the Spark-side plumbing is real — schemas, Arrow-batched
``mapInPandas`` transforms, deterministic partitioning, manifest
aggregation; the actual media decoding is STUBBED (this container has
no image/audio libraries): ``decode_stub=True`` produces
deterministic md5-derived fake features so the pipeline is testable
end-to-end, and ``decode_stub=False`` raises ``NotImplementedError``
at the exact point a real decoder (PIL/ffmpeg/torchvision) would be
called — the function signature, batch shape, and output schema are
the production contract.

At 100 TB: payloads stay in parquet binary columns (never collected),
transforms stream Arrow batches partition-locally, and the feature/
metadata outputs are small typed columns that downstream joins/dedup
operate on without touching the payloads again.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _real_image_feature(raw: bytes, mime: str, dims: int) -> list[float]:
    """Feature-gated REAL decode: mean-centred grayscale pixel grid via
    PIL, unit-normalized. Runs wherever Pillow is installed; raises
    NotImplementedError in environments without it (this sandbox) or
    for non-image payloads (video/audio decode needs ffmpeg, which the
    reference does not ship either)."""
    try:
        from PIL import Image
    except ImportError as ex:
        raise NotImplementedError(
            f"real decoder for {mime!r} requires Pillow; pass "
            "decode_stub=True"
        ) from ex
    if not (mime or "").startswith("image/"):
        raise NotImplementedError(
            f"real decode for {mime!r} requires ffmpeg; pass decode_stub=True"
        )
    import io as _io

    import numpy as np

    img = Image.open(_io.BytesIO(raw)).convert("L")
    side = int(np.ceil(np.sqrt(dims)))
    px = np.asarray(img.resize((side, side)), dtype=np.float32).ravel()[:dims]
    if len(px) < dims:
        px = np.pad(px, (0, dims - len(px)))
    v = px - px.mean()
    v = v / (np.linalg.norm(v) + 1e-10)
    return [float(x) for x in v]


def _stub_feature(payload: bytes, dims: int) -> list[float]:
    """Deterministic fake feature: md5-seeded pseudo-random unit vector
    (same trick as the mock text embedder — reproducible anywhere)."""
    import numpy as np

    seed = int(hashlib.md5(payload or b"").hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    v = rng.randn(dims).astype(np.float32)
    v = v / (np.linalg.norm(v) + 1e-10)
    return [float(x) for x in v]


def extract_features(
    media: DataFrame, dims: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract each payload via Arrow-batched
    ``mapInPandas`` — one Python worker per partition, payloads never
    leave their executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, checksums, sizes = [], [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                raw = bytes(payload) if payload is not None else b""
                # checksum over the UPPERCASE hex of the payload — md5
                # of a string is portable to any SQL oracle (DuckDB md5
                # accepts only VARCHAR)
                checksums.append(hashlib.md5(raw.hex().upper().encode()).hexdigest())
                sizes.append(len(raw))
                if decode_stub:
                    feats.append(_stub_feature(raw, dims))
                else:
                    feats.append(_real_image_feature(raw, mime, dims))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "checksum": checksums,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    media: DataFrame, target_w: int, target_h: int, decode_stub: bool = True
) -> DataFrame:
    """Image resize stage. Stub: passes payload through and rewrites the
    metadata dims (a real impl decodes → resamples → re-encodes in the
    same batch loop)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not decode_stub:
                # feature-gated REAL path: decode → resample → re-encode
                try:
                    from PIL import Image
                except ImportError as ex:
                    raise NotImplementedError(
                        "real image resize requires Pillow; pass "
                        "decode_stub=True"
                    ) from ex
                import io as _io

                out = []
                for payload, mime in zip(pdf["payload"], pdf["mime"]):
                    # guards matching _real_image_feature: NULL payload
                    # → NULL out; non-image rows raise the intentional
                    # NotImplementedError, not a PIL decode crash
                    if payload is None:
                        out.append(None)
                        continue
                    if not str(mime).startswith("image/"):
                        raise NotImplementedError(
                            f"resize of non-image mime {mime!r}"
                        )
                    img = Image.open(_io.BytesIO(bytes(payload)))
                    buf = _io.BytesIO()
                    img.resize((target_w, target_h)).save(buf, format="PNG")
                    out.append(buf.getvalue())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": out,
                        "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                        "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                }
            )

    return media.select(
        "media_id", "payload", "mime", "width", "height"
    ).mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. Stub
    derives frame count from duration and emits deterministic
    md5-derived frame checksums; a real impl seeks/decodes frames."""

    frame_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("ts_ms", LongType()),
            StructField("frame_checksum", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; pass decode_stub=True"
                )
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_checksum": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                raw = bytes(payload) if payload is not None else b""
                # NULL duration arrives as NaN (nullable int64 →
                # float64 through Arrow); NaN is truthy so `or 0`
                # does NOT guard it and int(NaN // x) raises
                dur = 0 if dur is None or dur != dur else dur
                n = max(1, int(dur // every_ms))
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame_checksum"].append(
                        hashlib.md5(
                            (raw.hex().upper() + "#" + str(i)).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(rows).astype(
                {"frame_idx": "int32", "ts_ms": "int64"}
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, schema=frame_schema
    )


def media_manifest(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation: per-mime counts/bytes — pure codegen
    over the metadata columns, payloads pruned from the scan."""
    return (
        media.groupBy("mime")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.length("payload").cast("long")).alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("width").alias("max_width"),
        )
        .orderBy("mime")
    )


def synthetic_media(spark, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table derived from ``documents`` (the
    container has no real media files): payload = utf-8 text bytes,
    mime cycles image/audio/video, dims/duration derived from lengths.
    Lets every operator above run end-to-end on driver testdata."""
    return docs.select(
        F.concat(F.lit("m:"), F.col(id_col)).alias("media_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.col("n_chars") % 640 + 64).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 48).cast("int").alias("height"),
        (F.col("n_chars").cast("long") * 10).alias("duration_ms"),
    )


def chunk_audio(
    media: DataFrame,
    window_ms: int = 5000,
    hop_ms: int = 2500,
) -> DataFrame:
    """Audio segmentation (the audio analogue of frame sampling): one
    row per overlapping window of ``window_ms`` advanced by ``hop_ms``,
    with the matching byte-range of the payload ACTUALLY sliced
    (byte-rate inferred from payload length / duration — exact for
    fixed-rate PCM; a real impl reads the wav header). All JVM-side:
    ``sequence`` windows + ``substring`` on BINARY — no Python, so the
    stage scales like any codegen projection."""
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(
            (F.col("duration_ms") - F.lit(window_ms)) / F.lit(hop_ms)
        ).cast("int")
        + 1,
    )
    bytes_per_ms = F.length("payload") / F.greatest(F.col("duration_ms"), F.lit(1))
    out = media.filter(F.col("mime").startswith("audio/")).select(
        "media_id",
        "payload",
        "duration_ms",
        bytes_per_ms.alias("bpm"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start_ms = F.col("chunk_idx").cast("long") * hop_ms
    end_ms = F.least(start_ms + window_ms, F.col("duration_ms"))
    start_b = F.floor(start_ms * F.col("bpm")).cast("int")
    # final chunk ends exactly at the payload's last byte: floor(end_ms
    # · bpm) can land one short when length/duration is not binary-
    # representable (e.g. 100/3000 → 99.999…), silently dropping the
    # tail byte from every chunking
    end_b = F.when(
        end_ms >= F.col("duration_ms"), F.length("payload")
    ).otherwise(F.floor(end_ms * F.col("bpm"))).cast("int")
    return out.select(
        "media_id",
        "chunk_idx",
        start_ms.alias("start_ms"),
        end_ms.cast("long").alias("end_ms"),
        F.substring(
            F.col("payload"), start_b + 1, F.greatest(end_b - start_b, F.lit(0))
        ).alias("chunk_payload"),
    )
