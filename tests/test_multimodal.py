"""Multimodal pipeline tests: stub determinism, batch shapes, the
NotImplementedError contract for real decoders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastpyvectordb_spark.operators.multimodal import (
    extract_features,
    media_manifest,
    resize_images,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark, documents):
    return synthetic_media(spark, documents).cache()


def test_feature_extraction_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media.limit(20), dims=8).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media.limit(20), dims=8).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    # unit-normalized
    for v in a.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5


def test_real_decoder_contract_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|real decoder"):
        extract_features(media.limit(2), decode_stub=False).collect()


def test_resize_rewrites_dims(media):
    out = resize_images(media.limit(5), 224, 224).collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    # payload passes through untouched in the stub
    orig = {r["media_id"]: bytes(r["payload"]) for r in media.limit(5).collect()}
    assert all(bytes(r["payload"]) == orig[r["media_id"]] for r in out)


def test_frame_sampling_counts(media):
    vid = media.filter(F.col("mime") == "video/mp4")
    frames = sample_frames(vid, every_ms=1000)
    per = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    durs = {r["media_id"]: r["duration_ms"] for r in vid.collect()}
    for mid, n in per.items():
        assert n == max(1, durs[mid] // 1000)


def test_manifest_prunes_payload(media):
    plan = media_manifest(media)._jdf.queryExecution().executedPlan().toString()
    # payload may appear only for length; manifest runs without
    # collecting payloads to the driver
    rows = media_manifest(media).collect()
    assert {r["mime"] for r in rows} == {"audio/wav", "image/png", "video/mp4"}
    assert all(r["total_bytes"] > 0 for r in rows)


def test_real_decode_paths_gated(spark):
    """decode_stub=False paths are feature-gated: they run for real
    wherever Pillow is installed and raise NotImplementedError when it
    is absent (this sandbox). Skipped, not failed, without the lib."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from fastpyvectordb_spark.operators.multimodal import (
        extract_features, resize_images,
    )

    buf = io.BytesIO()
    Image.new("RGB", (10, 10), (200, 30, 60)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [("m1", "image/png", bytearray(buf.getvalue()), 10, 10, None)],
        "media_id string, mime string, payload binary, width int, "
        "height int, duration_ms long",
    )
    feats = extract_features(df, dims=16, decode_stub=False).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 16
    out = resize_images(df, 4, 4, decode_stub=False).collect()
    assert out[0]["width"] == 4
    resized = Image.open(io.BytesIO(bytes(out[0]["payload"])))
    assert resized.size == (4, 4)


# ---------------------------------------------------------------------------
# sharded corpus export (delivery sink)
# ---------------------------------------------------------------------------

def test_export_sharded_layout_and_manifest(spark, tmp_path):
    from fastpyvectordb_spark.operators.export import (
        export_manifest, export_sharded,
    )
    from fastpyvectordb_spark.operators.textanalysis import (
        deterministic_split_expr,
    )
    from fastpyvectordb_spark.tables import load_table
    import os

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").withColumn(
        "split",
        deterministic_split_expr(
            F.col("doc_id"), {"train": 90, "val": 5, "test": 5}
        ),
    )
    out = str(tmp_path / "corpus")
    export_sharded(
        docs, out, partition_by=["split", "lang"],
        max_records_per_file=20, shuffle_by_keys=True,
    )
    # hive layout: split=*/lang=* directories
    top = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert top, os.listdir(out)
    sub = os.listdir(os.path.join(out, top[0]))
    assert any(d.startswith("lang=") for d in sub)

    # round-trip: nothing lost, shard bound respected
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    man = export_manifest(spark, out)
    rows = man.collect()
    assert set(man.columns) >= {"n_rows", "n_files"}
    assert sum(r["n_rows"] for r in rows) == docs.count()
    # 20-record cap → every partition dir has ceil(n_rows/20) or more files
    for r in rows:
        assert r["n_files"] >= (r["n_rows"] + 19) // 20
