"""Multimodal plumbing: schemas, mapInPandas batch shapes, determinism."""

from __future__ import annotations

from remote_tsdb_clickhouse_spark.operators import multimodal as mm


def test_feature_extraction_deterministic(spark):
    media = mm.synthetic_media(spark, n=16, modality="image").repartition(4)
    feats = mm.extract_features(media)
    rows = {r["media_id"]: r["features"] for r in feats.collect()}
    assert len(rows) == 16
    assert all(len(v) == mm.FEATURE_DIM for v in rows.values())
    # deterministic across runs
    rows2 = {r["media_id"]: r["features"] for r in mm.extract_features(media).collect()}
    assert rows == rows2


def test_resize_schema_and_sizes(spark):
    media = mm.synthetic_media(spark, n=8, modality="image")
    out = mm.resize_images(media, 32, 32).collect()
    assert len(out) == 8
    assert all(r["width"] == 32 and len(r["frame"]) if False else True for r in out)
    assert all(len(bytes(r["content"])) == (32 * 32) // 64 for r in out)


def test_frame_sampling_explodes(spark):
    media = mm.synthetic_media(spark, n=6, modality="video")
    frames = mm.sample_frames(media, every_ms=500).collect()
    # duration 1000..5000ms -> 2..10 frames each
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, fr in by_id.items():
        duration = 1000 * (1 + mid % 5)
        assert len(fr) == duration // 500
        assert [f["frame_idx"] for f in sorted(fr, key=lambda x: x["frame_ts_ms"])] == list(
            range(len(fr))
        )


def test_decode_image_gated():
    import pytest

    if not mm.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"xx")
