"""Multimodal plumbing: binary payload -> Arrow-batched feature extraction
and frame sampling (decode stage stubbed, plan real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_video_frames,
    synthetic_assets,
)


def test_extract_features(spark):
    assets = synthetic_assets(spark, 64)
    feats = extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 64
    for r in rows:
        assert len(r.feature) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.feature)
        assert len(r.payload_sha256) == 64
    # deterministic across runs
    again = {r.asset_id: r.payload_sha256 for r in extract_features(assets).collect()}
    assert again == {r.asset_id: r.payload_sha256 for r in rows}


def test_features_join_back_without_payload_shuffle(spark):
    assets = synthetic_assets(spark, 30)
    feats = extract_features(assets).drop("modality")
    joined = assets.select("asset_id", "mime_type").join(feats, "asset_id")
    assert joined.count() == 30


def test_frame_sampling(spark):
    assets = synthetic_assets(spark, 30)
    frames = sample_video_frames(assets, every_ms=1000, max_frames=4)
    pdf = frames.toPandas()
    n_videos = assets.filter(F.col("modality") == "video").count()
    assert set(pdf.asset_id.unique()) == {
        r.asset_id for r in assets.filter(F.col("modality") == "video").collect()
    }
    assert pdf.groupby("asset_id").size().max() <= 4
    assert (pdf.ts_ms == pdf.frame_idx * 1000).all()
    assert n_videos > 0


def test_resize_preserves_aspect_and_sizes_thumb(spark):
    from real_estate_project1_etl_spark.operators.multimodal import (
        resize_images,
        synthetic_assets,
    )

    out = resize_images(synthetic_assets(spark, 12), max_side=32).collect()
    assert out  # 1/3 of fixtures are images
    for r in out:
        assert (r.orig_w, r.orig_h) == (64, 48)
        assert (r.new_w, r.new_h) == (32, 24)  # aspect preserved, capped
        assert len(r.thumb) == r.new_w * r.new_h
    # never upscale: a small image keeps its dims
    small = resize_images(synthetic_assets(spark, 12), max_side=1024).collect()
    assert all((r.new_w, r.new_h) == (64, 48) for r in small)
