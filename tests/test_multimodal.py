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


def test_phash_identical_payloads_pair(spark):
    from real_estate_project1_etl_spark.operators.multimodal import (
        phash_near_duplicates,
        synthetic_assets,
    )
    from real_estate_project1_etl_spark.schemas import MEDIA_ASSETS

    base = synthetic_assets(spark, 12)
    img = base.filter("modality = 'image'").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(500, "image", bytes(img.payload), "image/png", 64, 48, None)],
        MEDIA_ASSETS,
    )
    pairs = phash_near_duplicates(base.union(dup)).collect()
    assert any(
        {p.id_a, p.id_b} == {img.asset_id, 500} and p.hamming == 0
        for p in pairs
    )


def test_phash_pigeonhole_finds_exactly_k_flips(spark):
    # plant two payloads whose stub pixels differ in exactly 3 positions
    # far from the mean -> hamming exactly 3, must be found (pigeonhole:
    # one 16-bit chunk of 4 is intact); a pair with ~half the bits
    # different must NOT pass the verify
    from real_estate_project1_etl_spark.operators.multimodal import (
        phash_near_duplicates,
    )
    from real_estate_project1_etl_spark.schemas import MEDIA_ASSETS

    lo, hi = 10, 200
    base_px = [lo if i % 2 else hi for i in range(64)]  # mean ~105
    flip3 = list(base_px)
    for i in (3, 21, 55):  # flip pixels across 3 different 16-bit chunks
        flip3[i] = hi if flip3[i] == lo else lo
    far = [hi if i < 32 else lo for i in range(64)]
    rows = [
        (1, "image", bytes(base_px), "image/png", 64, 48, None),
        (2, "image", bytes(flip3), "image/png", 64, 48, None),
        (3, "image", bytes(far), "image/png", 64, 48, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_ASSETS)
    pairs = {(p.id_a, p.id_b): p.hamming for p in phash_near_duplicates(df).collect()}
    assert pairs.get((1, 2)) == 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_no_payload_shuffle_plan(spark):
    # the banded join moves only (asset_id, phash, band, key) — the binary
    # payload must not appear in any exchange
    from real_estate_project1_etl_spark.operators.multimodal import (
        phash_near_duplicates,
        synthetic_assets,
    )

    df = phash_near_duplicates(synthetic_assets(spark, 24))
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "payload" not in m.group(0)


# ---------------------------------------------------------------------------
# injectable codec seam (round-11 verdict item 8): a PIL/av-equipped
# environment plugs real decoders in via MediaCodec without touching
# engine code. These fakes stand in for real codecs; each produces
# output RECOGNIZABLY different from STUB_CODEC's, so the assertions
# prove the injected callbacks actually ran inside the executor-side
# Arrow batches (not the defaults).
# ---------------------------------------------------------------------------

def _fake_codec():
    # NESTED defs, not module-level: cloudpickle serializes closures by
    # VALUE, while a test-module top-level function is pickled by
    # reference and the executor worker cannot import `test_multimodal`.
    # (Production codecs live in an importable module, so by-reference
    # is fine there — the MediaCodec docstring's "top-level picklable"
    # contract means top-level of an importable module.)
    from real_estate_project1_etl_spark.operators.multimodal import (
        FEATURE_DIM,
        MediaCodec,
    )

    def fake_embed(payload: bytes, modality: str) -> list:
        # feature = payload length, repeated — checkable driver-side
        return [float(len(payload or b""))] * FEATURE_DIM

    def fake_pixels(payload: bytes, n: int) -> list:
        # planted half-dark half-bright grid: aHash bits are exactly the
        # top half regardless of payload -> every image pair collides
        return [0] * (n // 2) + [255] * (n - n // 2)

    def fake_frame(payload: bytes, frame_idx: int, ts_ms: int) -> bytes:
        return bytes([frame_idx % 256]) + (payload or b"")[:2]

    def fake_thumb(payload: bytes, new_w: int, new_h: int) -> bytes:
        # one byte LONGER than the stub's new_w*new_h: proves the codec
        # owns the output bytes, engine does no slicing of its own
        return b"T" * (new_w * new_h + 1)

    return MediaCodec(
        embed=fake_embed,
        pixels=fake_pixels,
        frame=fake_frame,
        thumbnail=fake_thumb,
    )


def test_injected_codec_end_to_end(spark):
    # decode -> frame-sample -> resize through ONE injected codec, over
    # the same asset table, engine code untouched
    from real_estate_project1_etl_spark.operators.multimodal import (
        extract_features,
        resize_images,
        sample_video_frames,
        synthetic_assets,
    )

    codec = _fake_codec()
    assets = synthetic_assets(spark, 24)
    sizes = {r.asset_id: len(r.payload) for r in assets.collect()}

    # decode/featurize: feature vector is the injected embed's output
    feats = extract_features(assets, codec=codec).collect()
    assert len(feats) == 24
    for r in feats:
        assert r.feature == [float(sizes[r.asset_id])] * FEATURE_DIM

    # frame-sample: frame bytes come from the injected frame() (3 bytes:
    # idx + first 2 payload bytes), featurized by the injected embed()
    frames = sample_video_frames(
        assets, every_ms=1000, max_frames=3, codec=codec
    ).collect()
    assert frames
    for r in frames:
        assert r.frame_feature == [3.0] * FEATURE_DIM

    # resize: thumb is the codec's output verbatim (stub would emit
    # exactly new_w*new_h bytes; the fake emits one more)
    thumbs = resize_images(assets, max_side=32, codec=codec).collect()
    assert thumbs
    for r in thumbs:
        assert bytes(r.thumb) == b"T" * (r.new_w * r.new_h + 1)


def test_injected_codec_drives_phash(spark):
    from real_estate_project1_etl_spark.operators.multimodal import (
        perceptual_hashes,
        phash_near_duplicates,
        synthetic_assets,
    )

    codec = _fake_codec()
    assets = synthetic_assets(spark, 12)
    images = assets.filter(F.col("modality") == "image")
    n_img = images.count()
    assert n_img >= 2

    # planted pixel grid -> identical phash for every image: bits 32..63
    hashes = {r.asset_id: r.phash for r in
              perceptual_hashes(assets, codec=codec).collect()}
    expected = 0
    for i in range(32, 64):
        expected |= 1 << i
    expected -= 1 << 64  # signed int64
    assert set(hashes.values()) == {expected}

    # so EVERY image pair is a hamming-0 near-duplicate
    pairs = phash_near_duplicates(assets, max_hamming=0, codec=codec).collect()
    assert len(pairs) == n_img * (n_img - 1) // 2
    assert all(r.hamming == 0 for r in pairs)


def test_default_codec_is_stub(spark):
    # the oracle-compared queries pin STUB_CODEC's exact bytes: the
    # default-arg path must equal an explicit STUB_CODEC pass
    from real_estate_project1_etl_spark.operators.multimodal import (
        STUB_CODEC,
        extract_features,
        synthetic_assets,
    )

    assets = synthetic_assets(spark, 9)
    d = {r.asset_id: r.feature for r in extract_features(assets).collect()}
    e = {r.asset_id: r.feature
         for r in extract_features(assets, codec=STUB_CODEC).collect()}
    assert d == e
