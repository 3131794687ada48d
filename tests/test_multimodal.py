"""Multimodal plumbing: binary columns, Arrow-batched decode, resize,
frame sampling. The decode/resize kernels are stubs (no imaging libs
in this container); what's under test is the Spark-side contract —
schemas, batch shapes, determinism, fan-out bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from cgtcalc_data_transformer_spark.operators import multimodal

SF = "/root/testdata/sf0.001"


def test_assets_cover_all_docs(spark):
    assets = multimodal.synthesize_assets(spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert assets.count() == n_docs
    assert dict(assets.dtypes)["payload"] == "binary"
    mods = {r.modality for r in assets.select("modality").distinct().collect()}
    assert mods == set(multimodal.MODALITIES)


def test_decode_deterministic_and_typed(spark):
    a = multimodal.multimodal_decode(spark, SF).collect()
    b = multimodal.multimodal_decode(spark, SF).collect()
    assert a == b
    by_mod = {}
    for r in a:
        by_mod.setdefault(r.modality, r)
    img, aud = by_mod["image"], by_mod["audio"]
    assert img.width >= 16 and img.height >= 16 and img.duration_ms == 0
    assert aud.width == 0 and aud.duration_ms >= 0
    assert all(len(r.feature_hash) == 8 for r in a)


def test_resize_pins_target_dims(spark):
    rows = multimodal.multimodal_resize(spark, SF).collect()
    assert rows, "no image assets"
    assert all(r.target_w == 224 and r.target_h == 224 for r in rows)
    # stub keeps output byte size tied to target area (memory honesty)
    want = (224 * 224) // 64
    assert all(r.resized_bytes == want for r in rows)


def test_frame_sample_bounds(spark):
    frames = multimodal.frame_sample(spark, SF)
    decoded = multimodal.decode_assets(multimodal.synthesize_assets(spark, SF))
    durations = {
        r.asset_id: r.duration_ms
        for r in decoded.filter(F.col("modality") == "video").collect()
    }
    for r in frames.collect():
        assert r.frame_ms <= durations[r.asset_id] + 40_000
        assert r.frame_idx >= 0


def test_feature_extraction_shape_and_determinism(spark):
    from cgtcalc_data_transformer_spark.operators.multimodal import (
        FEATURE_DIM,
        multimodal_features,
    )

    df = multimodal_features(spark, SF)
    feat_cols = [f"f{i}" for i in range(FEATURE_DIM)]
    # scalar-flattened output (driver canon rejects array cells)
    assert feat_cols == [c for c in df.columns if c.startswith("f")]
    rows = df.collect()
    assert rows
    for r in rows[:20]:
        assert abs(r.l1_mass - 1.0) < 1e-6  # non-empty payloads: mass 1
    # deterministic across runs (stub kernel, no RNG)
    again = {
        r.asset_id: tuple(r[c] for c in feat_cols)
        for r in multimodal_features(spark, SF).collect()
    }
    for r in rows:
        assert again[r.asset_id] == tuple(r[c] for c in feat_cols)
