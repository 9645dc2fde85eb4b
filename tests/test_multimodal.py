"""Multimodal plumbing tests: schema round-trip, Arrow batch shapes,
deterministic stub decode, flat-map frame sampling, NotImplementedError
gate for real decoding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (0, "image", "image/png", b"\x89PNG-fake-0", {"width": 64, "height": 48, "duration_ms": None, "sample_rate": None}),
        (1, "image", "image/png", b"\x89PNG-fake-1", {"width": 32, "height": 32, "duration_ms": None, "sample_rate": None}),
        (2, "audio", "audio/wav", b"RIFF-fake", {"width": None, "height": None, "duration_ms": 2500, "sample_rate": 16000}),
        (3, "video", "video/mp4", b"mp4-fake", {"width": 640, "height": 480, "duration_ms": 3500, "sample_rate": None}),
        (4, "image", "image/png", None, {"width": None, "height": None, "duration_ms": None, "sample_rate": None}),
    ]
    return spark.createDataFrame(rows, MM.ASSET_SCHEMA)


def test_feature_extraction_deterministic(assets):
    out1 = MM.extract_features(assets).orderBy("asset_id").collect()
    out2 = MM.extract_features(assets).orderBy("asset_id").collect()
    assert [r.feature for r in out1] == [r.feature for r in out2]
    assert all(len(r.feature) == MM.FEATURE_DIM for r in out1)
    assert out1[0].n_bytes == len(b"\x89PNG-fake-0")
    assert out1[4].n_bytes == 0  # null payload handled
    # different payloads → different features
    assert out1[0].feature != out1[1].feature


def test_resize_updates_meta_and_payload(assets):
    out = (
        MM.resize_images(assets.filter(F.col("modality") == "image"), 16, 16)
        .orderBy("asset_id")
        .collect()
    )
    assert all(r.meta.width == 16 and r.meta.height == 16 for r in out)
    assert out[0].payload is not None and out[0].payload != b"\x89PNG-fake-0"
    assert out[2].payload is None  # null payload stays null


def test_frame_sampling_flatmap(assets):
    frames = MM.sample_frames(assets, every_ms=1000).orderBy("frame_idx").collect()
    # video asset 3: 3500ms → 3 frames at 0/1000/2000
    assert [r.frame_idx for r in frames] == [0, 1, 2]
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000]
    assert all(r.asset_id == 3 for r in frames)
    assert len({bytes(r.frame_payload) for r in frames}) == 3


def test_real_decode_gate_raises(assets):
    with pytest.raises(Exception) as ei:
        MM.extract_features(assets, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_metadata_only_query_prunes_payload(assets, tmp_path):
    # metadata projections must not read payload bytes: check the
    # optimized plan's ReadSchema excludes `payload`
    p = str(tmp_path / "assets_parquet")
    assets.write.mode("overwrite").parquet(p)
    spark = assets.sparkSession
    q = spark.read.parquet(p).select("asset_id", "modality", "meta.width")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_repartition_for_payloads(assets):
    out = MM.repartition_for_payloads(assets, target_partition_bytes=8)
    assert out.count() == 5
    assert out.rdd.getNumPartitions() >= 2
