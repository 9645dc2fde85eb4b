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


def _bmp_bytes(w, h, rgb):
    """Minimal uncompressed 24-bit BMP with every pixel = rgb."""
    import struct

    row = (w * 3 + 3) & ~3
    pixels = bytearray()
    r, g, b = rgb
    for _ in range(h):
        line = bytes([b, g, r] * w)
        pixels += line + b"\x00" * (row - len(line))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0
    )
    return bytes(header + pixels)


def _png_bytes(w, h, gray, filters=(0,)):
    """8-bit grayscale PNG, constant value, cycling scanline filters."""
    import struct
    import zlib

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes([gray] * w)
    for y in range(h):
        ft = filters[y % len(filters)]
        line = bytes([gray] * w)
        if ft == 0:
            enc = line
        elif ft == 1:  # Sub
            enc = bytes([(line[i] - (line[i - 1] if i else 0)) & 0xFF for i in range(w)])
        elif ft == 2:  # Up
            enc = bytes([(line[i] - prev[i]) & 0xFF for i in range(w)])
        else:
            raise ValueError(ft)
        raw += bytes([ft]) + enc
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _wav_bytes(rate, seconds, amplitude):
    """16-bit mono PCM square wave via the stdlib wave module."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        n = int(rate * seconds)
        frames = b"".join(
            struct.pack("<h", amplitude if i % 2 == 0 else -amplitude)
            for i in range(n)
        )
        wf.writeframes(frames)
    return buf.getvalue()


def _jpeg_header_bytes(w, h):
    """Minimal JPEG prefix: SOI + APP0 + SOF0 carrying dimensions."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 1, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof


def test_probe_media_real_stdlib_decode(spark):
    """probe_media REALLY decodes BMP/PNG/WAV (pixels and samples, not
    just headers) and parses JPEG dimensions — no stub, no external
    libs; garbage comes back 'unknown'."""
    from bigdata_kafka_2_spark.operators.multimodal import probe_media

    rows = [
        (1, "image", "image/bmp", _bmp_bytes(4, 3, (255, 0, 0)), None),
        (2, "image", "image/png", _png_bytes(5, 4, 100, filters=(0, 1, 2)), None),
        (3, "image", "image/jpeg", _jpeg_header_bytes(640, 480), None),
        (4, "audio", "audio/wav", _wav_bytes(8000, 0.5, 16384), None),
        (5, "image", None, b"not really an image", None),
        (6, "image", None, None, None),
    ]
    df = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    got = {r.asset_id: r.asDict() for r in probe_media(df).collect()}

    assert got[1]["format"] == "bmp"
    assert (got[1]["width"], got[1]["height"]) == (4, 3)
    # all-red: luma = 0.299*255
    assert abs(got[1]["mean_luma"] - 0.299 * 255) < 0.01

    assert got[2]["format"] == "png"
    assert (got[2]["width"], got[2]["height"]) == (5, 4)
    assert got[2]["mean_luma"] == 100.0  # constant gray, filters reversed

    assert got[3]["format"] == "jpeg"
    assert (got[3]["width"], got[3]["height"]) == (640, 480)
    assert got[3]["mean_luma"] is None  # honest: pixel decode needs a codec

    assert got[4]["format"] == "wav"
    assert got[4]["sample_rate"] == 8000
    assert got[4]["n_channels"] == 1
    assert got[4]["duration_ms"] == 500
    # full-scale square wave at 16384/32768 -> rms = 0.5
    assert abs(got[4]["rms"] - 0.5) < 0.001

    assert got[5]["format"] == "unknown"
    assert got[6]["format"] == "unknown"
