"""Multimodal column plumbing (charter extension).

Images/audio/video are carried as opaque ``binary`` columns with a
typed metadata struct — the lakehouse pattern for multimodal training
data. All Spark-side plumbing here is real and tested: schemas,
Arrow-batched ``mapInPandas`` operator shapes, partition-size
management. Decoding comes in two tiers (r8):

- :func:`probe_media` REALLY decodes the formats the Python stdlib
  can parse — BMP and WAV down to the actual pixels/samples, PNG via
  zlib-inflate + scanline unfiltering, JPEG dimensions from the SOF
  header — no external libraries, hash-checked end-to-end through a
  synthesize→parse round-trip (q113).
- The codec-library surface (JPEG pixel decode, non-PCM audio, video
  containers) is STUBBED: ``decode_stub=`` selects a clearly-marked
  deterministic fake; passing ``decode_stub=None`` raises
  ``NotImplementedError`` at the decode site, which is where a real
  pillow/ffmpeg call would slot in.

Scale notes: binary payloads make rows wide — the operators keep
metadata projections separate from payload scans (column pruning means
a metadata-only query never reads the bytes), and
``repartition_for_payloads`` sizes partitions by payload bytes rather
than row count so Arrow batches stay within executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal asset schema: payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_OUT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract over payload binaries via
    ``mapInPandas`` (Arrow batches; never row-at-a-time Python).

    Output: (asset_id, modality, n_bytes, feature array<float>). With a
    real decoder, only the UDF body changes — the operator shape
    (schema, batching, partitioning) is what this engine provides.

    NOTE all UDF bodies in this module are self-contained (helpers
    nested, stdlib-only imports): cloudpickle then ships them by VALUE,
    so Python workers need no access to this package on their path —
    required when the harness runs queries from outside the repo.
    """
    dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def fake_decode(payload: bytes) -> list[float]:
            # DETERMINISTIC FAKE decode — stands in for pillow/ffmpeg +
            # embed; sha256 expanded to `dim` floats in [0, 1).
            h = _hl.sha256(payload or b"").digest()
            return [
                float(h[(2 * i) % len(h)] * 256 + h[(2 * i + 1) % len(h)]) / 65536.0
                for i in range(dim)
            ]

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires pillow/ffmpeg — not in "
                    "this container; use decode_stub=True"
                )
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "feature": payloads.map(
                        lambda p: fake_decode(bytes(p) if p is not None else b"")
                    ),
                }
            )

    return df.mapInPandas(run, schema=_FEATURES_OUT_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, decode_stub: bool = True) -> DataFrame:
    """Image resize operator shape: payload → payload', meta.width/height
    updated. Stub transform: payload truncated/padded to a
    deterministic function of (payload, w, h) — REAL pipelines replace
    the body with pillow; the schema contract is the deliverable."""

    out_schema = ASSET_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real resize requires pillow")

            def fake_resize(p):
                if p is None:
                    return None
                seed = hashlib.sha256(
                    bytes(p) + f"{width}x{height}".encode()
                ).digest()
                return seed * max(1, (width * height) // len(seed))

            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(fake_resize)
            pdf["meta"] = pdf["meta"].map(
                lambda m: {
                    **(m if isinstance(m, dict) else {}),
                    "width": width,
                    "height": height,
                }
            )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Video frame-sampling operator shape: one row in → N frame rows
    out (flat-map via ``mapInPandas``). Frame count derives from
    ``meta.duration_ms``; each frame gets a deterministic pseudo-payload."""

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            out = {"asset_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_payload": []}
            for _, row in pdf.iterrows():
                meta = row["meta"]
                dur = (meta or {}).get("duration_ms") or 0
                n = max(int(dur // every_ms), 0)
                for i in range(n):
                    out["asset_id"].append(row["asset_id"])
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame_payload"].append(
                        hashlib.sha256(
                            bytes(row["payload"] or b"") + i.to_bytes(4, "big")
                        ).digest()
                    )
            yield pd.DataFrame(out)

    return df.filter(F.col("modality") == "video").mapInPandas(run, schema=out_schema)


def repartition_for_payloads(
    df: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Partition by payload VOLUME, not row count.

    Media rows vary by orders of magnitude; row-count partitioning
    makes some Arrow batches blow past executor memory at scale. Uses a
    cheap driver-side size estimate (sum of payload lengths) to choose
    the partition count.
    """
    total = df.select(
        F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("b")
    ).collect()[0].b or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n)


_PROBE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def probe_media(df: DataFrame) -> DataFrame:
    """REAL media decoding for the formats the Python stdlib can parse
    — no pillow/ffmpeg required, no stub:

    - **BMP** (uncompressed 24/32-bit): dimensions + mean luma over
      the actual pixels (BITMAPINFOHEADER + raster parse).
    - **PNG** (8-bit gray/RGB/RGBA, non-interlaced): dimensions from
      IHDR, mean luma over the real pixels — IDAT zlib-inflated and
      all five scanline filters (None/Sub/Up/Average/Paeth)
      reversed in pure Python.
    - **JPEG**: dimensions from the SOF marker scan (header-only —
      entropy-coded pixel decode genuinely needs a codec library and
      stays out of stdlib reach).
    - **WAV** (RIFF PCM 8/16-bit): sample rate, channels, duration,
      RMS amplitude over the actual samples.

    Unrecognized/corrupt payloads come back with ``format='unknown'``
    and NULL stats — a probe, not a validator. Runs as Arrow-batched
    ``mapInPandas`` with a self-contained body (struct/zlib only), the
    same operator shape a pillow/ffmpeg-backed prober would use; the
    remaining stubbed surface is exactly the codec-library formats
    (JPEG pixels, non-PCM audio, video containers).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _st
        import zlib as _zl

        import pandas as _pd

        def _png_unfilter(raw, w, h, bpp):
            stride = w * bpp
            out = bytearray()
            prev = bytearray(stride)
            pos = 0
            for _ in range(h):
                ft = raw[pos]
                pos += 1
                line = bytearray(raw[pos:pos + stride])
                pos += stride
                if ft == 1:  # Sub
                    for i in range(bpp, stride):
                        line[i] = (line[i] + line[i - bpp]) & 0xFF
                elif ft == 2:  # Up
                    for i in range(stride):
                        line[i] = (line[i] + prev[i]) & 0xFF
                elif ft == 3:  # Average
                    for i in range(stride):
                        a = line[i - bpp] if i >= bpp else 0
                        line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
                elif ft == 4:  # Paeth
                    for i in range(stride):
                        a = line[i - bpp] if i >= bpp else 0
                        b = prev[i]
                        c = prev[i - bpp] if i >= bpp else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        line[i] = (line[i] + pr) & 0xFF
                out += line
                prev = line
            return bytes(out)

        def probe(p):
            none = {
                "format": "unknown", "width": None, "height": None,
                "sample_rate": None, "n_channels": None,
                "duration_ms": None, "mean_luma": None, "rms": None,
            }
            if not p:
                return none
            b = bytes(p)
            try:
                if b[:2] == b"BM" and len(b) >= 54:
                    off, = _st.unpack_from("<I", b, 10)
                    w, h = _st.unpack_from("<ii", b, 18)
                    bits, = _st.unpack_from("<H", b, 28)
                    comp, = _st.unpack_from("<I", b, 30)
                    d = dict(none, format="bmp", width=abs(w), height=abs(h))
                    if comp == 0 and bits in (24, 32):
                        bpp = bits // 8
                        row = (abs(w) * bpp + 3) & ~3
                        tot = n = 0
                        for y in range(abs(h)):
                            base = off + y * row
                            for x in range(abs(w)):
                                i = base + x * bpp
                                bl, g, r = b[i], b[i + 1], b[i + 2]
                                tot += 0.299 * r + 0.587 * g + 0.114 * bl
                                n += 1
                        if n:
                            d["mean_luma"] = round(tot / n, 4)
                    return d
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    w, h = _st.unpack_from(">II", b, 16)
                    depth, ctype = b[24], b[25]
                    interlace = b[28]
                    d = dict(none, format="png", width=w, height=h)
                    if depth == 8 and interlace == 0 and ctype in (0, 2, 6):
                        idat = b""
                        pos = 8
                        while pos + 8 <= len(b):
                            ln, = _st.unpack_from(">I", b, pos)
                            typ = b[pos + 4:pos + 8]
                            if typ == b"IDAT":
                                idat += b[pos + 8:pos + 8 + ln]
                            pos += 12 + ln
                            if typ == b"IEND":
                                break
                        bpp = {0: 1, 2: 3, 6: 4}[ctype]
                        px = _png_unfilter(_zl.decompress(idat), w, h, bpp)
                        tot = n = 0
                        for i in range(0, len(px), bpp):
                            if bpp == 1:
                                tot += px[i]
                            else:
                                tot += (0.299 * px[i] + 0.587 * px[i + 1]
                                        + 0.114 * px[i + 2])
                            n += 1
                        if n:
                            d["mean_luma"] = round(tot / n, 4)
                    return d
                if b[:2] == b"\xff\xd8":
                    pos = 2
                    while pos + 9 < len(b):
                        if b[pos] != 0xFF:
                            pos += 1
                            continue
                        marker = b[pos + 1]
                        if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                            h, w = _st.unpack_from(">HH", b, pos + 5)
                            return dict(
                                none, format="jpeg", width=w, height=h
                            )
                        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                            pos += 2
                            continue
                        ln, = _st.unpack_from(">H", b, pos + 2)
                        pos += 2 + ln
                    return dict(none, format="jpeg")
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    pos = 12
                    fmt = None
                    data = None
                    while pos + 8 <= len(b):
                        cid = b[pos:pos + 4]
                        ln, = _st.unpack_from("<I", b, pos + 4)
                        if cid == b"fmt ":
                            fmt = b[pos + 8:pos + 8 + ln]
                        elif cid == b"data":
                            data = b[pos + 8:pos + 8 + ln]
                        pos += 8 + ln + (ln & 1)
                    if fmt is None:
                        return dict(none, format="wav")
                    audio_fmt, nch, rate = _st.unpack_from("<HHI", fmt, 0)
                    bits, = _st.unpack_from("<H", fmt, 14)
                    d = dict(
                        none, format="wav", sample_rate=rate, n_channels=nch
                    )
                    if data is not None and audio_fmt == 1 and bits in (8, 16):
                        step = bits // 8
                        n = len(data) // (step * max(nch, 1))
                        d["duration_ms"] = int(n * 1000 // max(rate, 1))
                        tot = 0.0
                        cnt = 0
                        if bits == 16:
                            for i in range(0, len(data) - 1, 2):
                                v, = _st.unpack_from("<h", data, i)
                                tot += (v / 32768.0) ** 2
                                cnt += 1
                        else:
                            for i in range(len(data)):
                                v = (data[i] - 128) / 128.0
                                tot += v * v
                                cnt += 1
                        if cnt:
                            d["rms"] = round((tot / cnt) ** 0.5, 4)
                    return d
            except Exception:
                return none
            return none

        for pdf in batches:
            stats = [probe(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    **{
                        k: [s[k] for s in stats]
                        for k in (
                            "format", "width", "height", "sample_rate",
                            "n_channels", "duration_ms", "mean_luma", "rms",
                        )
                    },
                }
            )

    return df.mapInPandas(run, schema=_PROBE_OUT_SCHEMA)


def synthesize_assets(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Write REAL media bytes from parameter columns — the test-data
    generator dual of :func:`probe_media`: rows with
    ``modality='image'`` become genuine uncompressed 24-bit BMP files
    (``width``×``height``, solid gray ``luma``), ``modality='audio'``
    genuine 16-bit PCM WAV files (``sample_rate``, ``n_samples``,
    alternating ±``amplitude`` square wave). Construction
    (``struct.pack`` writers) and parsing (:func:`probe_media`) are
    independent code paths, so probing a synthesized asset is a real
    encode→decode round-trip, not a self-fulfilling stub.

    Input columns: (id, modality, width, height, luma, sample_rate,
    n_samples, amplitude) — unused params may be NULL. Output:
    ``ASSET_SCHEMA``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _st

        import pandas as _pd

        def bmp(w, h, gray):
            w, h, gray = int(w), int(h), int(gray)
            row = (w * 3 + 3) & ~3
            px = bytearray()
            for _ in range(h):
                line = bytes([gray, gray, gray] * w)
                px += line + b"\x00" * (row - len(line))
            head = _st.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
            head += _st.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0
            )
            return bytes(head + px)

        def wav(rate, n, amp):
            rate, n, amp = int(rate), int(n), int(amp)
            frames = b"".join(
                _st.pack("<h", amp if i % 2 == 0 else -amp) for i in range(n)
            )
            hdr = b"RIFF" + _st.pack("<I", 36 + len(frames)) + b"WAVE"
            hdr += b"fmt " + _st.pack(
                "<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16
            )
            hdr += b"data" + _st.pack("<I", len(frames))
            return hdr + frames

        for pdf in batches:
            payloads = []
            metas = []
            mimes = []
            for _, r in pdf.iterrows():
                if r["modality"] == "image":
                    payloads.append(bmp(r["width"], r["height"], r["luma"]))
                    mimes.append("image/bmp")
                    metas.append(
                        {"width": int(r["width"]), "height": int(r["height"]),
                         "duration_ms": None, "sample_rate": None}
                    )
                else:
                    payloads.append(
                        wav(r["sample_rate"], r["n_samples"], r["amplitude"])
                    )
                    mimes.append("audio/wav")
                    metas.append(
                        {"width": None, "height": None,
                         "duration_ms": int(
                             r["n_samples"] * 1000 // r["sample_rate"]
                         ),
                         "sample_rate": int(r["sample_rate"])}
                    )
            yield _pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "modality": pdf["modality"],
                    "mime_type": mimes,
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.mapInPandas(run, schema=ASSET_SCHEMA)
