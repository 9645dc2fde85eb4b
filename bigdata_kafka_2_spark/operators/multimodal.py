"""Multimodal column plumbing (charter extension).

Images/audio/video are carried as opaque ``binary`` columns with a
typed metadata struct — the lakehouse pattern for multimodal training
data. All Spark-side plumbing here is real and tested: schemas,
Arrow-batched ``mapInPandas`` operator shapes, partition-size
management. The actual media decoding is STUBBED (the container has no
image/audio libraries): ``decode_stub=`` selects a clearly-marked
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
