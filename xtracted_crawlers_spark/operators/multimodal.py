"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features derived from the bytes) behind
``decode_available()`` — the Spark-side plumbing (schemas, batch shapes,
partitioning, UDF signatures) is real and tested, and a real decoder
drops into ``_decode_image_real`` without touching the plan.

The stub hashes are md5 (not sha1) and the feature fingerprint is a hex
substring of a second md5, so the ENTIRE operator output — dims, digest,
feature fingerprint, frame signatures — is reproducible in ANSI SQL
(DuckDB md5 over the same UTF-8 bytes) and the driver value-hash-checks
it instead of the weaker rows-only check.

Scale notes: media bytes dominate row size, so the stage uses
mapInPandas (streaming batches, no pivot through a single pandas UDF
row), repartitions by a size-aware key, and never collects bytes to the
driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("bytes", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, digest string, "
    "feat_fp string, feat array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_digest string"


def decode_available() -> bool:
    """True when a real image codec is importable; the sandbox has none."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_real(b: bytes) -> tuple[int, int, int]:
    raise NotImplementedError(
        "real image decode requires an image codec (PIL/libvips) not present "
        "in this environment; the pipeline uses the deterministic stub"
    )


def _decode_image_stub(b: bytes) -> tuple[int, int, int]:
    """Deterministic fake (width, height, channels) from the bytes."""
    n = len(b)
    w = 16 + (b[0] if n else 0) % 240
    h = 16 + (b[-1] if n else 0) % 240
    return w, h, 3


def image_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract stage over image rows: mapInPandas so each
    Arrow batch streams through without building a row-sized pandas cell
    copy per column reference.

    Output per image: (width, height, channels) from the decoder,
    ``digest`` = md5 of the bytes, ``feat`` = feat_dim floats in [0, 1)
    derived from md5(bytes + '#feat'), and ``feat_fp`` = the 2*feat_dim-hex
    fingerprint those floats decode from (hashable contract form of the
    float array)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                b = bytes(b) if b is not None else b""
                if decode_available():
                    w, h, c = _decode_image_real(b)  # pragma: no cover
                else:
                    w, h, c = _decode_image_stub(b)
                digest = hashlib.md5(b).hexdigest()
                # fake embedding: hex-pair bytes of a second digest, scaled
                fhex = hashlib.md5(b + b"#feat").hexdigest()[: 2 * feat_dim]
                feat = [int(fhex[2 * i : 2 * i + 2], 16) / 255.0 for i in range(feat_dim)]
                rows.append((int(mid), w, h, c, digest, fhex, feat))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels", "digest", "feat_fp", "feat"],
            )

    return media.filter(F.col("kind") == "image").select("media_id", "bytes").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling stub: one 'frame' signature (md5 of the byte
    window) per window — the real variant swaps the signature for a
    decoded keyframe."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                b = bytes(b) if b is not None else b""
                n_frames = min(max_frames, max(1, len(b) // every_n_bytes))
                for k in range(n_frames):
                    chunk = b[k * every_n_bytes : (k + 1) * every_n_bytes]
                    rows.append((int(mid), k, hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_digest"])

    return media.filter(F.col("kind") == "video").select("media_id", "bytes").mapInPandas(
        run, FRAME_SAMPLE_SCHEMA
    )


def gen_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                blob = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 5)
                rows.append((i, kind, blob, {"src": f"synthetic:{i}"}))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "bytes", "meta"])

    return spark.range(n).mapInPandas(render, MEDIA_SCHEMA)
