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
from pyspark.sql import DataFrame, Window
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
    """True when a COMPRESSED-format codec (PIL) is importable; the
    sandbox has none. Uncompressed BMP/PPM decode needs only numpy and is
    always available — see decode_image()."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_real(b: bytes) -> tuple[int, int, int]:
    raise NotImplementedError(
        "compressed image decode (JPEG/PNG/...) requires a codec "
        "(PIL/libvips) not present in this environment; uncompressed "
        "BMP/PPM decode works codec-free via decode_image(), everything "
        "else uses the deterministic stub"
    )


def _decode_image_stub(b: bytes) -> tuple[int, int, int]:
    """Deterministic fake (width, height, channels) from the bytes."""
    n = len(b)
    w = 16 + (b[0] if n else 0) % 240
    h = 16 + (b[-1] if n else 0) % 240
    return w, h, 3


# -- codec-free real decode (round-3 verdict #7) ----------------------------
# 24-bit uncompressed BMP and binary PPM (P6) are pure byte layouts — a
# numpy frombuffer + reshape decodes them with no image library, so the
# REAL pixel path (decode → per-channel statistics → feature vector) is
# exercised end-to-end through the mapInPandas stage in this sandbox.
# Anything unrecognized (or malformed) falls back to the deterministic
# stub, which is what the synthetic contract media always hits — the
# driver oracles are unaffected.


def _decode_bmp(b: bytes):
    """(w, h, 3, pixels HxWx3 uint8 RGB) for a 24-bit uncompressed BMP;
    None if the header says anything else."""
    import numpy as np

    if len(b) < 54:
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0
    h = abs(h)
    row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if off + row * h > len(b):
        return None
    arr = np.frombuffer(b, np.uint8, row * h, off).reshape(h, row)[:, : w * 3]
    arr = arr.reshape(h, w, 3)
    if flip:  # positive height = bottom-up storage
        arr = arr[::-1]
    return w, h, 3, arr[:, :, ::-1]  # BGR -> RGB


def _decode_ppm(b: bytes):
    """(w, h, 3, pixels) for a binary PPM (P6, maxval<=255); else None."""
    import numpy as np
    import re as _re

    # header: P6, then w, h, maxval as whitespace/comment-separated
    # tokens, then ONE whitespace byte, then raw RGB
    m = _re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s", b)
    if not m:
        return None
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval > 255 or w <= 0 or h <= 0:
        return None
    off = m.end()
    if off + w * h * 3 > len(b):
        return None
    arr = np.frombuffer(b, np.uint8, w * h * 3, off).reshape(h, w, 3)
    return w, h, 3, arr


def encode_bmp(pixels) -> bytes:
    """24-bit uncompressed bottom-up BMP from an HxWx3 uint8 RGB array —
    the test-fixture twin of _decode_bmp."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = (w * 3 + 3) & ~3
    body = np.zeros((h, row), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    data = body.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def encode_ppm(pixels) -> bytes:
    """Binary PPM (P6) from an HxWx3 uint8 RGB array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_image(b: bytes):
    """(w, h, c, pixels HxWx3 uint8) via the codec-free numpy decoders
    (BMP/PPM); None when the format is unrecognized/malformed (caller
    uses the deterministic stub). PIL-decodable compressed formats would
    slot in here; the sandbox has no PIL (decode_available())."""
    try:
        if b[:2] == b"BM":
            return _decode_bmp(b)
        if b[:2] == b"P6":
            return _decode_ppm(b)
    except Exception:
        return None
    return None


def pixel_features(pixels, feat_dim: int = 8) -> list[float]:
    """Real feature vector from decoded pixels: per-channel means and
    stds (plus overall mean/std), scaled to [0,1], cycled to feat_dim and
    QUANTIZED to 1/255 steps so the feat <-> feat_fp hex roundtrip
    invariant of the stub path holds identically for real features."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    flat = px.reshape(-1, px.shape[-1])
    vals = list(flat.mean(axis=0) / 255.0) + list(flat.std(axis=0) / 255.0)
    vals += [float(px.mean() / 255.0), float(px.std() / 255.0)]
    out = [vals[i % len(vals)] for i in range(feat_dim)]
    return [min(255, max(0, int(round(v * 255)))) / 255.0 for v in out]


def image_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract stage over image rows: mapInPandas so each
    Arrow batch streams through without building a row-sized pandas cell
    copy per column reference.

    Output per image: (width, height, channels) from the decoder,
    ``digest`` = md5 of the bytes, ``feat`` = feat_dim floats in [0, 1],
    and ``feat_fp`` = the 2*feat_dim-hex fingerprint those floats decode
    from (hashable contract form of the float array; feat[i] ==
    int(feat_fp[2i:2i+2], 16)/255 on BOTH paths).

    Rows whose bytes decode codec-free (BMP/PPM, decode_image) get REAL
    pixel statistics as features; everything else gets the deterministic
    md5-arithmetic stub. The synthetic contract media never carries a
    BMP/PPM magic, so the driver oracles see only the stub path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                b = bytes(b) if b is not None else b""
                digest = hashlib.md5(b).hexdigest()
                dec = decode_image(b)
                if dec is not None:
                    w, h, c, px = dec
                    feat = pixel_features(px, feat_dim)
                    fhex = "".join(f"{int(round(v * 255)):02x}" for v in feat)
                else:
                    w, h, c = _decode_image_stub(b)
                    # fake embedding: hex-pair bytes of a second digest, scaled
                    fhex = hashlib.md5(b + b"#feat").hexdigest()[: 2 * feat_dim]
                    feat = [
                        int(fhex[2 * i : 2 * i + 2], 16) / 255.0 for i in range(feat_dim)
                    ]
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


# -- perceptual hashing (image near-dup) ------------------------------------
# dHash (difference hash): grayscale, sample a (grid+1) x grid lattice,
# hash bit = "right neighbor brighter than left". Invariant to constant
# brightness shifts and byte-level re-encodes — the image twin of the
# text near-dup family. Candidate generation is multi-index hamming
# (Norouzi et al. 2012): split the grid*grid-bit hash into `grid` row
# bands; two hashes within hamming <= grid-1 MUST share a band
# (pigeonhole), so a band equi-join finds every pair with zero recall
# loss and no all-pairs scan. Scale note: grid=8 gives 8-bit bands (256
# buckets/band -> O(n^2/256) candidates); at corpus scale use grid=16
# (16-bit bands, 65k buckets) and/or band_cap, exactly like the MinHash
# LSH band_cap guard in operators/dedup.py.

DHASH_SCHEMA = (
    "media_id long, width int, height int, digest string, dhash string, "
    "bands array<int>"
)


def dhash_bits(pixels, grid: int = 8):
    """Row-band bytes of the dHash for one decoded HxWx3 uint8 image:
    integer-exact grayscale (ITU-R 601 weights, //1000), nearest-neighbor
    lattice xs[i] = i*w//(grid+1), ys[j] = j*h//grid, band j packs bits
    (gray[ys[j], xs[i+1]] > gray[ys[j], xs[i]]) << (grid-1-i)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.int64)
    h, w = px.shape[0], px.shape[1]
    gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    xs = [(i * w) // (grid + 1) for i in range(grid + 1)]
    ys = [(j * h) // grid for j in range(grid)]
    bands = []
    for j in range(grid):
        row = gray[ys[j]]
        b = 0
        for i in range(grid):
            b = (b << 1) | int(row[xs[i + 1]] > row[xs[i]])
        bands.append(b)
    return bands


def image_dhash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Decode + perceptual-hash stage over image rows (mapInPandas,
    bytes never leave the executors). Output: dims, md5 ``digest`` of
    the raw bytes, ``dhash`` hex (2*grid chars per band-byte... grid/4
    hex chars per band), and the ``bands`` int array the near-dup join
    keys on. Rows whose bytes don't decode codec-free (decode_image)
    are DROPPED — a perceptual hash of undecodable bytes is undefined;
    the caller sees exactly the decodable subset."""
    width = max(2, grid // 4)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                b = bytes(b) if b is not None else b""
                dec = decode_image(b)
                if dec is None:
                    continue
                w, h, _c, px = dec
                bands = dhash_bits(px, grid)
                hx = "".join(f"{v:0{width}x}" for v in bands)
                rows.append(
                    (int(mid), w, h, hashlib.md5(b).hexdigest(), hx, bands)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "digest", "dhash", "bands"],
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "bytes")
        .mapInPandas(run, DHASH_SCHEMA)
    )


def dhash_near_dup(
    hashes: DataFrame, max_hamming: int = 7, band_cap: int | None = None
) -> DataFrame:
    """Near-duplicate image pairs from :func:`image_dhash` output:
    (media_a, media_b, hamming, same_bytes). Complete for
    ``max_hamming <= n_bands - 1`` (pigeonhole over the row bands);
    ``same_bytes`` separates true byte dupes from perceptual-only dupes
    (re-encodes, brightness shifts). The join is a band equi-join — one
    shuffle on (band_idx, band_byte), never cartesian; ``band_cap``
    drops hot buckets (uniform regions hash to band 0) exactly like the
    LSH band_cap in operators/dedup.py, trading bounded recall loss for
    skew safety."""
    e = hashes.select(
        "media_id",
        "digest",
        "bands",
        F.posexplode("bands").alias("band_idx", "band_byte"),
    )
    if band_cap is not None:
        e = (
            e.withColumn(
                "_n",
                F.count("*").over(
                    Window.partitionBy("band_idx", "band_byte")
                ),
            )
            .filter(F.col("_n") <= band_cap)
            .drop("_n")
        )
    # Materialize the exploded band table once (r6, the co-citation
    # lesson): both aliased sides of the band join consume `e`, whose
    # lineage is the image_dhash mapInPandas — i.e. a full per-image
    # pixel decode; uncached, that kernel ran once per join side.
    e = e.localCheckpoint()
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_byte") == F.col("b.band_byte"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.bands").alias("bands_a"),
            F.col("b.bands").alias("bands_b"),
            (F.col("a.digest") == F.col("b.digest")).alias("same_bytes"),
        )
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(
            "bands_a", "bands_b", lambda x, y: F.bit_count(x.bitwiseXOR(y))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "hamming", "same_bytes")
    )


# -- audio (PCM WAV) --------------------------------------------------------
# RIFF/WAVE with 16-bit PCM is a pure byte layout — numpy decodes it
# codec-free, so the REAL audio path (decode -> waveform statistics)
# runs end-to-end in this sandbox, mirroring the BMP/PPM image path.
# Compressed audio (mp3/ogg/flac) would need a codec the container
# lacks; such bytes simply don't decode and are dropped.

AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms int, rms double, zero_crossings long, peak int"
)


def encode_wav(samples, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """Minimal PCM-16 RIFF/WAVE from an int16 sample array (interleaved
    when n_channels > 1) — the test-fixture twin of _decode_wav."""
    import numpy as np

    s = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    hdr = (
        b"RIFF"
        + (36 + len(s)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data"
        + len(s).to_bytes(4, "little")
    )
    return hdr + s


def _decode_wav(b: bytes):
    """(sample_rate, n_channels, samples int16 ndarray) for PCM-16
    RIFF/WAVE; None for anything else (compressed, truncated, non-PCM).
    Walks the chunk list — fmt/data need not be adjacent in the wild."""
    import numpy as np

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, sr, nch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = int.from_bytes(body[0:2], "little")
            nch = int.from_bytes(body[2:4], "little")
            sr = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1:
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or data is None or bits != 16 or not nch:
        return None
    n = len(data) // 2
    if n == 0:
        return None
    return sr, nch, np.frombuffer(data, "<i2", n)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + waveform-statistics stage over audio rows (mapInPandas,
    bytes stay on the executors): sample_rate / n_channels / n_samples
    (per channel) / duration_ms (floor), rms of the raw int16 samples
    rounded to 4 decimals, zero_crossings (sign boundary on s >= 0,
    channel-interleaved stream), peak = max |sample|. Undecodable bytes
    produce no row — waveform statistics of undecoded bytes are
    undefined (same contract as image_dhash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                b = bytes(b) if b is not None else b""
                dec = _decode_wav(b)
                if dec is None:
                    continue
                sr, nch, s = dec
                x = s.astype(np.int64)
                n_per = len(s) // nch
                rms = round(float(np.sqrt((x * x).sum() / len(s))), 4)
                nn = (s >= 0).astype(np.int8)
                zc = int((nn[1:] != nn[:-1]).sum())
                rows.append(
                    (
                        int(mid),
                        int(sr),
                        int(nch),
                        int(n_per),
                        int(n_per * 1000 // sr),
                        rms,
                        zc,
                        int(np.abs(x).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_ms",
                    "rms",
                    "zero_crossings",
                    "peak",
                ],
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "bytes")
        .mapInPandas(run, AUDIO_FEATURES_SCHEMA)
    )
