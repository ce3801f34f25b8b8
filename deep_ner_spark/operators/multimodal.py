"""Multimodal columns for training-data pipelines (brief: first-class).

Images / audio / video ride as opaque ``binary`` columns with typed
metadata structs.  The Spark-side plumbing — schemas, partition-preserving
Arrow batches, UDF signatures, deterministic batch shapes — is real and
tested; the actual codec calls (PIL/ffmpeg/soundfile are not in this
container) are isolated behind ``_decode_*`` seams that raise
``NotImplementedError`` unless a deterministic fake is enabled, so swapping
in a real codec changes one function, not the pipeline.

Scale notes: media blobs are the heaviest columns a pipeline carries, so
every operator here is a narrow ``mapInPandas`` pass (no shuffle, blobs
never move between executors) and metadata-only queries prune the binary
column at the parquet scan (verified by ReadSchema in tests).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("codec", T.StringType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_samples", T.LongType()),
                ]
            ),
        ),
    ]
)

# --- codec seams -------------------------------------------------------------

DETERMINISTIC_FAKE = True  # container has no image/audio libs; see module doc


def _md5_chain_bytes(content: bytes, n: int) -> np.ndarray:
    """n deterministic pseudo-random bytes from an md5 chain over the
    content: block b = md5(md5(content).hexdigest() + ':' + b).  Every step
    is md5-on-ASCII, so ANY engine with an md5 function (DuckDB, Spark SQL)
    can recompute the stream — the property the driver oracle uses."""
    seed_hex = hashlib.md5(content).hexdigest()
    blocks = (n + 15) // 16
    buf = b"".join(
        hashlib.md5(f"{seed_hex}:{b}".encode()).digest() for b in range(blocks)
    )
    return np.frombuffer(buf[:n], dtype=np.uint8)


def _decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """[h, w, 3] uint8.  Real impl: PIL.Image.open(BytesIO(content))."""
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("image codec not available in this container")
    return _md5_chain_bytes(content, height * width * 3).reshape(height, width, 3)


def _decode_audio(content: bytes, n_samples: int) -> np.ndarray:
    """[n_samples] float32 PCM.  Real impl: soundfile.read(BytesIO(...))."""
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("audio codec not available in this container")
    raw = _md5_chain_bytes(content, n_samples).astype(np.float32)
    return (raw - 128.0) / 128.0


# --- operators (real plumbing) ------------------------------------------------


def image_features(df: DataFrame, grid: int = 4) -> DataFrame:
    """Decode -> grid-pooled mean-channel features, batched per partition.

    Output adds ``features: array<float>`` of length grid*grid*3 — the
    shape a downstream embedding model consumes.  Narrow pass: one
    ``mapInPandas`` batch per Arrow chunk, blobs never shuffle.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                img = _decode_image(content, int(meta["width"]), int(meta["height"]))
                h, w, _ = img.shape
                gh, gw = max(h // grid, 1), max(w // grid, 1)
                pooled = [
                    float(img[i * gh:(i + 1) * gh, j * gw:(j + 1) * gw, c].mean())
                    for i in range(grid)
                    for j in range(grid)
                    for c in range(3)
                ]
                feats.append(pooled)
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(run, schema=out_schema)


def image_resize_plan(df: DataFrame, target: int = 224) -> DataFrame:
    """Metadata-only resize planning: scale factors + output dims WITHOUT
    touching the binary column — must prune ``content`` at the scan."""
    return df.select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.least(
            F.lit(float(target)) / F.col("meta.width"),
            F.lit(float(target)) / F.col("meta.height"),
        ).alias("scale"),
    ).withColumn(
        "out_width", F.floor(F.col("width") * F.col("scale")).cast("int")
    ).withColumn(
        "out_height", F.floor(F.col("height") * F.col("scale")).cast("int")
    )


def audio_frame_sample(
    df: DataFrame, frame_len: int = 400, hop: int = 160, max_frames: int = 8
) -> DataFrame:
    """Decode audio -> fixed-hop frame energies (the feature-extraction
    batch shape of a filterbank front-end), one row per (media, frame)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("energy", T.FloatType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies = [], [], []
            for media_id, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                pcm = _decode_audio(content, int(meta["n_samples"]))
                # mean of squares in float64.  For the md5-chain fake the
                # samples are dyadic rationals k/128 (|k| <= 128), so every
                # square and partial sum is EXACT in f64 and the single
                # division is the only rounding — a SQL engine recomputing
                # sum((raw-128)^2) / (16384 * frame_len) lands on the same
                # bits (the driver oracle relies on this)
                sq = pcm.astype(np.float64) ** 2
                for k in range(max_frames):
                    s = k * hop
                    if s + frame_len > len(pcm):
                        break
                    ids.append(media_id)
                    idxs.append(k)
                    energies.append(float(sq[s:s + frame_len].sum() / frame_len))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "energy": energies}
            )

    return df.mapInPandas(run, schema=out_schema)


def media_dedup_hashes(df: DataFrame) -> DataFrame:
    """Exact media dedup by content hash — JVM-side md5 on the binary
    column, no Python in the path."""
    return df.select(
        "media_id",
        F.md5(F.col("content")).alias("content_hash"),
        F.length(F.col("content")).alias("n_bytes"),
    )


def gen_fake_media(spark, n: int = 64, seed: int = 42, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        blob = rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8).tobytes()
        if kind == "image":
            w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
            rows.append((i, bytearray(blob), ("png", w, h, len(blob))))
        else:
            ns = int(rng.integers(2000, 8000))
            rows.append((i, bytearray(blob), ("pcm16", 16000, ns)))
    schema = IMAGE_SCHEMA if kind == "image" else AUDIO_SCHEMA
    return spark.createDataFrame(rows, schema=schema)


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("codec", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("fps", T.FloatType()),
                ]
            ),
        ),
    ]
)


def _decode_video_frame(content: bytes, frame_idx: int, width: int, height: int) -> np.ndarray:
    """[h, w] uint8 grayscale frame.  Real impl: ffmpeg/pyav seek+decode.

    Fake: per-frame md5 chain seeded by (md5(content), frame_idx) — every
    frame is independently addressable without decoding its predecessors,
    mirroring keyframe seeks, and any engine with md5 can recompute it.
    """
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("video codec not available in this container")
    seed_hex = hashlib.md5(content).hexdigest()
    frame_key = f"{seed_hex}:f{frame_idx}".encode()
    return _md5_chain_bytes(frame_key, height * width).reshape(height, width)


def video_frame_sample(df: DataFrame, n_out: int = 4) -> DataFrame:
    """Uniformly sample ``n_out`` frames per video and decode each to a
    mean-intensity scalar — the frame-sampling front-end of a video
    embedding pipeline (sample -> decode -> per-frame features).

    Sampled indices are ``(k * n_frames) // n_out`` for k in [0, n_out) —
    deterministic, order-free, and seek-addressable (no sequential decode).
    Narrow ``mapInPandas`` pass: blobs never shuffle; one row per
    (media_id, sample_idx).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("sample_idx", T.IntegerType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("mean_intensity", T.FloatType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sidx, fidx, means = [], [], [], []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                w, h = int(meta["width"]), int(meta["height"])
                nf = int(meta["n_frames"])
                for k in range(n_out):
                    f = (k * nf) // n_out
                    frame = _decode_video_frame(content, f, w, h)
                    # integer sum then ONE double division (not np.mean's
                    # pairwise summation) so the SQL twin is bit-exact
                    mean = np.float32(int(frame.astype(np.int64).sum()) / (w * h))
                    ids.append(mid)
                    sidx.append(k)
                    fidx.append(f)
                    means.append(float(mean))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "sample_idx": pd.Series(sidx, dtype="int32"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "mean_intensity": pd.Series(means, dtype="float32"),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def gen_fake_video(spark, n: int = 16, seed: int = 42) -> DataFrame:
    """Deterministic fake video table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        blob = rng.integers(0, 256, size=int(rng.integers(512, 2048)), dtype=np.uint8).tobytes()
        w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
        nf = int(rng.integers(4, 40))
        rows.append((i, bytearray(blob), ("fake", w, h, nf, 25.0)))
    return spark.createDataFrame(rows, schema=VIDEO_SCHEMA)
