"""Multimodal columns for training-data pipelines (brief: first-class).

Images / audio / video ride as opaque ``binary`` columns with typed
metadata structs.  The Spark-side plumbing — schemas, partition-preserving
Arrow batches, UDF signatures, deterministic batch shapes — is real and
tested.  The ``_decode_*`` seams dispatch on the blob's actual container
magic:

- PNG -> Pillow when importable, else a stdlib (zlib+struct) PNG decoder
  (8-bit gray/RGB/RGBA, all 5 scanline filters, non-interlaced);
- JPEG -> Pillow, or ``NotImplementedError`` naming the missing dep;
- RIFF/WAVE -> soundfile when importable, else the stdlib ``wave`` module
  (8/16-bit PCM, first channel);
- anything unrecognized -> the md5-chain deterministic fake (when
  ``DETERMINISTIC_FAKE``), which is what the hermetic driver oracles pin.

So real PNG/WAV content decodes for real even in this dependency-free
container, and swapping in a full codec stack (Pillow/soundfile/pyav)
changes nothing but availability.  Video has no stdlib codec; its seam
stays fake-or-raise.

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"


def _png_decode(data: bytes) -> np.ndarray:
    """Minimal correct PNG decode -> [h, w, 3] uint8 using only stdlib
    zlib/struct: 8-bit grayscale(0)/RGB(2)/RGBA(6), non-interlaced, all 5
    scanline filter types per the PNG spec §9 (None/Sub/Up/Average/Paeth).
    Grayscale broadcasts to 3 channels; alpha is dropped.  Test-path
    Python-loop unfiltering is fine — decode is a Python seam by design."""
    import struct
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = color_type = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or color_type not in (0, 2, 6) or interlace:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={color_type} "
                    f"interlace={interlace}: install Pillow for full coverage"
                )
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if color_type is None:
        # a truncated/malformed stream without IHDR would otherwise surface
        # as an opaque KeyError(None) at the channel lookup below
        raise ValueError("PNG missing IHDR chunk")
    nch = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        cur = np.frombuffer(raw[pos + 1:pos + 1 + stride], dtype=np.uint8).copy()
        pos += 1 + stride
        if ft == 1:  # Sub
            for x in range(nch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - nch])) & 0xFF
        elif ft == 2:  # Up (uint8 add wraps mod 256, as the spec requires)
            cur = cur + prev
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    elif nch == 4:
        img = img[:, :, :3]
    return np.ascontiguousarray(img)


def _wav_decode(content: bytes) -> np.ndarray:
    """RIFF/WAVE -> float32 PCM in [-1, 1), first channel.  soundfile when
    importable (any codec libsndfile knows), stdlib ``wave`` otherwise
    (8/16-bit integer PCM)."""
    import io

    try:
        import soundfile as sf

        data, _sr = sf.read(io.BytesIO(content), dtype="float32")
        if data.ndim > 1:
            data = data[:, 0]
        return np.ascontiguousarray(data, dtype=np.float32)
    except ImportError:
        pass
    import wave

    with wave.open(io.BytesIO(content)) as wv:
        nch, sw = wv.getnchannels(), wv.getsampwidth()
        frames = wv.readframes(wv.getnframes())
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * sw}-bit WAV needs soundfile")
    if nch > 1:
        arr = arr.reshape(-1, nch)[:, 0]
    return np.ascontiguousarray(arr)


def _decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """[h, w, 3] uint8.  Real container magic -> real codec (PIL when
    importable, stdlib PNG decode otherwise); opaque blobs -> md5 fake."""
    content = bytes(content)  # Arrow hands bytearray
    if content[:8] == _PNG_MAGIC or content[:3] == _JPEG_MAGIC:
        try:
            import io

            from PIL import Image

            img = np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
        except ImportError:
            if content[:8] == _PNG_MAGIC:
                img = _png_decode(content)
            else:
                raise NotImplementedError(
                    "JPEG content needs Pillow (pip install pillow)"
                ) from None
        # a blob whose real dimensions disagree with the declared metadata
        # would otherwise pass silently and drift every downstream shape
        # assumption off the schema — fail loudly at the decode seam
        if (height, width) not in ((0, 0), img.shape[:2]):
            raise ValueError(
                f"decoded image is {img.shape[0]}x{img.shape[1]} but metadata "
                f"declares {height}x{width}"
            )
        return img
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("unrecognized image container and fakes disabled")
    return _md5_chain_bytes(content, height * width * 3).reshape(height, width, 3)


def _decode_audio(content: bytes, n_samples: int) -> np.ndarray:
    """[n] float32 PCM.  RIFF/WAVE magic -> real codec (soundfile when
    importable, stdlib wave otherwise); opaque blobs -> md5 fake."""
    content = bytes(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return _wav_decode(content)
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("unrecognized audio container and fakes disabled")
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
