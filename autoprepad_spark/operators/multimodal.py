"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is fully real — schemas, partitioning, UDF
signatures, batch shapes, and tests. Codecs:

* image — REAL: uncompressed 24-bit BMP encode/decode implemented here
  with struct + numpy (no external imaging library needed),
* audio  — REAL: PCM WAV via the stdlib ``wave`` module,
* video  — STUBBED (a real container/codec demuxer genuinely needs
  ffmpeg, absent in this environment): raises NotImplementedError
  unless the deterministic fake is requested; swapping in a decoder
  touches ONLY ``_decode_payload``.

Scale notes: media rows are large — the operators repartition by a hash
of the id before the Python stage so Arrow batches are balanced, and
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds peak memory per
Python worker. Feature extraction returns fixed-width vectors, never the
raw bytes, so downstream shuffles move features, not media.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24-bit BMP bytes."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    data_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    # BMP stores rows bottom-up, channels as BGR
    body = bytearray()
    bgr = pixels[:, :, ::-1]
    zeros = b"\x00" * pad
    for r in range(h - 1, -1, -1):
        body += bgr[r].tobytes() + zeros
    return header + info + bytes(body)


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> (H, W, 3) uint8 RGB."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", b, 10)[0]
    w = struct.unpack_from("<i", b, 18)[0]
    h = struct.unpack_from("<i", b, 22)[0]
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    row = w * 3
    stride = row + (4 - row % 4) % 4
    flipped = h > 0
    h = abs(h)
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if flipped:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def encode_wav(samples: np.ndarray, *, framerate: int = 8000) -> bytes:
    """int16 PCM samples -> mono WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(b: bytes) -> np.ndarray:
    """WAV bytes -> int16 PCM sample array."""
    with wave.open(io.BytesIO(b), "rb") as w:
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype="<i2")


def _decode_payload(payload: bytes, kind: str, *, fake: bool) -> np.ndarray:
    """Decode media bytes to a dense float array in [0, 256).

    image/audio decode for REAL (BMP / PCM WAV, implemented above);
    video is the one stubbed kind — a demuxer genuinely requires ffmpeg,
    absent here. fake=True derives a deterministic pseudo-decode from
    the raw bytes instead (tests / video plumbing)."""
    if fake:
        return np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    if kind == "image":
        return decode_bmp(payload).reshape(-1).astype(np.float32)
    if kind == "audio":
        s = decode_wav(payload).astype(np.float32)
        return s / 256.0 + 128.0  # int16 -> [0, 256) scale
    raise NotImplementedError(
        "video demuxing (ffmpeg) not available in this environment; "
        "use fake=True or plug a decoder in here"
    )


def extract_features(df: DataFrame, *, fake_decode: bool = True, partitions: int | None = None) -> DataFrame:
    """media table -> fixed-width feature vectors via mapInPandas.

    The 'feature' is a FEATURE_DIM-bin byte histogram of the decoded
    array — a stand-in with the exact shape a real embedding would have.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                "media_id": b["media_id"],
                "kind": b["kind"],
                "n_bytes": b["payload"].map(lambda p: len(p) if p is not None else None).astype("Int32"),
                "feature": None,
                "ok": True,
                "error": None,
            }
            feats, oks, errs = [], [], []
            for payload, kind in zip(b["payload"], b["kind"]):
                if payload is None:
                    feats.append(None)
                    oks.append(False)
                    errs.append("null payload")
                    continue
                try:
                    arr = _decode_payload(bytes(payload), kind, fake=fake_decode)
                    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                    total = max(hist.sum(), 1)
                    feats.append((hist / total).astype(np.float32))
                    oks.append(True)
                    errs.append(None)
                except (NotImplementedError, ValueError, wave.Error, EOFError) as e:
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(e)[:80])
            out["feature"] = pd.Series(feats, dtype=object)
            out["ok"] = pd.Series(oks)
            out["error"] = pd.Series(errs, dtype=object)
            yield pd.DataFrame(out)

    src = df.select("media_id", "kind", "payload")
    if partitions:
        src = src.repartition(partitions, F.xxhash64("media_id"))
    return src.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_image(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) pixels — pure numpy index
    mapping, the standard thumbnailing kernel when no imaging lib is
    around. Deterministic (floor sampling grid)."""
    h, w = arr.shape[:2]
    ri = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    ci = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[ri][:, ci]


THUMB_H = THUMB_W = 8

THUMBNAIL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("thumb", T.ArrayType(T.FloatType()), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def image_thumbnails(df: DataFrame, *, partitions: int | None = None) -> DataFrame:
    """Image rows -> fixed 8x8 grayscale thumbnails (decode -> resize ->
    luma), via Arrow mapInPandas. Output is 64 floats per image — the
    canonical decode/resize/extract pipeline shape; downstream shuffles
    move thumbnails, never payload bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            thumbs, oks, errs = [], [], []
            for payload in b["payload"]:
                try:
                    px = decode_bmp(bytes(payload))
                    small = resize_image(px, THUMB_H, THUMB_W).astype(np.float32)
                    gray = (
                        0.299 * small[:, :, 0]
                        + 0.587 * small[:, :, 1]
                        + 0.114 * small[:, :, 2]
                    )
                    thumbs.append(gray.reshape(-1))
                    oks.append(True)
                    errs.append(None)
                except (ValueError, struct.error) as e:
                    thumbs.append(None)
                    oks.append(False)
                    errs.append(str(e)[:80])
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "thumb": pd.Series(thumbs, dtype=object),
                    "ok": pd.Series(oks),
                    "error": pd.Series(errs, dtype=object),
                }
            )

    src = df.filter(F.col("kind") == "image").select("media_id", "payload")
    if partitions:
        src = src.repartition(partitions, F.xxhash64("media_id"))
    return src.mapInPandas(run, schema=THUMBNAIL_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — the
    explode is metadata-only (duration), payload untouched until decode."""
    n = F.floor(F.col("duration_ms") / every_ms).cast("int")
    return (
        df.filter((F.col("kind") == "video") & F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))), lambda i: i * every_ms)
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: REAL encoded payloads for image (24-bit
    BMP) and audio (PCM WAV); video rows carry opaque bytes (decode is
    the stubbed kind)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        width = height = duration = None
        if kind == "image":
            height = int(rng.integers(4, 24))
            width = int(rng.integers(4, 24))
            pixels = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
            payload = encode_bmp(pixels)
            mime = "image/bmp"
        elif kind == "audio":
            n_samples = int(rng.integers(200, 4000))
            samples = rng.integers(-32768, 32767, size=n_samples).astype(np.int16)
            payload = encode_wav(samples)
            duration = int(n_samples * 1000 / 8000)
            mime = "audio/wav"
        else:
            size = int(rng.integers(64, 2048))
            payload = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
            duration = int(rng.integers(500, 20000))
            mime = "video/mp4"
        rows.append(
            (f"m-{i:06d}", kind, bytearray(payload), mime, width, height, duration)
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
