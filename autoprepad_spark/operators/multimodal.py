"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is fully real — schemas, partitioning, UDF
signatures, batch shapes, and tests. The codec step itself is STUBBED
(`decode_image` raises NotImplementedError unless a deterministic fake is
requested) because image/audio libraries are not available in this
container; swapping in PIL/torchaudio touches ONLY `_decode_payload`.

Scale notes: media rows are large — the operators repartition by a hash
of the id before the Python stage so Arrow batches are balanced, and
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds peak memory per
Python worker. Feature extraction returns fixed-width vectors, never the
raw bytes, so downstream shuffles move features, not media.
"""

from __future__ import annotations

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


def _decode_payload(payload: bytes, kind: str, *, fake: bool) -> np.ndarray:
    """Decode media bytes to a dense array. STUB: real codecs are not in
    this container. fake=True derives a deterministic pseudo-decode from
    the byte content (for tests); fake=False raises."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/torchaudio/ffmpeg) not available in this "
            "environment; use fake=True or plug a decoder in here"
        )
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return arr


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
                except NotImplementedError as e:
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
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(64, 2048))
        payload = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        rows.append(
            (
                f"m-{i:06d}",
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 512)) if kind == "image" else None,
                int(rng.integers(16, 512)) if kind == "image" else None,
                int(rng.integers(500, 20000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
