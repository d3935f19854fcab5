"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no image/audio codecs, so the *decode kernels* are
deliberately stubbed (deterministic fakes or NotImplementedError) while the
Spark-side plumbing — schema, Arrow batch shape, mapInPandas partitioning —
is real and tested. Swapping the fake for PIL/librosa is a one-function
change that doesn't touch the distributed plan.

100 TB notes: binary payloads stay columnar (parquet BYTE_ARRAY) and are
only materialized inside the Arrow batch of the executor that processes
them; metadata-only operations (filtering by mime/size/dims) never read the
bytes thanks to parquet column pruning. `mapInPandas` streams batches, so a
partition never holds more than `maxRecordsPerBatch` payloads in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive cheap metadata without decoding: byte size + magic-byte mime
    sniff (JPEG/PNG/WAV/MP4) — pure Catalyst over the first bytes."""
    p = F.col(payload_col)
    head = F.hex(F.substring(p, 1, 4))
    mime = (
        F.when(head.startswith("FFD8"), "image/jpeg")
        .when(head.startswith("89504E47"), "image/png")
        .when(head.startswith("52494646"), "audio/wav")
        .when(head.startswith("00000018") | head.startswith("00000020"),
              "video/mp4")
        .otherwise("application/octet-stream")
    )
    return (
        df.withColumn("byte_size", F.length(p))
        .withColumn("mime_sniffed", mime)
    )


def _fake_decode_feature(payload: bytes | None, dim: int) -> list[float] | None:
    """Deterministic stand-in for a real decode→embed kernel.

    REAL DECODE NOT AVAILABLE IN THIS CONTAINER — this derives a stable
    pseudo-feature from the payload hash so downstream similarity/dedup
    plumbing is exercisable end-to-end. Replace with e.g. PIL + a vision
    encoder; the mapInPandas contract (bytes in, array<float> out) is
    unchanged.
    """
    if payload is None:
        return None
    import hashlib

    import numpy as np

    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype("float32")
    return (v / np.linalg.norm(v)).tolist()


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id", dim: int = 32,
                     decode_fn=None) -> DataFrame:
    """payload binary → feature array<float> via Arrow-batched mapInPandas.

    `decode_fn(payload_bytes) -> list[float] | None` plugs in a real codec;
    default is the deterministic fake above.
    """
    fn = decode_fn or (lambda b: _fake_decode_feature(b, dim))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = pdf[payload_col].map(
                lambda b: fn(bytes(b)) if b is not None else None)
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "feature": feats,
                "decode_ok": feats.notna(),
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id", every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explodes (media_id, frame_idx, ts_ms)
    rows from duration metadata WITHOUT decoding; the per-frame decode is a
    second extract_features pass. Decoding itself requires a codec →
    NotImplementedError from the stub kernel when invoked on real payloads.
    """
    if "duration_ms" not in df.columns:
        raise ValueError("sample_frames needs a duration_ms metadata column")
    n_frames = F.greatest(
        (F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)


def decode_image_stub(payload: bytes) -> "object":
    """Real image decode — unavailable here (no PIL/opencv in container)."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "container; plug a decode_fn into extract_features instead")
