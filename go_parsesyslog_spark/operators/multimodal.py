"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition-friendly batch iteration,
Arrow-batched UDF signatures, frame-sampling plan — is real and tested.
The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: by default they raise NotImplementedError;
with ``fake=True`` they produce a deterministic fake derived from the
bytes, so the distributed plumbing can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feature array<float>, ok boolean, err string"
)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, 128 + (i % 64), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                bytearray(payload),
                64 + i % 32 if kind != "audio" else None,
                48 + i % 32 if kind != "audio" else None,
                1000 + i if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str, fake: bool):
    """The codec boundary.  Real implementation requires PIL/ffmpeg —
    unavailable here; the fake path derives a deterministic 8-dim
    feature from a sha256 of the payload."""
    if not fake:
        raise NotImplementedError(
            f"{kind} decoding requires codec libraries not present in "
            "this environment (PIL/ffmpeg/librosa); run with fake=True "
            "for the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    feat = np.frombuffer(digest[:32], dtype=np.uint8).reshape(8, 4)
    return (feat.sum(axis=1).astype(np.float32) / 255.0).tolist()


def extract_features(
    df: DataFrame, fake: bool = True, batch_note: str = "mapInPandas"
) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    mapInPandas (not a scalar UDF) because media work is
    memory-irregular: the iterator form lets one task process many
    small Arrow batches without materializing the whole partition.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs, hashes = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                hashes.append(hashlib.sha256(raw).hexdigest())
                try:
                    feats.append(_decode_stub(raw, kind, fake))
                    oks.append(True)
                    errs.append(None)
                except NotImplementedError as e:
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(e)[:120])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "sha256": hashes,
                    "feature": feats,
                    "ok": oks,
                    "err": errs,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_ms: int = 500, fake: bool = True
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the decode itself is the stub).  Shows the explode-based
    fan-out shape a real frame pipeline uses."""
    frames = (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
    )
    return extract_features(
        frames.select(
            (F.col("media_id") * 100000 + F.col("frame_ts_ms")).alias("media_id"),
            F.lit("image").alias("kind"),
            F.col("mime"),
            F.col("payload"),
            F.col("width"),
            F.col("height"),
            F.col("duration_ms"),
        ),
        fake=fake,
    )
