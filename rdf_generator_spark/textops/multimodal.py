"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages. The decoding libraries (PIL,
ffmpeg, torchaudio) are NOT in this container, so the codec step is a
clearly-marked stub: with ``fake=True`` it produces deterministic fake
features (so the Spark-side plumbing — schema, batching, partitioning,
UDF signature — is real and tested); with ``fake=False`` it raises
NotImplementedError at the exact point a codec would plug in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> list:
    """Deterministic stand-in for a decoded-content embedding."""
    out = []
    h = payload or b""
    for i in range(dim):
        d = hashlib.md5(h + i.to_bytes(2, "big")).digest()
        out.append(int.from_bytes(d[:4], "big") / 2 ** 31 - 1.0)
    return out


def extract_features(
    media: DataFrame, dim: int = 8, fake: bool = True, batch_hint: int = 64
) -> DataFrame:
    """Binary payload -> feature vector via mapInPandas.

    Partition by media_id hash upstream if payload sizes are skewed;
    Arrow batch size should be tuned via
    spark.sql.execution.arrow.maxRecordsPerBatch for large payloads.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "codec decode not available in this environment — "
                        "plug PIL/ffmpeg/torchaudio here"
                    )
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload_sha256": hashlib.sha256(raw).hexdigest(),
                        "n_bytes": len(raw),
                        "feature": _fake_feature(raw, dim),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(gen, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp.
    The frame decode is the stubbed codec step; the fan-out, schema and
    timestamp arithmetic are real."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("ts_ms"),
        "payload",
    )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("ts_ms", T.IntegerType()),
            T.StructField("frame_sha256", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, ts, payload in zip(pdf["media_id"], pdf["ts_ms"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError("frame decode requires ffmpeg")
                raw = bytes(payload) if payload is not None else b""
                # ascii-delimited timestamp (not packed bytes) so the
                # deterministic fake is reproducible in any engine
                rows.append(
                    {
                        "media_id": mid,
                        "ts_ms": int(ts),
                        "frame_sha256": hashlib.sha256(
                            raw + f":{int(ts)}".encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return frames.mapInPandas(gen, schema)
