"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each task processes whole record batches
(the right shape for CPU-bound media work — batch amortizes the Python
round trip, partitioning spreads media bytes across executors).

The *decode* step is STUBBED (no PIL/ffmpeg in this container): it
produces a deterministic fake feature vector derived from the payload
bytes, clearly marked. The Spark-side plumbing — schema, batch
iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


class MediaDecoder:
    """Pluggable decoder interface: payload bytes → fixed-dim features.

    Implementations must be picklable (they ship to executors inside the
    mapInPandas closure) and must raise on undecodable payloads so bad
    media surfaces as task errors instead of silent nulls.
    """

    feature_dim: int = FEATURE_DIM

    def decode(self, kind: str, payload: bytes) -> list[float]:  # pragma: no cover - interface
        raise NotImplementedError


class StubDecoder(MediaDecoder):
    """STUB — deterministic stand-in for a real decoder (PIL/ffmpeg not in
    this container). Produces a sha256-derived fake feature vector so the
    Spark-side plumbing (schema, Arrow batching, partitioning) is fully
    exercised. NOT a real decode; swap in a PillowDecoder/FfmpegDecoder
    in production."""

    def decode(self, kind: str, payload: bytes) -> list[float]:
        if not payload:
            raise NotImplementedError(
                "real media decode not available in this environment"
            )
        digest = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in digest[: self.feature_dim]]


def default_decoder() -> MediaDecoder:
    """Return the best decoder importable in this environment.

    Tries real media libraries first (none are baked into this
    container, so the stub is what tests exercise); a production image
    would land in the PIL branch without any caller change.
    """
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # noqa: F401

        class PillowDecoder(MediaDecoder):
            def decode(self, kind: str, payload: bytes) -> list[float]:
                import io

                import numpy as np

                img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
                return (np.asarray(img, dtype="float32").ravel() / 255.0).tolist()

        return PillowDecoder()
    except ImportError:
        return StubDecoder()


def extract_features(media: DataFrame, decoder: MediaDecoder | None = None) -> DataFrame:
    """binary payload → fixed-dim feature vector, Arrow-batched.

    ``decoder`` is any :class:`MediaDecoder`; defaults to
    :func:`default_decoder` (the stub in this container)."""
    dec = decoder or default_decoder()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nb = [], []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                if p is None or len(p) == 0:
                    feats.append(None)
                    nb.append(0)
                else:
                    feats.append(dec.decode(kind, bytes(p)))
                    nb.append(len(p))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nb,
                    "features": feats,
                }
            )

    return media.mapInPandas(op, schema=_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video → frame-timestamp rows (decode stubbed; timing math real).

    Produces one row per sampled frame offset from the duration metadata
    — the explode shape a real frame sampler would emit.
    """
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    offsets = F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_ms", F.explode(offsets))
        .select("media_id", "frame_ms")
    )


def gen_media_fixture(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        # printable-ASCII payload bytes: identical bytes are reachable from
        # SQL (chr()→string→sha256), so the DuckDB oracle can replay the
        # stub decoder bit-for-bit; the binary-column plumbing is unchanged
        payload = bytes([(i * 7 + j) % 95 + 32 for j in range(32 + i % 64)])
        meta = (64 + i % 512, 64 + (i * 3) % 512, 1000 * (1 + i % 10), "fake")
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
