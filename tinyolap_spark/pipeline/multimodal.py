"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``DecoderStub`` (deterministic fake) / ``NotImplementedError`` —
everything Spark-side (schema, batch iteration, partition sizing, UDF
signatures) is real and tested.

Scale notes (100 TB of media):

- media bytes dominate row size → set ``spark.sql.files.maxPartitionBytes``
  so one task holds O(100) media rows, and NEVER collect the binary column;
- feature extraction emits small fixed-width vectors — project the binary
  away in the same ``mapInPandas`` pass so the shuffle after it carries
  features only;
- frame sampling (video) fans out rows; do it in the same pass and
  re-partition by (media_id) only if a downstream per-media aggregate needs
  co-location (usually a plain groupBy suffices).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


class DecoderStub:
    """Deterministic fake decoder.

    A real deployment swaps this for PIL/ffmpeg/torchaudio; the Spark-side
    plumbing (batch shapes, schemas) is identical.  ``strict=True`` raises
    ``NotImplementedError`` instead, marking the integration point.
    """

    def __init__(self, strict: bool = False, dim: int = 8):
        self.strict = strict
        self.dim = dim

    def decode_features(self, content: Optional[bytes]) -> list[float]:
        if self.strict:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "plug a real decoder here"
            )
        if content is None:
            return [0.0] * self.dim
        # deterministic fake: byte histogram over `dim` buckets, normalized
        counts = [0] * self.dim
        for b in content:
            counts[b % self.dim] += 1
        total = max(1, len(content))
        return [c / total for c in counts]


def synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media corpus (seeded bytes) for plumbing tests."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random(i)
        size = 64 + (i * 37) % 512
        content = bytes(rng.randrange(256) for _ in range(size))
        rows.append(
            (i, kind, content, f"{kind}/fake", 64, 48, 1000 + i)
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, decoder: Optional[DecoderStub] = None, dim: int = 8
) -> DataFrame:
    """binary -> fixed-width feature vector, Arrow-batched; the binary
    column is dropped inside the same pass (shuffle carries features only).
    """
    dec = decoder or DecoderStub(dim=dim)

    def run(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            feats = [dec.decode_features(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda c: 0 if c is None else len(c)
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata updated, content passed through the stub
    transform (real implementation would re-encode)."""
    dec = DecoderStub()

    def run(batches: Iterator):
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            # touch content through the decoder to prove the batch path
            out["content"] = out["content"].map(
                lambda c: None if c is None else c[: max(1, len(c) // 2)]
            )
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp
    (fan-out inside the Arrow batch; frame decode stubbed)."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ms", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            ids, times, frames = [], [], []
            for _, row in pdf.iterrows():
                dur = row["duration_ms"] or 0
                for t in range(0, int(dur), every_ms):
                    ids.append(row["media_id"])
                    times.append(t)
                    content = row["content"]
                    frames.append(
                        None if content is None else bytes(content[:16])
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_ms": times, "frame": frames}
            )

    return media.where(F.col("kind") == "video").mapInPandas(run, schema=schema)
