"""Multimodal column handling: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): treat image/audio/video as
`binary` columns with a typed metadata struct, processed by
Arrow-batched pandas functions over `mapInPandas` — the Spark-side
plumbing (schema, batch shape, partition sizing) is real and tested;
the codec itself is STUBBED because no image/audio libraries exist in
this container.

    spark.read.format("binaryFile").load(dir)          → ingest
    with_media_metadata(df)                            → sniff container
    decode_image_features(df)                          → mapInPandas stub
    sample_video_frames(df, every_n)                   → mapInPandas stub

Scale posture: binary payloads never pass through Python row-by-row —
mapInPandas streams Arrow record batches; `maxRecordsPerBatch` bounds
memory when payloads are MBs each. Partition sizing for blob tables
should target ~128 MB of payload per task (maxPartitionBytes), and
feature extraction is a narrow map — no shuffle at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic-byte signatures for container sniffing — pure Spark expressions
# (JVM-side), no UDF.
_SIGNATURES: list[tuple[str, str]] = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),  # RIFF (also webp/avi; refined below)
    ("494433", "audio/mpeg"),
    ("1A45DFA3", "video/webm"),
]

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def with_media_metadata(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Append a typed metadata struct (mime, n_bytes) sniffed from magic
    bytes — all JVM-side expressions, runs at full scan speed."""
    head = F.upper(F.hex(F.substring(F.col(binary_col), 1, 4)))
    mime = F.lit("application/octet-stream")
    for sig, m in reversed(_SIGNATURES):
        mime = F.when(head.startswith(sig), m).otherwise(mime)
    return df.withColumn(
        "media_meta",
        F.struct(mime.alias("mime"), F.length(F.col(binary_col)).alias("n_bytes")),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real image embedding: derived from a
    rolling byte hash so tests are stable. Replace the body with a real
    codec (PIL/torchvision) in production — the signature, batch shape,
    and schema do not change."""
    h = 1469598103934665603
    for b in payload[:4096]:
        h = ((h ^ b) * 1099511628211) % (1 << 64)
    return [((h >> (8 * i)) & 0xFF) / 255.0 for i in range(dim)]


def decode_image_features(
    df: DataFrame, id_col: str = "media_id", binary_col: str = "content", dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each task receives an iterator of pandas batches —
    payload bytes never materialize as Python row objects. The decode
    itself is a deterministic STUB (no image libs in this container);
    production swaps `_fake_feature` for a real decoder, nothing else.
    """
    mimed = with_media_metadata(df, binary_col)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": [m["mime"] for m in pdf["media_meta"]],
                    "n_bytes": [len(c) for c in pdf[binary_col]],
                    "feature": [_fake_feature(bytes(c), dim) for c in pdf[binary_col]],
                }
            )

    return mimed.mapInPandas(extract, IMAGE_FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame, id_col: str = "media_id", binary_col: str = "content", every_n_bytes: int = 1024
) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame.

    STUB decode: 'frames' are fixed-size byte slices standing in for
    decoded frames (a real implementation uses pyav/ffmpeg per batch).
    Demonstrates the 1→N row expansion shape under mapInPandas, which is
    what matters for partition sizing (output can be much larger than
    input — keep batches small via maxRecordsPerBatch).
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload)
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(data[off : off + every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs, "frame": frames})

    return df.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)
