"""Multimodal column plumbing: image/audio/video as opaque binary.

The engine models multimodal payloads as ``binary`` columns with a
typed metadata struct alongside (modality, mime, width/height or
duration, sha). The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` partitioning — is real and tested; the actual
decode/resize/frame-sample kernels depend on codec libraries that are
NOT in this container and are stubbed behind ``DecodeUnavailable`` /
deterministic fakes, clearly marked.

Scale design: binary payloads are the dominant bytes at 100 TB, so
every operator (a) prunes metadata-only queries to the metadata struct
so the parquet scan never touches the blob column, and (b) processes
blobs with ``mapInPandas`` (Arrow-batched, one pass, no shuffle) with
``spark.sql.files.maxPartitionBytes`` sizing the per-task batch.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("sha256", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature_dim", LongType(), True),
        StructField("feature_l2", StringType(), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real-decode paths: codec libraries (Pillow/ffmpeg/
    torchaudio) are not available in this environment. The deterministic
    fake decoder below keeps the distributed plumbing testable."""


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapt the documents fixture into the media schema (text bytes as
    the opaque payload) — exercises the binary plumbing on real data."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.sha2(F.encode(F.col("text"), "UTF-8"), 256).alias("sha256"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def decode_image(payload: bytes) -> object:
    """STUB: real image decode requires Pillow/opencv (absent here)."""
    raise DecodeUnavailable("image decode requires Pillow/opencv; not in container")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': derives a feature vector from
    payload bytes alone (stand-in for embed(decode(payload))).
    Lane j is (sum of bytes at positions ≡ j mod dim) mod 997, scaled —
    the reference form of the vectorized kernel below (pinned equal in
    tests, and recomputed in SQL by the DuckDB oracle)."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [v / 997.0 for v in acc]


def _fake_feature_numpy(payload: bytes, dim: int = 8) -> "object":
    """Vectorized kernel: byte-slice sums instead of a per-byte Python
    loop. (acc+b)%997 folded per lane equals (Σb)%997, so strided
    slice-sums give the identical lanes ~30x faster — the pattern every
    real decode/embed kernel in this slot should follow (NumPy/Arrow
    batch ops, never per-byte Python)."""
    import numpy as np

    if payload is None:
        return np.zeros(dim)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    return np.array([int(arr[j::dim].sum()) % 997 for j in range(dim)]) / 997.0


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the real distribution pattern for decode/resize/
    frame-sample kernels; only the kernel itself is faked.
    """
    import numpy as np
    import pandas as pd

    from node_js_etl_processor_spark.catalog import spread

    media = spread(media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature_numpy(p, dim) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "feature_dim": np.int64(dim),
                    "feature_l2": [
                        f"{float(np.sqrt(np.dot(f, f))):.6f}" for f in feats
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def q_binary_meta(documents: DataFrame) -> DataFrame:
    """Declared query: metadata-only pass over binary payloads —
    byte length + content digest, computed JVM-side (oracle-checked).

    Scale note: in a real media table this projection never reads the
    payload column (digest/length precomputed at ingest); here they are
    derived inline since the fixture stores text.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha"),
    )


def q_multimodal_features(documents: DataFrame) -> DataFrame:
    """Declared query: full multimodal pipeline — adapt docs to the
    media schema, run Arrow-batched feature extraction via mapInPandas,
    return per-media features. Fully oracle-checked: the fake decode
    kernel is byte-deterministic (per-lane byte sums mod 997), so the
    DuckDB oracle recomputes it from the UTF-8 bytes in SQL — the
    Python kernel's output is differentially verified, not just
    row-counted.

    Scale: this is the canonical 100 TB media pass — no shuffle at all;
    each task Arrow-streams its parquet split through the Python worker
    once, batch size governed by spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    return extract_features(documents_as_media(documents)).orderBy("media_id")
