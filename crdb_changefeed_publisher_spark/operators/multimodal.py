"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batch iteration, partition sizing) is
real and tested; the actual media decoding is STUBBED — the codec libraries
(Pillow/ffmpeg/torchaudio) are not available in this container. Each stub
either raises NotImplementedError (real-decode path) or produces a
deterministic fake (test path), clearly marked.

Scale notes (100 TB of media):
- binary payloads ride the parquet scan; metadata columns are pruned
  independently so metadata-only queries never read the bytes.
- mapInPandas streams Arrow record batches: peak executor memory is
  ~maxRecordsPerBatch * avg_blob_size, tuned via
  spark.sql.execution.arrow.maxRecordsPerBatch (set small for video).
- feature extraction is embarrassingly parallel: no shuffle until the
  (tiny) feature output is aggregated or joined.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"
# double variant for oracle-compared paths: float32 quantization of k/997
# values lands within rounding distance of 4-decimal boundaries often
# enough to flip value hashes
FEATURE_SCHEMA_F64 = "media_id long, kind string, n_bytes int, feature array<double>"


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes are a
    seeded function of media_id (stands in for real image/audio blobs)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("id") * 100).alias("duration_ms"),
    )


def decode_image(payload: bytes) -> "object":  # pragma: no cover - stub
    """REAL decode path — requires an image codec library, not available in
    this container. The Spark plumbing calls extract_features below, which
    routes around this stub deterministically."""
    raise NotImplementedError("image decoding requires a codec library (e.g. Pillow)")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes are
    summed into `dim` buckets mod 997. This scalar form is the semantic
    reference (and what the DuckDB oracle reproduces); the hot path is the
    batch-vectorized `_fake_features_batch` below. Replace with real
    decode+embed when codecs are available."""
    acc = [0] * dim
    for i, b in enumerate(payload or b""):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [v / 997.0 for v in acc]


def _fake_features_batch(payloads: "pd.Series", dim: int = 8) -> "np.ndarray":
    """Whole-Arrow-batch formulation of `_fake_feature`: concatenate the
    batch's payload bytes once, then one bincount over composite buckets
    (row * dim + position % dim). Identical values to the scalar form —
    (a+b) % m applied per step equals sum % m, and float64 sums of byte
    values are exact far beyond any realistic payload size. No per-row or
    per-byte Python."""
    n = len(payloads)
    lens = np.fromiter(
        (len(p) if p is not None else 0 for p in payloads), dtype=np.int64, count=n
    )
    total = int(lens.sum())
    if total == 0:
        return np.zeros((n, dim), dtype=np.float64)
    data = np.frombuffer(b"".join(p for p in payloads if p), dtype=np.uint8)
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    buckets = row * dim + (pos % dim)
    acc = np.bincount(buckets, weights=data, minlength=n * dim)
    return (acc.reshape(n, dim) % 997) / 997.0


def extract_features(
    media: DataFrame, batch_size_hint: int = 256, feature_type: str = "float"
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas keeps the blobs executor-side in Arrow batches; the returned
    features are small, so everything downstream (similarity joins, dedup)
    operates on compact vectors. `feature_type="double"` for oracle-compared
    paths (see FEATURE_SCHEMA_F64).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_features_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": list(feats),
                }
            )

    schema = FEATURE_SCHEMA_F64 if feature_type == "double" else FEATURE_SCHEMA
    return media.mapInPandas(run, schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to decode
    per video (pure column math — real decoding is the stubbed part). This
    is the shape of the operator at scale: plan rows explode to (video,
    frame_ts) work units that partition evenly across executors."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
