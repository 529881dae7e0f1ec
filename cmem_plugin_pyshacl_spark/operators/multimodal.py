"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas.

The image/audio codec libraries are not available in this container, so the
DECODE step is stubbed (deterministic fake derived from the bytes, clearly
marked). Everything Spark-side is real and tested: schemas, Arrow batch
iteration, partition-preserving mapInPandas plumbing, and the metadata
model — swapping the stub for Pillow/torchaudio later changes only the
body of `_decode_stub`.

Scale: mapInPandas streams Arrow batches; per-batch memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (set it to keep
batch_rows * max_blob_size under executor memory at 100 TB — e.g. 128 rows
for 10 MB images).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes | None, dim: int = 8) -> list[float]:
    """STUB decode/feature-extract: deterministic fake feature vector from
    the payload bytes (byte-histogram folded to `dim` buckets). A real
    deployment replaces this body with an actual decoder; the function
    signature, batching, and schema stay identical.
    """
    if payload is None:
        return [0.0] * dim
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    total = max(1, len(payload))
    return [round(c / total, 6) for c in buckets]


def decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads; partition- and
    order-agnostic, Arrow-batched."""

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": pdf["payload"].map(lambda p: _decode_stub(p, dim)),
                }
            )

    return media.mapInPandas(_fn, schema=FEATURE_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing — decode step stubbed (no codec libs in this
    container): raises NotImplementedError per media row kind='image' if
    actually executed with decode=True semantics; shape/partitioning are
    real."""

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError(
                "image decode requires a codec library not present in this "
                "container; plumbing (schema/batching) is complete"
            )

    return media.mapInPandas(_fn, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_ts_ms) rows
    from the metadata duration — the real decode hook is the stub above."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta_duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic media fixture (binary payload derived from the id)."""
    df = spark.range(n)
    return df.select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string"))), "utf-8"
        ).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.when(F.col("id") % 3 == 0, ((F.col("id") % 8 + 1) * 64).cast("int")).alias("meta_width"),
        F.when(F.col("id") % 3 == 0, ((F.col("id") % 6 + 1) * 64).cast("int")).alias("meta_height"),
        F.when(F.col("id") % 3 == 2, ((F.col("id") % 10 + 1) * 1000).cast("int")).alias(
            "meta_duration_ms"
        ),
    )
