"""Multimodal-column plumbing: opaque binary media + typed metadata.

Real decode (image/audio/video) libraries are absent in this sandbox, so the
DECODE step is stubbed (deterministic fake features / NotImplementedError for
true decode), while everything Spark-side is real and tested: binary column
handling, mapInPandas batch shape, output schema, partition preservation.

At scale: media bytes live in the same parquet row-group as metadata;
``media_features`` runs one Arrow batch at a time (bounded executor memory,
``spark.sql.execution.arrow.maxRecordsPerBatch``), and the UDF never
concatenates batches — the iterator protocol streams them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("head_byte", IntegerType(), True),
        StructField("media_kind", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media column: the utf-8 bytes of the text
    (stands in for image/audio payloads; keeps the binary-column plumbing
    real). media_kind cycles by doc_id."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("media"), kind.alias("media_kind")
    )


def decode_media(blob: bytes, kind: str):
    """STUB — true decode requires PIL/ffmpeg, absent in this sandbox.

    Raises NotImplementedError for real decoding; callers use
    ``fake_feature`` for the deterministic stand-in."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this environment; "
        "use fake_feature() or plug a decoder into media_features()"
    )


def fake_feature(blob: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in feature: [len, first, last, sum%997]."""
    if not blob:
        return [0.0] * dim
    return [
        float(len(blob)),
        float(blob[0]),
        float(blob[-1]),
        float(sum(blob[:64]) % 997),
    ][:dim]


def media_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media, media_kind).

    Batch shape: one pandas DataFrame per Arrow batch; output schema is
    MEDIA_FEATURES_SCHEMA. Swap ``fake_feature`` for a real decoder without
    touching the Spark plumbing.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else None),
                    "head_byte": blobs.map(lambda b: int(b[0]) if b else None),
                    "media_kind": pdf["media_kind"],
                    "feature": blobs.map(lambda b: fake_feature(bytes(b) if b is not None else b"")),
                }
            )

    return media_df.mapInPandas(extract, MEDIA_FEATURES_SCHEMA)
