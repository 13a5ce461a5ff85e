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


def _probe_pil():
    """Import-probe for a real image decoder (PIL). Returns the Image module
    when present, else None — the operator adapts to its environment instead
    of being sandbox-shaped (this container has no media libs, so the probe
    returns None here; the code path is unit-tested behind a skipif)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_media(blob: bytes, kind: str):
    """Decode a media blob. Images decode for real when PIL is importable
    (returns a loaded ``PIL.Image``); audio/video decode (ffmpeg) and the
    no-decoder case raise NotImplementedError — callers fall back to
    ``fake_feature``, the deterministic stand-in."""
    if kind == "image":
        image_mod = _probe_pil()
        if image_mod is not None:
            import io

            img = image_mod.open(io.BytesIO(blob))
            img.load()  # force the decode now: errors surface here, not lazily
            return img
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this environment; "
        "use fake_feature() or plug a decoder into media_features()"
    )


def image_feature(blob: bytes, dim: int = 4) -> list[float]:
    """Real image feature via decode_media: [width, height, n_bands,
    mean-of-first-band-extrema] — deterministic for a given image, used by
    media_features(use_real_decode=True) for image rows when PIL exists."""
    img = decode_media(blob, "image")
    extrema = img.getextrema()
    first = extrema[0] if isinstance(extrema[0], tuple) else extrema
    return [
        float(img.width),
        float(img.height),
        float(len(img.getbands())),
        float((first[0] + first[1]) / 2.0),
    ][:dim]


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


def media_features(media_df: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media, media_kind).

    Batch shape: one pandas DataFrame per Arrow batch; output schema is
    MEDIA_FEATURES_SCHEMA. Default features are the deterministic
    ``fake_feature`` (the oracle contract — environment-independent);
    ``use_real_decode=True`` opts image rows into ``image_feature`` (real
    PIL decode on the executors when importable there), falling back to the
    stub per row when decode is impossible, so a mixed/undecodable corpus
    still yields a full result.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feat(blob, kind):
            b = bytes(blob) if blob is not None else b""
            if use_real_decode and kind == "image":
                try:
                    return image_feature(b)
                except Exception:
                    return fake_feature(b)  # no decoder / corrupt bytes
            return fake_feature(b)

        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else None),
                    "head_byte": blobs.map(lambda b: int(b[0]) if b else None),
                    "media_kind": pdf["media_kind"],
                    "feature": [
                        feat(b, k) for b, k in zip(blobs, pdf["media_kind"])
                    ],
                }
            )

    return media_df.mapInPandas(extract, MEDIA_FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", IntegerType(), True),
        StructField("frame_head", IntegerType(), True),
    ]
)


def frame_sample(media_df: DataFrame, frame_size: int = 256, stride: int = 4) -> DataFrame:
    """1 -> N frame sampling over video blobs (mapInPandas row explosion).

    True frame decode needs ffmpeg (absent here); the deterministic stand-in
    treats the blob as fixed-size byte 'frames' and keeps every ``stride``-th
    one — the Spark plumbing (iterator batches in, MORE rows out, stable
    schema, no cross-batch state) is exactly what a real decoder needs.
    Only rows with media_kind='video' are sampled; the filter is pushed
    before the Python stage.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_n, out_head = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                if blob is None:
                    continue
                b = bytes(blob)
                n_frames = max(1, len(b) // frame_size)
                for fi in range(0, n_frames, stride):
                    chunk = b[fi * frame_size : (fi + 1) * frame_size]
                    out_doc.append(doc_id)
                    out_idx.append(fi)
                    out_n.append(len(chunk))
                    out_head.append(chunk[0] if chunk else None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_bytes": pd.Series(out_n, dtype="int32"),
                    "frame_head": pd.Series(out_head, dtype="Int32"),
                }
            )

    videos = media_df.filter(F.col("media_kind") == "video").select("doc_id", "media")
    return videos.mapInPandas(sample, FRAME_SCHEMA)


def resize_feature(features_df: DataFrame, out_dim: int = 2) -> DataFrame:
    """Feature 'resize' (dimension truncate/pad) — pure Catalyst (slice +
    array padding), no Python: the post-decode tensor reshape step.
    Output (doc_id, feature array<float> of exactly out_dim)."""
    f = F.col("feature")
    padded = F.concat(f, F.array_repeat(F.lit(0.0).cast("float"), out_dim))
    return features_df.select("doc_id", F.slice(padded, 1, out_dim).alias("feature"))
