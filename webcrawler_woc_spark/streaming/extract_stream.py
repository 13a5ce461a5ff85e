"""Structured-Streaming variant of the extraction pipeline (stretch item,
SURVEY.md §7 — the reference is strictly wave-synchronous batch, so batch
remains the primary mode; this covers continuous-ingest deployments where
new WARC partitions land while the crawl runs).

Design: the pages corpus directory is the stream source (new parquet files =
newly fetched/ingested pages); each micro-batch runs the SAME wave kernel
(MIME gate -> Arrow extraction -> canonicalize -> type) and appends the
discovered links; the seen-set dedup stays in the batch loop (foreachBatch
gives exactly-once file commits via the checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_child_links, mime_ok
from ..schemas import PAGES_SCHEMA


def stream_extract_links(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    content_type_expr=None,
    trigger_available_now: bool = True,
):
    """readStream(pages) -> extraction kernel -> append(links parquet).

    Returns the StreamingQuery. ``availableNow`` drains everything currently
    in the directory then stops (used by tests and backfills); without it the
    query keeps tailing new files.
    """
    if content_type_expr is None:
        from ..sources.corpus import default_content_type_expr

        content_type_expr = default_content_type_expr

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(pages_dir)
    )
    gated = pages.withColumn("content_type", content_type_expr(F.col("url"))).filter(
        mime_ok(F.col("content_type"))
    )
    links = extract_child_links(gated)

    writer = (
        links.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
