"""Per-host fetch-rate metering as a watermarked windowed streaming agg.

The politeness scheduler (operators/politeness.py) bounds fetches per host
per WAVE; a continuous-ingest deployment meters the same thing per host per
TIME WINDOW: tumbling-window counts over the fetch timestamps, with a
watermark so late-arriving fetch records (stragglers from slow executors /
retries) still land in their window until the lateness bound passes. This is
the canonical Structured Streaming windowed-aggregation shape (watermark +
window + count) the engine was missing next to its custom stateful op
(dedup_stream.py).

Scale notes: state = one count per (host, window) — bounded by
active-hosts x windows-in-watermark, evicted as the watermark passes.
Partitioning is by the group key, so hot hosts skew exactly like the batch
politeness problem; the salted pre-trim answer lives upstream (the fetch
stream is already politeness-bounded per wave).

Sink: the demo query uses a complete-mode in-memory sink (driver-bounded:
hosts x windows is tiny). A production deployment would use update mode
with a keyed upsert sink (Iceberg/Delta MERGE) — documented deviation, the
aggregation plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fetch import host_expr
from ..schemas import PAGES_SCHEMA


def stream_host_fetch_rate(
    spark: SparkSession,
    pages_dir: str,
    query_name: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 8,
):
    """readStream(pages parquet) -> watermark(warc_ts) -> tumbling-window
    count per host -> complete-mode memory table ``query_name``.

    Returns the StreamingQuery; read results with
    ``spark.table(query_name)`` after awaitTermination.
    """
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_dir)
    )
    fetches = pages.select(host_expr(F.col("url")).alias("host"), F.col("warc_ts"))
    agg = (
        fetches.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_fetches"))
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def host_rate_result(spark: SparkSession, query_name: str) -> DataFrame:
    """(host, window_start epoch BIGINT, n_fetches) from the memory table —
    epoch seconds so the DuckDB oracle hashes identically (timestamp columns
    export differently across engines)."""
    return spark.table(query_name).select(
        "host",
        F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
        "n_fetches",
    )
