"""WARC/WET source + sink — the Common-Crawl at-rest record format.

Common Crawl ships page text as WET files (ISO 28500 WARC `conversion`
records: CRLF headers, Content-Length octet framing, blank-line separator,
record terminated by CRLF CRLF). A crawl engine at 100 TB reads and writes
this framing, so both directions are first-class here:

* **serialize** (`wet_record`) — pure Catalyst binary concat: header bytes +
  UTF-8 payload + terminator, octet-accurate Content-Length. JVM-side,
  codegen'd, zero Python.
* **bundle** (`wet_bundle`) — many records per blob (a WET *file*), grouped
  by host with a deterministic in-blob order. At scale one blob ≈ one
  object-store part file; the groupBy is one shuffle on the bundle key.
* **parse** (`parse_wet_bundles`) — `mapInPandas` over blobs: a pure-Python
  length-framed scanner (no regex over payloads — Content-Length framing
  means payload bytes are never inspected), one Arrow batch per invocation,
  emitting one row per record. Python is unavoidable for a byte-framed
  format Spark has no reader for; Arrow batching keeps it off the per-row
  path (same pattern as operators/multimodal.py).

The reference crawler has no archive format (links go straight to JSON,
`/root/reference/src/file_handler.rs:47-82`); WET support is part of the
beyond-reference training-data surface. Round-trip is oracle-checked
(`crawl_wet_roundtrip`): serialize -> bundle -> parse must reproduce
(url, epoch, text) exactly; the DuckDB twin predicts those values
arithmetically from `documents`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WET_SCHEMA = "url string, warc_epoch bigint, text string"
_CRLF = "\r\n"


def wet_record(url: Column, epoch: Column, text: Column) -> Column:
    """One WARC 1.0 `conversion` record as a binary column.

    Content-Length counts payload OCTETS (UTF-8 bytes, not chars) per spec;
    WARC-Date is ISO-8601 Zulu (session timeZone is pinned to UTC in
    session.py, so date_format is deterministic)."""
    payload = F.encode(text, "utf-8")
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(F.timestamp_seconds(epoch), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("Content-Length: "), F.octet_length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    return F.concat(F.encode(header, "utf-8"), payload, F.encode(F.lit(_CRLF + _CRLF), "utf-8"))


def wet_bundle(
    pages: DataFrame, bundle_key: Column, max_bundle_bytes: int | None = None
) -> DataFrame:
    """Bundle per-page WET records into blobs (one blob ≈ one WET "file"):
    (bundle_key, bundle_seq, wet binary, n_records, n_bytes). In-blob order
    is pinned (url ASC) so blob bytes are deterministic; records are
    self-framing, so readers never need the order.

    ``max_bundle_bytes`` is the scale guard: a hot host with 100 GB of text
    must NOT become one in-memory blob (`collect_list` of the whole host =
    executor OOM). With a budget, records are laid out in url order and the
    key is salted by the running byte offset — ``bundle_seq = cum_bytes_before
    div budget`` — so each blob holds at most budget + one record of bytes
    (real WET files cap at ~1 GiB the same way). ``None`` keeps the single
    blob per key (bundle_seq = 0) for small exports."""
    rec = wet_record(F.col("url"), F.unix_timestamp("warc_ts"), F.col("text"))
    per_page = pages.select(bundle_key.alias("bundle_key"), F.col("url"), rec.alias("rec"))
    if max_bundle_bytes is None:
        keyed = per_page.withColumn("bundle_seq", F.lit(0).cast("int"))
    else:
        from pyspark.sql import Window

        w = (
            Window.partitionBy("bundle_key")
            .orderBy(F.asc("url"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum0 = F.coalesce(F.sum(F.octet_length("rec")).over(w), F.lit(0).cast("bigint"))
        keyed = (
            per_page.withColumn("_cum0", cum0)
            .withColumn("bundle_seq", F.expr(f"CAST(_cum0 div {max_bundle_bytes} AS INT)"))
            .drop("_cum0")
        )
    bundled = keyed.groupBy("bundle_key", "bundle_seq").agg(
        F.aggregate(
            F.transform(F.array_sort(F.collect_list(F.struct("url", "rec"))), lambda s: s["rec"]),
            F.lit(b""),
            lambda acc, r: F.concat(acc, r),
        ).alias("wet"),
        F.count("*").cast("int").alias("n_records"),
    )
    return bundled.select(
        "bundle_key",
        "bundle_seq",
        "wet",
        "n_records",
        F.octet_length("wet").cast("bigint").alias("n_bytes"),
    )


def _parse_blob(blob: bytes) -> list[tuple[str, int, str]]:
    """Length-framed WET scanner: header block up to CRLFCRLF, payload of
    exactly Content-Length octets, CRLFCRLF terminator, repeat."""
    from datetime import datetime, timezone

    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.index(b"\r\n\r\n", pos)
        headers = {}
        for line in blob[pos:head_end].decode("utf-8").split(_CRLF)[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        length = int(headers["Content-Length"])
        payload = blob[head_end + 4 : head_end + 4 + length]
        ts = datetime.strptime(headers["WARC-Date"], "%Y-%m-%dT%H:%M:%SZ")
        epoch = int(ts.replace(tzinfo=timezone.utc).timestamp())
        out.append((headers["WARC-Target-URI"], epoch, payload.decode("utf-8")))
        pos = head_end + 4 + length + 4  # skip payload + CRLFCRLF terminator
    return out


def parse_wet_bundles(bundles: DataFrame) -> DataFrame:
    """WET blobs -> (url, warc_epoch, text), one row per record.

    mapInPandas iterator form: one Arrow batch in, a DataFrame of all its
    records out — scale-safe because blobs stream batch-by-batch (a 1 GiB
    WET file never concatenates with its neighbors in memory)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, int, str]] = []
            for blob in pdf["wet"]:
                rows.extend(_parse_blob(bytes(blob)))
            yield pd.DataFrame(rows, columns=["url", "warc_epoch", "text"])

    return bundles.select("wet").mapInPandas(gen, schema=WET_SCHEMA)
