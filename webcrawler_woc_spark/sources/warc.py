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
    return _bundle_blobs(per_page, max_bundle_bytes)


def _bundle_blobs(per_page: DataFrame, max_bundle_bytes: int | None) -> DataFrame:
    """Shared blob assembly for any self-framing record column: wet_bundle
    (conversion records) and warc_response_bundle (response records) differ
    only in how ``rec`` is serialized. Input (bundle_key, url, rec)."""
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


def _scan_warc_records(blob: bytes):
    """THE outer WARC framing scanner, shared by every parser: header block
    up to CRLFCRLF, payload of exactly Content-Length octets, CRLFCRLF
    terminator, repeat. Yields (headers, epoch, payload) per record — a
    framing fix (e.g. tolerating bare LF) lands here once."""
    from datetime import datetime, timezone

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
        yield headers, epoch, payload
        pos = head_end + 4 + length + 4  # skip payload + CRLFCRLF terminator


def _parse_blob(blob: bytes) -> list[tuple[str, int, str]]:
    """WET records: payload IS the extracted text."""
    return [
        (headers["WARC-Target-URI"], epoch, payload.decode("utf-8"))
        for headers, epoch, payload in _scan_warc_records(blob)
    ]


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


# --- WARC `response` records: the full-fidelity Common-Crawl capture form --
# (WET carries extracted text only; the .warc.gz files Common Crawl actually
# archives are HTTP response records — status line + response headers + raw
# body bytes inside the WARC envelope, ISO 28500 §6.3 + RFC 2616 framing).

WARC_HTTP_SCHEMA = (
    "url string, warc_epoch bigint, http_status int,"
    " http_content_type string, body binary"
)

_HTTP_REASONS = (
    (200, "OK"),
    (301, "Moved Permanently"),
    (404, "Not Found"),
    (500, "Internal Server Error"),
)


def warc_response_record(
    url: Column, epoch: Column, status: Column, http_content_type: Column, body: Column
) -> Column:
    """One WARC 1.0 `response` record as a binary column — the HTTP message
    (status line, Content-Type, octet-exact Content-Length, blank line, raw
    body BYTES — binary, never decoded) wrapped in the WARC envelope whose
    own Content-Length counts the whole HTTP block. Pure Catalyst binary
    concat, same zero-Python serialize path as wet_record.

    url/epoch/status are REQUIRED non-null (a NULL would null-propagate
    through concat and poison the whole bundle blob). The two fields a real
    fetch legitimately lacks are defended here: a NULL http_content_type
    omits the Content-Type line (the parser reads it back as ''), a NULL
    body serializes as the empty body — one bad row can never take its
    bundle siblings down."""
    body = F.coalesce(body, F.lit(b""))
    reason = None
    for code, word in _HTTP_REASONS:
        cond = status == code
        reason = F.when(cond, F.lit(word)) if reason is None else reason.when(cond, F.lit(word))
    reason = reason.otherwise(F.lit("Status"))
    ct_line = F.when(
        http_content_type.isNotNull(),
        F.concat(F.lit("Content-Type: "), http_content_type, F.lit(_CRLF)),
    ).otherwise(F.lit(""))
    http_head = F.concat(
        F.lit("HTTP/1.1 "), status.cast("string"), F.lit(" "), reason, F.lit(_CRLF),
        ct_line,
        F.lit("Content-Length: "), F.octet_length(body).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    http_block = F.concat(F.encode(http_head, "utf-8"), body)
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(F.timestamp_seconds(epoch), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("Content-Type: application/http; msgtype=response" + _CRLF),
        F.lit("Content-Length: "), F.octet_length(http_block).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    return F.concat(
        F.encode(header, "utf-8"), http_block, F.encode(F.lit(_CRLF + _CRLF), "utf-8")
    )


def warc_response_bundle(
    pages: DataFrame, bundle_key: Column, max_bundle_bytes: int | None = None
) -> DataFrame:
    """Bundle (url, warc_ts, http_status, http_content_type, body) rows into
    WARC-file blobs — wet_bundle's exact shape (deterministic url-ASC in-blob
    order, byte-budget salting against hot-host OOM) over response records."""
    rec = warc_response_record(
        F.col("url"),
        F.unix_timestamp("warc_ts"),
        F.col("http_status"),
        F.col("http_content_type"),
        F.col("body"),
    )
    per_page = pages.select(bundle_key.alias("bundle_key"), F.col("url"), rec.alias("rec"))
    return _bundle_blobs(per_page, max_bundle_bytes)


def _parse_response_blob(blob: bytes) -> list[tuple[str, int, int, str, bytes]]:
    """WARC response records: the outer framing is the shared scanner; the
    HTTP block splits at ITS first CRLFCRLF — body bytes are everything
    after (outer Content-Length bounds the payload, so a body containing
    CRLFCRLF can never confuse the framing)."""
    out = []
    for headers, epoch, payload in _scan_warc_records(blob):
        ihead_end = payload.index(b"\r\n\r\n")
        http_lines = payload[:ihead_end].decode("utf-8").split(_CRLF)
        status = int(http_lines[0].split(" ")[1])
        http_headers = {}
        for line in http_lines[1:]:
            k, _, v = line.partition(":")
            http_headers[k.strip().lower()] = v.strip()
        body = payload[ihead_end + 4 :]
        out.append(
            (headers["WARC-Target-URI"], epoch, status,
             http_headers.get("content-type", ""), body)
        )
    return out


def parse_warc_response_bundles(bundles: DataFrame) -> DataFrame:
    """WARC response blobs -> (url, warc_epoch, http_status,
    http_content_type, body), one row per record — the mapInPandas
    batch-streaming twin of parse_wet_bundles."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for blob in pdf["wet"]:
                rows.extend(_parse_response_blob(bytes(blob)))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_epoch", "http_status", "http_content_type", "body"],
            )

    return bundles.select("wet").mapInPandas(gen, schema=WARC_HTTP_SCHEMA)
