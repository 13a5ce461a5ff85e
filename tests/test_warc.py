"""WARC/WET source tests: record framing, bundling, and parse roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, epoch int, text string").select(
        "url", F.timestamp_seconds("epoch").alias("warc_ts"), "text"
    )


class TestWetRecord:
    def test_record_bytes_exact(self, spark):
        from webcrawler_woc_spark.sources.warc import wet_record

        df = _pages(spark, [("http://h0.example/a", 1767225600, "Hi\nthere")])
        rec = df.select(
            wet_record(F.col("url"), F.unix_timestamp("warc_ts"), F.col("text")).alias("r")
        ).head().r
        assert bytes(rec) == (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: http://h0.example/a\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Length: 8\r\n"
            b"\r\n"
            b"Hi\nthere\r\n\r\n"
        )

    def test_content_length_counts_octets_not_chars(self, spark):
        from webcrawler_woc_spark.sources.warc import wet_record

        df = _pages(spark, [("http://h0.example/u", 0, "café")])  # 4 chars, 5 bytes
        rec = bytes(
            df.select(wet_record(F.col("url"), F.lit(0), F.col("text")).alias("r")).head().r
        )
        assert b"Content-Length: 5\r\n" in rec


class TestWetRoundtrip:
    def test_bundle_and_parse(self, spark):
        from webcrawler_woc_spark.sources.warc import parse_wet_bundles, wet_bundle

        rows = [
            ("http://h0.example/a", 100, "alpha"),
            ("http://h0.example/b", 200, "beta\nlines"),
            ("http://h1.example/c", 300, "gamma"),
        ]
        pages = _pages(spark, rows)
        host = F.regexp_extract(F.col("url"), r"^http://([^/]+)/", 1)
        bundles = wet_bundle(pages, host)
        got_bundles = {r.bundle_key: r.n_records for r in bundles.collect()}
        assert got_bundles == {"h0.example": 2, "h1.example": 1}
        parsed = {(r.url, r.warc_epoch, r.text) for r in parse_wet_bundles(bundles).collect()}
        assert parsed == set(rows)

    def test_hot_host_splits_into_capped_blobs(self, spark):
        """One hot host with a byte budget must yield MULTIPLE blobs (the
        100 GB-host OOM guard), each within budget + one record, sequenced
        deterministically by url order, and the parse roundtrip must still
        reproduce every record."""
        from webcrawler_woc_spark.sources.warc import parse_wet_bundles, wet_bundle

        rows = [(f"http://hot.example/p{i:03d}", 100 + i, f"body {i} " + "x" * 50)
                for i in range(20)]
        pages = _pages(spark, rows)
        host = F.regexp_extract(F.col("url"), r"^http://([^/]+)/", 1)
        budget = 400
        bundles = wet_bundle(pages, host, max_bundle_bytes=budget).collect()
        assert len(bundles) > 1  # the hot host split
        assert {b.bundle_key for b in bundles} == {"hot.example"}
        assert sorted(b.bundle_seq for b in bundles) == list(range(len(bundles)))
        max_rec = max(len(r[2].encode()) for r in rows) + len(rows[0][0]) + 120
        assert all(b.n_bytes <= budget + max_rec for b in bundles)
        assert sum(b.n_records for b in bundles) == len(rows)
        parsed = {
            (r.url, r.warc_epoch, r.text)
            for r in parse_wet_bundles(
                wet_bundle(pages, host, max_bundle_bytes=budget)
            ).collect()
        }
        assert parsed == set(rows)

    def test_uncapped_bundle_is_single_blob_seq_zero(self, spark):
        from webcrawler_woc_spark.sources.warc import wet_bundle

        pages = _pages(spark, [("http://h0.example/a", 1, "a"), ("http://h0.example/b", 2, "b")])
        got = wet_bundle(pages, F.lit("k")).collect()
        assert len(got) == 1 and got[0].bundle_seq == 0 and got[0].n_records == 2

    def test_payload_with_crlf_crlf_survives(self, spark):
        """Content-Length framing means separator bytes INSIDE a payload must
        not split records — the bug a regex-based splitter would have."""
        from webcrawler_woc_spark.sources.warc import parse_wet_bundles, wet_bundle

        evil = "top\r\n\r\nWARC/1.0\r\nfake: yes\r\n\r\nbottom"
        pages = _pages(
            spark,
            [("http://h0.example/evil", 42, evil), ("http://h0.example/z", 43, "tail")],
        )
        bundles = wet_bundle(pages, F.lit("one"))
        parsed = {r.url: (r.warc_epoch, r.text) for r in parse_wet_bundles(bundles).collect()}
        assert parsed["http://h0.example/evil"] == (42, evil)
        assert parsed["http://h0.example/z"] == (43, "tail")


class TestWarcResponse:
    def _pages(self, spark, rows):
        import datetime

        data = [
            (u, datetime.datetime.utcfromtimestamp(e), s, ct, body)
            for u, e, s, ct, body in rows
        ]
        return spark.createDataFrame(
            data,
            "url string, warc_ts timestamp, http_status int,"
            " http_content_type string, body binary",
        )

    def test_roundtrip_binary_exact_with_evil_bytes(self, spark):
        """Raw body BYTES must survive: non-UTF8 magic bytes AND an embedded
        CRLFCRLF (both the outer WARC framing and the inner HTTP split are
        length/first-occurrence bounded, never payload-content-sensitive)."""
        from webcrawler_woc_spark.sources.warc import (
            parse_warc_response_bundles,
            warc_response_bundle,
        )

        png = bytes.fromhex("89504E470D0A1A0A") + b"\x00\x01\r\n\r\nHTTP/1.1 999\xff"
        rows = [
            ("http://h0.example/img", 42, 200, "image/png", png),
            ("http://h0.example/gone", 43, 404, "text/html", b"not found"),
            ("http://h0.example/weird", 44, 418, "text/plain", b""),  # non-canonical code, empty body
        ]
        bundles = warc_response_bundle(self._pages(spark, rows), F.lit("k"))
        got = {
            r.url: (r.warc_epoch, r.http_status, r.http_content_type, bytes(r.body))
            for r in parse_warc_response_bundles(bundles).collect()
        }
        assert got["http://h0.example/img"] == (42, 200, "image/png", png)
        assert got["http://h0.example/gone"] == (43, 404, "text/html", b"not found")
        assert got["http://h0.example/weird"] == (44, 418, "text/plain", b"")

    def test_null_optional_fields_cannot_poison_the_bundle(self, spark):
        """A NULL body or NULL Content-Type (a real fetch with no header)
        must serialize defensively — pre-fix, the concat null-propagated,
        the bundle fold turned the WHOLE blob NULL, and every sibling
        record died with it."""
        from webcrawler_woc_spark.sources.warc import (
            parse_warc_response_bundles,
            warc_response_bundle,
        )

        rows = [
            ("http://h0.example/noct", 1, 200, None, b"payload"),
            ("http://h0.example/nobody", 2, 204, "text/html", None),
            ("http://h0.example/ok", 3, 200, "text/html", b"fine"),
        ]
        bundles = warc_response_bundle(self._pages(spark, rows), F.lit("k"))
        got = {
            r.url: (r.http_status, r.http_content_type, bytes(r.body))
            for r in parse_warc_response_bundles(bundles).collect()
        }
        assert len(got) == 3  # the sibling survived
        assert got["http://h0.example/noct"] == (200, "", b"payload")
        assert got["http://h0.example/nobody"] == (204, "text/html", b"")
        assert got["http://h0.example/ok"] == (200, "text/html", b"fine")

    def test_byte_budget_splits_blobs(self, spark):
        from webcrawler_woc_spark.sources.warc import warc_response_bundle

        rows = [
            (f"http://h0.example/{i}", i, 200, "text/html", b"x" * 300)
            for i in range(6)
        ]
        got = warc_response_bundle(
            self._pages(spark, rows), F.lit("k"), max_bundle_bytes=1000
        ).collect()
        assert len(got) > 1  # budget forces multiple blobs
        assert sum(r.n_records for r in got) == 6
