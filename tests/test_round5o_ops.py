"""Round-5 batch-15 operators: capture freshness stats, vocabulary growth."""

from __future__ import annotations

from pyspark.sql import functions as F

DAY_MS = 86_400_000


class TestFreshnessStats:
    def test_latest_capture_wins_and_percentiles(self, spark):
        from webcrawler_woc_spark.operators.recrawl import freshness_stats

        now = 100 * DAY_MS
        rows = (
            # u1 captured long ago AND yesterday -> age 1 (latest wins)
            [("h1", "u1", 10 * DAY_MS), ("h1", "u1", 99 * DAY_MS)]
            # nine urls aged 1..9 days
            + [("h1", f"u{i}", (100 - i) * DAY_MS) for i in range(2, 11)]
            # one stale host
            + [("h2", "v1", 30 * DAY_MS), ("h2", "v2", 50 * DAY_MS)]
        )
        df = spark.createDataFrame(rows, "host string, url string, capture_ms bigint")
        got = {r.host: r for r in freshness_stats(df, now_ms=now).collect()}
        h1 = got["h1"]
        assert h1.n_urls == 10
        # ages 1..10? u1 age 1, u2..u10 ages 2..9 -> sorted [1,2,...,9] + ?
        assert h1.median_age_days == 5  # nearest-rank p50 of [1..9,1]
        assert h1.n_stale_30d == 0 and h1.stale_ppm == 0
        h2 = got["h2"]
        assert h2.n_urls == 2
        assert h2.n_stale_30d == 2  # ages 70 and 50
        assert h2.stale_ppm == 1_000_000
        assert h2.p90_age_days == 70

    def test_exact_nearest_rank(self, spark):
        from webcrawler_woc_spark.operators.recrawl import freshness_stats

        now = 100 * DAY_MS
        rows = [("h", f"u{i}", (100 - i) * DAY_MS) for i in (10, 20, 30, 40)]
        df = spark.createDataFrame(rows, "host string, url string, capture_ms bigint")
        (r,) = freshness_stats(df, now_ms=now).collect()
        # ages [10,20,30,40]: p50 idx = ceil(4*50/100) = 2 -> 20
        assert r.median_age_days == 20
        # p90 idx = ceil(4*90/100) = 4 -> 40
        assert r.p90_age_days == 40


class TestVocabGrowth:
    def test_growth_accounting(self, spark):
        from webcrawler_woc_spark.operators.textstats import vocab_growth

        # 10 docs, 2 buckets of 5; bucket 0 introduces a..e, bucket 1 adds f
        rows = [(i, f"w{min(i, 4)} shared") for i in range(5)] + [
            (5 + i, "shared new" + str(i % 2)) for i in range(5)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r.bucket: r for r in vocab_growth(df, n_buckets=2).collect()}
        # bucket 0 terms: w0..w4, shared -> 6 new
        assert got[0].n_new_terms == 6
        # bucket 1 adds new0, new1 only
        assert got[1].n_new_terms == 2
        assert got[1].cum_terms == 8
        assert got[0].cum_terms == 6

    def test_total_matches_distinct_vocab(self, spark):
        from webcrawler_woc_spark.operators.textstats import vocab_growth

        rows = [(i, f"t{i % 17} t{i % 5} fixed") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = vocab_growth(df, n_buckets=4).collect()
        total = max(r.cum_terms for r in out)
        exact = (
            df.select(F.explode(F.split("text", " ")).alias("t"))
            .select("t").distinct().count()
        )
        assert total == exact
