"""Round-5 batch-8 operators: CDC version pairs, shared-IP co-hosting,
sitemap-coverage audit."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


class TestCdcVersionPairs:
    def _corpus(self, spark):
        rng = random.Random(11)
        words = [f"w{rng.randrange(10**6)}" for _ in range(600)]
        base = " ".join(words)
        edited = "NEW HEADLINE INSERTED " + base  # version of base
        other = " ".join(f"z{i}" for i in range(300))
        return spark.createDataFrame(
            [(1, base), (2, edited), (3, other)], "doc_id bigint, text string"
        )

    def test_version_pair_found_unrelated_not(self, spark):
        from webcrawler_woc_spark.operators.dedup import cdc_version_pairs

        out = cdc_version_pairs(self._corpus(spark), divisor=16).collect()
        pairs = {(r.doc_a, r.doc_b): r for r in out}
        assert (1, 2) in pairs
        r = pairs[(1, 2)]
        assert r.sim_ppm >= 500_000
        assert r.n_shared <= min(r.n_a, r.n_b)
        assert not any(3 in p for p in pairs)

    def test_hub_cap_excludes_boilerplate_chunks(self, spark):
        """A chunk shared by MANY docs must not pair them all pairwise."""
        from webcrawler_woc_spark.operators.dedup import cdc_version_pairs

        rng = random.Random(13)
        boiler = " ".join(f"b{rng.randrange(10**6)}" for _ in range(40))
        docs = [
            (i, boiler + " " + " ".join(f"u{i}x{j}" for j in range(60)))
            for i in range(10)
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        out = cdc_version_pairs(df, divisor=16, hub_cap=5).collect()
        # every pairing chunk is in all 10 docs (> cap): no pairs survive
        assert out == []


class TestCohostClusters:
    def test_counts_flags_and_null_ip(self, spark):
        from webcrawler_woc_spark.operators.dns import cohost_clusters

        rows = [
            ("a.example", "10.0.0.1"),
            ("b.example", "10.0.0.1"),
            ("c.example", "10.0.0.1"),
            ("solo.example", "10.0.0.2"),
            ("dead.example", None),
        ]
        df = spark.createDataFrame(rows, "host string, ip string")
        got = {r.host: r for r in cohost_clusters(df).collect()}
        assert got["a.example"].n_cohosts == 3
        assert got["a.example"].rep_host == "a.example"
        assert got["b.example"].co_hosted == 1
        assert got["solo.example"].co_hosted == 0
        assert got["dead.example"].n_cohosts == 0
        assert got["dead.example"].co_hosted == 0
        assert got["dead.example"].rep_host is None


class TestSitemapCoverage:
    def test_rollup(self, spark):
        from webcrawler_woc_spark.operators.sitemaps import sitemap_coverage

        declared = spark.createDataFrame(
            [("h1", "u1"), ("h1", "u2"), ("h1", "u3"), ("h1", "u3"), ("h2", "u9")],
            "host string, url string",
        )
        crawled = spark.createDataFrame(
            [("h1", "u1"), ("h1", "u4"), ("h3", "u5")], "host string, url string"
        )
        got = {r.host: r for r in sitemap_coverage(declared, crawled).collect()}
        h1 = got["h1"]
        assert (h1.n_declared, h1.n_crawled, h1.n_both) == (3, 2, 1)
        assert (h1.n_declared_only, h1.n_crawled_only) == (2, 1)
        assert h1.coverage_ppm == 1_000_000 // 3
        # declared-only host and crawled-only host both appear
        assert (got["h2"].n_declared, got["h2"].n_crawled, got["h2"].coverage_ppm) == (1, 0, 0)
        assert (got["h3"].n_declared, got["h3"].n_crawled) == (0, 1)
        assert got["h3"].coverage_ppm == 0
