"""Round-5 batch 3: as-of CDX point lookup, reciprocal-link stats,
co-citation top-k."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


class TestAsofCdx:
    def test_latest_at_or_before_t(self, spark, tmp_path):
        from webcrawler_woc_spark.operators.cdx import asof_cdx, build_cdx, write_cdx

        def ts(s):
            return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=s)

        caps = spark.createDataFrame(
            [
                ("http://a.example/p", ts(100)),
                ("http://a.example/p", ts(200)),
                ("http://a.example/p", ts(300)),  # after T
                ("http://b.example/q", ts(400)),  # first capture after T
                ("http://c.example/r", ts(50)),
            ],
            "url string, capture_ts timestamp",
        )
        path = str(tmp_path / "idx")
        write_cdx(build_cdx(caps), path, n_ranges=3)
        t = int(ts(250).timestamp())
        got = {r.surt: r.epoch for r in asof_cdx(
            spark, path,
            ["http://a.example/p", "http://b.example/q", "http://missing.example/x"],
            t,
        ).collect()}
        assert got == {"example,a)/p": int(ts(200).timestamp())}

    def test_surt_twin_matches_catalyst(self, spark):
        from webcrawler_woc_spark.functions.surt import surt_key
        from webcrawler_woc_spark.operators.cdx import _surt_of

        urls = [
            "http://a.b.example/x/y?q=1",
            "https://host.example",
            "mailto:x@y.z",
            "http://single/p",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        spark_keys = {
            r.url: r.k for r in df.select("url", surt_key(F.col("url")).alias("k")).collect()
        }
        for u in urls:
            assert _surt_of(u) == spark_keys[u], u


class TestReciprocalLinkStats:
    def test_recip_counts(self, spark):
        from webcrawler_woc_spark.operators.graph import reciprocal_link_stats

        edges = spark.createDataFrame(
            [
                ("a", "b"), ("b", "a"),          # reciprocal pair
                ("a", "c"),                       # one-way
                ("a", "c"),                       # multi-edge collapses
                ("c", "c"),                       # self-loop dropped
                ("d", "a"),                       # one-way in
            ],
            "src string, dst string",
        )
        got = {r.node: (r.n_out, r.n_recip, r.recip_ppm)
               for r in reciprocal_link_stats(edges).collect()}
        assert got == {
            "a": (2, 1, 500_000),
            "b": (1, 1, 1_000_000),
            "d": (1, 0, 0),
        }


class TestCocitationTopk:
    def test_pairs_and_cap(self, spark):
        from webcrawler_woc_spark.operators.graph import cocitation_topk

        edges = spark.createDataFrame(
            [
                # t1 cited by a,b,c ; t2 by a,b ; t3 by b,c
                ("a", "t1"), ("b", "t1"), ("c", "t1"),
                ("a", "t2"), ("b", "t2"),
                ("b", "t3"), ("c", "t3"),
            ],
            "src string, dst string",
        )
        rows = cocitation_topk(edges, per_target_cap=5, k=10).collect()
        got = [(r.src_a, r.src_b, r.n_shared) for r in rows]
        assert got == [("a", "b", 2), ("b", "c", 2), ("a", "c", 1)]

    def test_per_target_cap_bounds_fanout(self, spark):
        from webcrawler_woc_spark.operators.graph import cocitation_topk

        # hub target cited by 10 sources; cap=3 keeps only s0,s1,s2 pairs
        edges = spark.createDataFrame(
            [(f"s{i}", "hub") for i in range(10)], "src string, dst string"
        )
        rows = cocitation_topk(edges, per_target_cap=3, k=100).collect()
        assert {(r.src_a, r.src_b) for r in rows} == {
            ("s0", "s1"), ("s0", "s2"), ("s1", "s2")
        }

    def test_topk_is_take_ordered(self, spark):
        from webcrawler_woc_spark.operators.graph import cocitation_topk

        edges = spark.createDataFrame([("a", "t"), ("b", "t")], "src string, dst string")
        plan = cocitation_topk(edges, k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
