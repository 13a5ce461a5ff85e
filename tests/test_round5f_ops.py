"""Round-5 batch-6 operators: weighted host PageRank, alias-composition
final keys, integer char-entropy."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestHostPagerank:
    def test_weight_matters(self, spark):
        """b gets 9x a's link mass from s -> b must outrank a after one
        round (equal-split pagerank would tie them)."""
        from webcrawler_woc_spark.operators.graph import host_pagerank_int

        edges = spark.createDataFrame(
            [("s", "a", 1), ("s", "b", 9)],
            "src_host string, dst_host string, n_links bigint",
        )
        got = {r.host: r.rank_ppm for r in host_pagerank_int(edges, iterations=1).collect()}
        # s rank_0 = 1e6; a gets 1e6*1//10, b gets 1e6*9//10
        assert got["a"] == 150_000 + (85 * 100_000) // 100
        assert got["b"] == 150_000 + (85 * 900_000) // 100
        assert got["s"] == 150_000  # dangling-in: teleport only

    def test_mass_conservation_shape(self, spark):
        """Uniform weights reduce to equal-split pagerank on a 2-cycle:
        the fixpoint keeps both at 1e6."""
        from webcrawler_woc_spark.operators.graph import host_pagerank_int

        edges = spark.createDataFrame(
            [("a", "b", 5), ("b", "a", 5)],
            "src_host string, dst_host string, n_links bigint",
        )
        got = {r.host: r.rank_ppm for r in host_pagerank_int(edges, iterations=3).collect()}
        assert got["a"] == got["b"] == 1_000_000


class TestAliasFinalKeys:
    def test_redirect_then_canonical_composes(self, spark):
        from webcrawler_woc_spark.operators.canonical import alias_final_keys

        frontier = spark.createDataFrame(
            [("u0",), ("u1",), ("u2",), ("u3",)], "url string"
        )
        # u1 -> u0 (redirect); u3 -> u2 (redirect), u2 declares canonical c2
        redirects = spark.createDataFrame(
            [("u1", "u0"), ("u3", "u2")], "src string, dst string"
        )
        canon = spark.createDataFrame([("u2", "c2")], "url string, canonical_url string")
        got = {r.url: r for r in alias_final_keys(frontier, redirects, canon).collect()}
        assert (got["u0"].final_key, got["u0"].via_redirect, got["u0"].via_canonical) == ("u0", 0, 0)
        assert (got["u1"].final_key, got["u1"].via_redirect) == ("u0", 1)
        # canonical applies directly to a non-redirecting frontier url
        assert (got["u2"].final_key, got["u2"].via_canonical) == ("c2", 1)
        # and AFTER the redirect for u3: landed on u2, then canonical c2
        assert (got["u3"].final_key, got["u3"].via_redirect, got["u3"].via_canonical) == ("c2", 1, 1)

    def test_alias_rollup_counts(self, spark):
        from webcrawler_woc_spark.operators.canonical import alias_final_keys

        frontier = spark.createDataFrame([("u0",), ("u1",), ("u2",), ("u3",)], "url string")
        redirects = spark.createDataFrame(
            [("u1", "u0"), ("u3", "u2")], "src string, dst string"
        )
        canon = spark.createDataFrame([("u2", "u0")], "url string, canonical_url string")
        out = alias_final_keys(frontier, redirects, canon)
        rollup = {r.final_key: r.n for r in out.groupBy("final_key").agg(F.count("*").alias("n")).collect()}
        # u0 itself, u1 via redirect, u2 via canonical, u3 via both
        assert rollup == {"u0": 4}


class TestCharEntropy:
    def test_matches_python_reference(self, spark):
        from webcrawler_woc_spark.operators.textstats import char_entropy

        def ref_bits(text):
            from collections import Counter

            n = len(text)
            ilog2 = lambda x: x.bit_length() - 1
            return sum(k * (ilog2(n) - ilog2(k)) for k in Counter(text).values())

        texts = {1: "aaaaaaaa", 2: "abcdefgh", 3: "the quick brown fox", 4: ""}
        df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
        got = {r.doc_id: r for r in char_entropy(df).collect()}
        for did, t in texts.items():
            assert got[did].surprisal_bits == ref_bits(t), did
            assert got[did].n_chars == len(t)
            assert got[did].n_distinct_chars == len(set(t))
        # degenerate text scores 0; diverse text scores high
        assert got[1].surprisal_bits == 0
        assert got[2].centibits_per_char == 300  # 8 chars, each ilog2(8)-ilog2(1)=3

    def test_unicode_codepoints(self, spark):
        from webcrawler_woc_spark.operators.textstats import char_entropy

        df = spark.createDataFrame([(1, "日本語テキスト")], "doc_id bigint, text string")
        (r,) = char_entropy(df).collect()
        assert r.n_chars == 7
        assert r.n_distinct_chars == 7
