"""Round-5 batch-9 operators: k-core peeling, seed-expansion discovery,
readability stats."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestKcore:
    def test_clique_survives_chain_sheds(self, spark):
        from webcrawler_woc_spark.operators.graph import kcore_nodes

        clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]  # K4: deg 3
        chain = [(10, 11), (11, 12), (12, 13)]  # degrees <= 2
        bridge = [(3, 10)]
        e = spark.createDataFrame(clique + chain + bridge, "src bigint, dst bigint")
        got = {r.doc_id: r.degree for r in kcore_nodes(e, k=3).collect()}
        assert set(got) == {0, 1, 2, 3}
        assert all(d == 3 for d in got.values())

    def test_cascading_removal(self, spark):
        """Removing a leaf drops its neighbor below k in the NEXT round."""
        from webcrawler_woc_spark.operators.graph import kcore_nodes

        # path 1-2-3-4-5: 2-core is empty, but round 1 only drops 1 and 5
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src bigint, dst bigint"
        )
        assert kcore_nodes(e, k=2, max_rounds=3).count() == 0

    def test_whole_graph_is_its_own_core(self, spark):
        from webcrawler_woc_spark.operators.graph import kcore_nodes

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "src bigint, dst bigint"
        )
        got = {r.doc_id for r in kcore_nodes(e, k=2).collect()}
        assert got == {1, 2, 3}


class TestSeedExpansion:
    def test_rank_by_seed_link_mass(self, spark):
        from webcrawler_woc_spark.operators.graph import seed_expansion

        edges = spark.createDataFrame(
            [
                ("s1", "a", 10, 2),
                ("s2", "a", 5, 1),
                ("s1", "b", 8, 1),
                ("s1", "s2", 99, 9),   # seed->seed: excluded
                ("x", "c", 100, 4),    # non-seed source: ignored
            ],
            "src_host string, dst_host string, n_links bigint, n_src_pages bigint",
        )
        seeds = spark.createDataFrame([("s1",), ("s2",)], "host string")
        rows = seed_expansion(edges, seeds).collect()
        got = {r.host: r for r in rows}
        assert set(got) == {"a", "b"}
        assert (got["a"].seed_links, got["a"].n_seed_sources, got["a"].rank) == (15, 2, 1)
        assert (got["b"].seed_links, got["b"].rank) == (8, 2)

    def test_top_k_and_tiebreak(self, spark):
        from webcrawler_woc_spark.operators.graph import seed_expansion

        edges = spark.createDataFrame(
            [("s", f"h{i}", 7, 1) for i in range(5)],
            "src_host string, dst_host string, n_links bigint, n_src_pages bigint",
        )
        seeds = spark.createDataFrame([("s",)], "host string")
        rows = seed_expansion(edges, seeds, top_k=3).collect()
        assert [r.host for r in sorted(rows, key=lambda r: r.rank)] == ["h0", "h1", "h2"]


class TestReadability:
    def test_ratios(self, spark):
        from webcrawler_woc_spark.operators.textstats import readability_stats

        df = spark.createDataFrame(
            [
                (1, "Short words here. And more now!"),
                (2, "extraordinarily complicated bureaucratic terminology"),
                (3, ""),
            ],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r for r in readability_stats(df).collect()}
        r1 = got[1]
        assert (r1.n_sents, r1.n_words) == (2, 6)
        assert r1.words_per_sent_ppm == 3_000_000
        # chars: 5+5+5+3+4+4 = 26 incl punctuation attached to tokens
        assert r1.chars_per_word_ppm == (26 * 1_000_000) // 6
        r2 = got[2]
        assert (r2.n_sents, r2.n_words) == (1, 4)
        assert r2.long_word_ratio_ppm == 1_000_000
        r3 = got[3]
        assert (r3.n_sents, r3.n_words, r3.words_per_sent_ppm) == (0, 0, 0)
