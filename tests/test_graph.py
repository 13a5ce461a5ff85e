"""Link-graph operators (operators/graph.py) on crafted graphs with
hand-computable values; corpus-scale parity is pinned by the DuckDB oracle
gate (graph_pagerank / graph_components)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _g(spark, n, edge_list):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return nodes, edges


class TestPagerankInt:
    def test_two_node_cycle_keeps_symmetric_rank(self, spark):
        from webcrawler_woc_spark.operators.graph import pagerank_int

        nodes, edges = _g(spark, 2, [(0, 1), (1, 0)])
        got = {r["doc_id"]: r["rank_ppm"] for r in pagerank_int(nodes, edges, 3).collect()}
        # symmetric cycle: rank stays at the fixpoint 150000 + 850000 = 10^6
        assert got == {0: 1_000_000, 1: 1_000_000}

    def test_sink_receives_damped_inflow(self, spark):
        from webcrawler_woc_spark.operators.graph import pagerank_int

        # 0 -> 2, 1 -> 2; node 2 dangling (mass dropped by contract)
        nodes, edges = _g(spark, 3, [(0, 2), (1, 2)])
        got = {r["doc_id"]: r["rank_ppm"] for r in pagerank_int(nodes, edges, 1).collect()}
        assert got[0] == 150_000 and got[1] == 150_000  # no inflow
        assert got[2] == 150_000 + (85 * 2_000_000) // 100

    def test_integer_division_is_floor(self, spark):
        from webcrawler_woc_spark.operators.graph import pagerank_int

        # node 0 has out-degree 3: contribution = 10^6 // 3 = 333333 (floor)
        nodes, edges = _g(spark, 4, [(0, 1), (0, 2), (0, 3)])
        got = {r["doc_id"]: r["rank_ppm"] for r in pagerank_int(nodes, edges, 1).collect()}
        assert got[1] == 150_000 + (85 * 333_333) // 100


class TestConnectedComponents:
    def test_two_components(self, spark):
        from webcrawler_woc_spark.operators.graph import connected_components

        nodes, edges = _g(spark, 6, [(0, 1), (1, 2), (4, 5)])
        got = {r["doc_id"]: r["component"] for r in connected_components(nodes, edges, 5).collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}

    def test_chain_converges_within_rounds(self, spark):
        from webcrawler_woc_spark.operators.graph import connected_components

        # path 0-1-2-3-4: min-label needs ceil(diameter) rounds; 5 suffices
        nodes, edges = _g(spark, 5, [(i, i + 1) for i in range(4)])
        got = {r["doc_id"]: r["component"] for r in connected_components(nodes, edges, 5).collect()}
        assert set(got.values()) == {0}

    def test_direction_is_ignored(self, spark):
        from webcrawler_woc_spark.operators.graph import connected_components

        # edge 5 -> 0 only: undirected propagation must still merge them
        nodes, edges = _g(spark, 6, [(5, 0)])
        got = {r["doc_id"]: r["component"] for r in connected_components(nodes, edges, 2).collect()}
        assert got[5] == 0 and got[0] == 0


class TestTriangles:
    def test_counts_each_triangle_once(self, spark):
        from webcrawler_woc_spark.operators.graph import triangle_count

        # K4 on {1,2,3,4} has 4 triangles; edge directions/dupes must not matter
        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 3), (5, 5)],
            "src bigint, dst bigint",
        )
        assert triangle_count(edges).head().n_triangles == 4

    def test_no_triangles_in_a_path(self, spark):
        from webcrawler_woc_spark.operators.graph import triangle_count

        edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint")
        assert triangle_count(edges).head().n_triangles == 0

    def test_star_graph_skew(self, spark):
        """Star hub (the hot-host shape degree orientation exists for): hub 0
        with 50 spokes has 0 triangles; adding one spoke-spoke edge makes
        exactly 1. Under degree orientation the hub is every edge's SINK
        (highest degree), so its wedge fan-out is 0 — the skew mitigation —
        while the count stays exact."""
        from webcrawler_woc_spark.operators.graph import triangle_count

        spokes = [(0, i) for i in range(1, 51)]
        edges = spark.createDataFrame(spokes, "src bigint, dst bigint")
        assert triangle_count(edges).head().n_triangles == 0
        edges2 = spark.createDataFrame(spokes + [(7, 33)], "src bigint, dst bigint")
        assert triangle_count(edges2).head().n_triangles == 1

    def test_orientation_invariance_on_random_graph(self, spark):
        """Degree orientation must not change the count vs the naive id-order
        enumeration — pinned on a deterministic pseudo-random graph."""
        from webcrawler_woc_spark.operators.graph import triangle_count

        edge_list = [
            (a, b)
            for a in range(20)
            for b in range(a + 1, 20)
            if (a * 7 + b * 13) % 5 == 0
        ]
        edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
        # independent truth: brute-force count in Python
        es = {frozenset(e) for e in edge_list}
        truth = sum(
            1
            for a in range(20)
            for b in range(a + 1, 20)
            for c in range(b + 1, 20)
            if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= es
        )
        assert triangle_count(edges).head().n_triangles == truth


class TestHitsInt:
    """Integer HITS: on a directed star u0 -> {v1..v4}, u0 is the unique
    max hub and every v is an equal max authority; corpus-scale parity is
    the graph_hits chained-CTE oracle."""

    def test_star_hub_and_authorities(self, spark):
        from webcrawler_woc_spark.operators.graph import hits_int

        nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        edges = spark.createDataFrame(
            [(0, v) for v in (1, 2, 3, 4)] + [(5, 1)], "src long, dst long"
        )
        out = {r.doc_id: r for r in hits_int(nodes, edges, iterations=2).collect()}
        assert out[0].hub_ppm == 1_000_000  # the star center is THE hub
        assert out[5].hub_ppm < out[0].hub_ppm  # single-edge hub is weaker
        assert out[1].auth_ppm == 1_000_000  # doubly-cited: the max authority
        for v in (2, 3, 4):
            assert 0 < out[v].auth_ppm < 1_000_000
            assert out[v].auth_ppm == out[2].auth_ppm  # symmetric authorities
        assert out[0].auth_ppm == 0  # nothing links TO the center
        for v in (1, 2, 3, 4):
            assert out[v].hub_ppm == 0  # leaves link to nothing

    def test_empty_graph_all_zero(self, spark):
        from webcrawler_woc_spark.operators.graph import hits_int

        nodes = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
        edges = spark.createDataFrame([], "src long, dst long")
        out = hits_int(nodes, edges, iterations=2).collect()
        assert all(r.hub_ppm == 0 and r.auth_ppm == 0 for r in out)

    def test_zero_iterations_rejected(self, spark):
        import pytest

        from webcrawler_woc_spark.operators.graph import hits_int

        nodes = spark.createDataFrame([(0,)], "doc_id long")
        edges = spark.createDataFrame([], "src long, dst long")
        with pytest.raises(ValueError):
            hits_int(nodes, edges, iterations=0)

    def test_overflow_scale_graph_fails_loudly(self, spark):
        """VERDICT r4 item 7: a node whose in-degree exceeds the bigint ppm
        headroom (~9.22e6: sum <= deg*10^6, rescale *10^6) must raise a
        ValueError at entry — not wrap (non-ANSI) or die mid-iteration
        (ANSI). Real overflow-scale star graph, no mocked degrees."""
        import pytest
        from pyspark.sql import functions as F

        from webcrawler_woc_spark.operators.graph import hits_int

        n = 9_300_000  # > (2^63-1) // 10^12
        edges = spark.range(n).select(
            (F.col("id") + 1).alias("src"), F.lit(0).cast("long").alias("dst")
        )
        nodes = spark.range(2).select(F.col("id").alias("doc_id"))  # unused past the guard
        with pytest.raises(ValueError, match="headroom"):
            hits_int(nodes, edges, iterations=1)

    def test_max_degree_graph_under_headroom_runs(self, spark):
        """The guard measures per-side degree, not combined: a node with
        5e6 in-links AND out-links (combined 10e6 > headroom) is fine."""
        from pyspark.sql import functions as F

        from webcrawler_woc_spark.operators.graph import hits_int

        half = 5_000_000
        e_in = spark.range(half).select((F.col("id") + 1).alias("src"), F.lit(0).alias("dst"))
        e_out = spark.range(half).select(
            F.lit(0).alias("src"), (F.col("id") + 1 + half).alias("dst")
        )
        nodes = spark.range(3).select(F.col("id").alias("doc_id"))
        # guard passes; the iterations themselves run on the 3 gate nodes
        out = hits_int(nodes, e_in.unionAll(e_out), iterations=1).collect()
        assert len(out) == 3


class TestPagerankIncremental:
    def test_empty_delta_identity(self, spark):
        """THE warm-start identity: k cold rounds + j seeded rounds over the
        same graph == k + j cold rounds (uniform seed is what cold rounds
        start from, so seeding with round-k scores must continue the chain
        exactly)."""
        from webcrawler_woc_spark.operators.graph import (
            pagerank_incremental,
            pagerank_int,
        )

        nodes, edges = _g(spark, 5, [(0, 1), (1, 2), (2, 0), (3, 2), (0, 4)])
        empty = edges.filter("src < 0")
        prior = pagerank_int(nodes, edges, iterations=2)
        warm = {
            r.doc_id: r.rank_ppm
            for r in pagerank_incremental(nodes, edges, empty, prior, 2).collect()
        }
        cold = {
            r.doc_id: r.rank_ppm for r in pagerank_int(nodes, edges, 4).collect()
        }
        assert warm == cold

    def test_new_nodes_seed_at_uniform(self, spark):
        """A doc discovered by the delta wave has no prior score: it must
        seed at 10^6 ppm (what a cold start gives every node), and the delta
        edge must actually contribute to its target."""
        from webcrawler_woc_spark.operators.graph import (
            pagerank_incremental,
            pagerank_int,
        )

        nodes_old, base = _g(spark, 2, [(0, 1)])
        nodes_all = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
        delta = spark.createDataFrame([(2, 1)], "src long, dst long")
        prior = pagerank_int(nodes_old, base, iterations=1)
        got = {
            r.doc_id: r.rank_ppm
            for r in pagerank_incremental(nodes_all, base, delta, prior, 1).collect()
        }
        # node 2 had no prior: seeds at 10^6, contributes 10^6 to node 1
        # alongside node 0's prior 150000 (no inflow in round 1 on base)
        assert got[2] == 150_000  # no inflow itself
        assert got[1] == 150_000 + (85 * (150_000 + 1_000_000)) // 100

    def test_union_dedups_overlapping_delta_edges(self, spark):
        """A delta that re-reports an existing edge must not double its
        contribution (edges are a SET; doc_edges distincts, the union must
        too)."""
        from webcrawler_woc_spark.operators.graph import (
            pagerank_incremental,
            pagerank_int,
        )

        nodes, edges = _g(spark, 2, [(0, 1)])
        prior = pagerank_int(nodes, edges, iterations=1)
        got = {
            r.doc_id: r.rank_ppm
            for r in pagerank_incremental(nodes, edges, edges, prior, 1).collect()
        }
        assert got[1] == 150_000 + (85 * 150_000) // 100  # deg(0) stays 1


class TestTrustrankInt:
    def test_trust_flows_only_from_seeds(self, spark):
        """Chain 0 -> 1 -> 2 with seed {0}: hand-computed two rounds. A spam
        node (3) that self-promotes via 4 -> 3 stays at 0 — the TrustRank
        property: interlinking without a trusted path buys nothing."""
        from webcrawler_woc_spark.operators.graph import trustrank_int

        nodes, edges = _g(spark, 5, [(0, 1), (1, 2), (4, 3), (3, 4)])
        seeds = spark.createDataFrame([(0,)], "doc_id long")
        got = {
            r.doc_id: r.trust_ppm
            for r in trustrank_int(nodes, edges, seeds, iterations=2).collect()
        }
        # t0 = [1e6, 0, 0, 0, 0]
        # round 1: t(0)=150000; t(1)=85%*1e6=850000; others 0
        # round 2: t(0)=150000; t(1)=85%*150000=127500; t(2)=85%*850000=722500
        assert got[0] == 150_000
        assert got[1] == (85 * 150_000) // 100
        assert got[2] == (85 * 850_000) // 100
        assert got[3] == 0 and got[4] == 0  # spam ring: no trusted path

    def test_equals_pagerank_when_everyone_is_a_seed(self, spark):
        """With seeds == nodes the teleport term is unconditional — TrustRank
        degenerates to pagerank_int exactly."""
        from webcrawler_woc_spark.operators.graph import pagerank_int, trustrank_int

        nodes, edges = _g(spark, 4, [(0, 1), (1, 2), (2, 0), (3, 1)])
        tr = {
            r.doc_id: r.trust_ppm
            for r in trustrank_int(nodes, edges, nodes, iterations=3).collect()
        }
        pr = {
            r.doc_id: r.rank_ppm
            for r in pagerank_int(nodes, edges, iterations=3).collect()
        }
        assert tr == pr


class TestHostLinkGraph:
    def test_rollup_counts_and_self_drop(self, spark):
        from webcrawler_woc_spark.operators.graph import host_link_graph

        children = spark.createDataFrame(
            [
                ("http://a.example/p1", "http://b.example/x"),
                ("http://a.example/p1", "http://b.example/y"),
                ("http://a.example/p2", "http://b.example/x"),
                ("http://a.example/p1", "http://a.example/nav"),  # self edge
                ("http://a.example/p1", "mailto:u@b.example"),  # no dst host
            ],
            "parent_url string, url string",
        )
        got = {
            (r.src_host, r.dst_host): (r.n_links, r.n_src_pages)
            for r in host_link_graph(children).collect()
        }
        assert got[("a.example", "b.example")] == (3, 2)
        assert got[("a.example", "a.example")] == (1, 1)
        assert len(got) == 2  # mailto dropped
        got2 = {
            (r.src_host, r.dst_host)
            for r in host_link_graph(children, drop_self=True).collect()
        }
        assert got2 == {("a.example", "b.example")}


class TestSalsaInt:
    def test_degree_normalized_half_steps(self, spark):
        """Hand-computed one round: h = a/indeg summed over out-edges,
        a = h/outdeg summed over in-edges."""
        from webcrawler_woc_spark.operators.graph import salsa_int

        # 0 -> 2, 0 -> 3, 1 -> 3: outdeg(0)=2, outdeg(1)=1; indeg(2)=1, indeg(3)=2
        nodes, edges = _g(spark, 4, [(0, 2), (0, 3), (1, 3)])
        got = {
            r.doc_id: (r.auth_ppm, r.hub_ppm)
            for r in salsa_int(nodes, edges, iterations=1).collect()
        }
        h0 = 1_000_000 // 1 + 1_000_000 // 2  # a0(2)/indeg2 + a0(3)/indeg3
        h1 = 1_000_000 // 2
        assert got[0][1] == h0 and got[1][1] == h1
        assert got[2][0] == h0 // 2  # h(0)/outdeg(0)
        assert got[3][0] == h0 // 2 + h1 // 1
        assert got[2][1] == 0 and got[3][1] == 0  # no out-edges

    def test_mass_conserving_fixpoint_on_symmetric_bipartite(self, spark):
        """Two hubs feeding one authority is a SALSA fixpoint: the walk
        conserves mass, so iterating does not inflate scores (the
        mutual-reinforcement blowup HITS must normalize away)."""
        from webcrawler_woc_spark.operators.graph import salsa_int

        nodes, edges = _g(spark, 3, [(0, 2), (1, 2)])
        one = {
            r.doc_id: (r.auth_ppm, r.hub_ppm)
            for r in salsa_int(nodes, edges, iterations=1).collect()
        }
        three = {
            r.doc_id: (r.auth_ppm, r.hub_ppm)
            for r in salsa_int(nodes, edges, iterations=3).collect()
        }
        assert one == three
        assert one[2][0] == 1_000_000  # mass conserved, not inflated
