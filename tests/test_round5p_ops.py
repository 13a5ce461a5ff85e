"""Round-5 batch-16 operators: degree-mixing matrix, shard-balance audit."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestDegreeMixing:
    def test_star_vs_clique(self, spark):
        from webcrawler_woc_spark.operators.graph import degree_mixing

        # star: hub 0 (deg 8 -> bucket 3), 8 spokes (deg 1 -> bucket 0);
        # triangle 100-101-102 (deg 2 -> bucket 1)
        edges = [(0, i) for i in range(1, 9)] + [(100, 101), (101, 102), (102, 100)]
        e = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {(r.bucket_lo, r.bucket_hi): r.n_edges for r in degree_mixing(e).collect()}
        assert got[(0, 3)] == 8   # disassortative star mass off-diagonal
        assert got[(1, 1)] == 3   # assortative triangle mass on-diagonal
        assert set(got) == {(0, 3), (1, 1)}

    def test_each_edge_counted_once(self, spark):
        from webcrawler_woc_spark.operators.graph import degree_mixing

        e = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 2), (3, 3)], "src bigint, dst bigint"
        )
        got = degree_mixing(e).collect()
        assert len(got) == 1
        assert got[0].n_edges == 1  # duplicates + reverse + self-loop collapse


class TestShardBalance:
    def test_counts_and_imbalance(self, spark):
        from webcrawler_woc_spark.operators.sampling import (
            rendezvous_shards,
            shard_balance,
        )

        df = spark.createDataFrame([(i,) for i in range(500)], "doc_id bigint")
        out = shard_balance(df, n_shards=4).collect()
        assert len(out) == 4
        assert sum(r.n_keys for r in out) == 500
        mn, mx = min(r.n_keys for r in out), max(r.n_keys for r in out)
        (r0,) = [r for r in out if r.shard == 0]
        assert (r0.min_keys, r0.max_keys) == (mn, mx)
        assert r0.imbalance_ppm == ((mx - mn) * 1_000_000) // max(mn, 1)
        # consistency with the raw assignment
        raw = rendezvous_shards(df, 4).groupBy("shard").count().collect()
        assert {r.shard: r["count"] for r in raw} == {r.shard: r.n_keys for r in out}

    def test_empty_shards_reported(self, spark):
        from webcrawler_woc_spark.operators.sampling import shard_balance

        df = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
        out = shard_balance(df, n_shards=8).collect()
        assert len(out) == 8
        assert sum(1 for r in out if r.n_keys == 0) >= 6
        assert all(r.min_keys == 0 for r in out)
