"""Embedding similarity / near-dup operators (operators/similarity.py).

The full numeric parity with DuckDB is covered by the driver oracle gate
(__spark_entry__.oracle_sql); these tests pin the operator-level guarantees
that the oracle comparison alone can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb_df(spark, rows, dim=8):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


class TestEmbeddingCosineDups:
    def test_exact_duplicate_always_found(self, spark):
        # identical vectors agree on every hyperplane sign => same bucket in
        # EVERY LSH configuration; cosine == 1.0 => sim_ppm 999999+ (floor of
        # a 1.0 product chain can land at 999999 or 1000000 by fp rounding)
        from webcrawler_woc_spark.operators.similarity import embedding_cosine_dups

        v = [1.0, 2.0, -3.0, 0.5, 4.0, -1.0, 2.5, 0.25]
        other = [5.0, -2.0, 1.0, 3.0, -4.0, 0.5, -1.5, 2.0]
        df = _emb_df(spark, [(0, v), (1, v), (2, other)])
        got = {
            (r["vec_id_a"], r["vec_id_b"]): r["sim_ppm"]
            for r in embedding_cosine_dups(df, dim=8, threshold_ppm=990000).collect()
        }
        assert (0, 1) in got
        assert got[(0, 1)] >= 999999

    def test_threshold_excludes_dissimilar(self, spark):
        from webcrawler_woc_spark.operators.similarity import embedding_cosine_dups

        a = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        b = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]  # orthogonal: cos = 0
        df = _emb_df(spark, [(0, a), (1, b)])
        assert embedding_cosine_dups(df, dim=8, threshold_ppm=500000).count() == 0

    def test_pairs_are_ordered_and_unique(self, spark):
        from webcrawler_woc_spark.operators.similarity import embedding_cosine_dups

        v = [1.0] * 8
        df = _emb_df(spark, [(i, v) for i in range(4)])  # 4 identical vectors
        rows = embedding_cosine_dups(df, dim=8, threshold_ppm=990000).collect()
        pairs = [(r["vec_id_a"], r["vec_id_b"]) for r in rows]
        assert sorted(pairs) == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        assert all(a < b for a, b in pairs)

    def test_plan_stays_jvm_side(self, spark):
        # the near-dup path must be pure Catalyst (no Python eval in the plan)
        from webcrawler_woc_spark.operators.similarity import embedding_cosine_dups
        from webcrawler_woc_spark.plans.explain import physical_plan

        df = _emb_df(spark, [(0, [1.0] * 8), (1, [1.0] * 8)])
        plan = physical_plan(embedding_cosine_dups(df, dim=8))
        assert "EvalPython" not in plan


class TestAdaptivePlanes:
    def test_plane_count_grows_with_corpus(self):
        from webcrawler_woc_spark.operators.similarity import adaptive_n_planes

        assert adaptive_n_planes(100) == 8
        assert adaptive_n_planes(1 << 16) == 8  # 65536/256 = 256 buckets -> 8
        assert adaptive_n_planes(1 << 20) == 12
        assert adaptive_n_planes(10**9) == 22
        assert adaptive_n_planes(10**18) == 52
        assert adaptive_n_planes(10**30) == 62  # capped at one BIGINT

    def test_bucket_join_work_stays_subquadratic(self, spark):
        # expected bucket-local join work = sum over buckets of size^2.
        # With FIXED planes it grows ~x16 when N x4; with adaptive planes the
        # expected bucket population is constant, so work grows ~linearly.
        from webcrawler_woc_spark.operators.similarity import (
            adaptive_n_planes,
            lsh_signature,
        )

        dim = 16

        def work(n: int) -> int:
            vecs = spark.range(n).select(
                F.col("id").alias("vec_id"),
                F.expr(
                    f"transform(sequence(0, {dim - 1}), "
                    "i -> cast(pmod(xxhash64(id, i), 2001) - 1000 as double) / 1000.0)"
                ).alias("v"),
            )
            planes = adaptive_n_planes(n, target_bucket=64)
            sizes = (
                vecs.withColumn("bucket", lsh_signature(F.col("v"), dim, planes))
                .groupBy("bucket")
                .agg(F.count("*").alias("c"))
            )
            return sizes.agg(F.sum(F.col("c") * F.col("c"))).collect()[0][0]

        # sizes chosen ABOVE the 8-plane floor so the adaptive count actually
        # moves: 65536 -> 10 planes, 262144 -> 12 planes (target_bucket=64)
        w1, w4 = work(65536), work(262144)
        # linear growth target ~4x; quadratic (fixed-plane) growth would be
        # ~16x. Allow slack for plane-split imbalance.
        assert w4 <= 8 * w1, (w1, w4)


class TestAdaptiveLists:
    def test_sqrt_sizing_balances_assignment_and_probe_work(self):
        from webcrawler_woc_spark.operators.similarity import adaptive_n_lists

        assert adaptive_n_lists(100) == 16          # floor = pinned default
        assert adaptive_n_lists(1 << 16) == 256     # sqrt(65536)
        assert adaptive_n_lists(10**6) == 1000
        assert adaptive_n_lists(10**9) == 31622
        assert adaptive_n_lists(10**14) == 1 << 20  # capped (two-level regime)
        # as N doubles, expected list population N/n_lists grows ~sqrt(2),
        # never linearly: no list scan degenerates to a corpus scan
        for n in (1 << 16, 1 << 20, 1 << 24):
            pop_n = n / adaptive_n_lists(n)
            pop_2n = (2 * n) / adaptive_n_lists(2 * n)
            assert pop_2n / pop_n < 1.5, (n, pop_n, pop_2n)

    def test_ivf_accepts_adaptive_none(self, spark, sf_dir):
        from webcrawler_woc_spark.operators.similarity import ivf_ann_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = ivf_ann_topk(emb, n_lists=None, n_queries=3, k=3, nprobe=2)
        rows = out.collect()
        assert {r.query_id for r in rows} <= {0, 1, 2}
        assert all(1 <= r.rank <= 3 for r in rows)


class TestMultiprobe:
    def test_multiprobe_recall_superset_of_single_probe(self, spark, sf_dir):
        from webcrawler_woc_spark.operators.similarity import lsh_ann_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        single = lsh_ann_topk(emb, dim=64, n_queries=10, k=5, n_planes=8)
        multi = lsh_ann_topk(emb, dim=64, n_queries=10, k=5, n_planes=8, multiprobe=True)
        s_rows = single.collect()
        m_rows = multi.collect()
        assert len(m_rows) >= len(s_rows)
        # every single-probe candidate pair is reachable by multi-probe (its
        # rank can only improve or stay; sim_ppm per pair is identical)
        m_pairs = {(r["query_id"], r["neighbor_id"]): r["sim_ppm"] for r in m_rows}
        for r in s_rows:
            key = (r["query_id"], r["neighbor_id"])
            if key in m_pairs:  # may fall off top-k when better probes appear
                assert m_pairs[key] == r["sim_ppm"]
        # and multi-probe's per-query result count is >= single-probe's
        from collections import Counter

        sc, mc = Counter(r["query_id"] for r in s_rows), Counter(r["query_id"] for r in m_rows)
        assert all(mc[q] >= n for q, n in sc.items())
