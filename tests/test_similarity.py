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
