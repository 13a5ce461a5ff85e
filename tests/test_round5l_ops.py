"""Round-5 batch-12 operators: KMV distinct sketch, epoch shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestKmvDistinct:
    def test_small_group_is_exact(self, spark):
        from webcrawler_woc_spark.operators.sketches import kmv_distinct

        rows = [("h1", f"v{i}") for i in range(10)] + [("h1", "v0")]  # dup
        df = spark.createDataFrame(rows, "host string, value string")
        (r,) = kmv_distinct(df, k=64).collect()
        assert (r.n_kept, r.est_distinct) == (10, 10)

    def test_large_group_estimates_within_tolerance(self, spark):
        from webcrawler_woc_spark.operators.sketches import kmv_distinct

        n = 5000
        rows = [("big", f"value-{i}") for i in range(n)]
        df = spark.createDataFrame(rows, "host string, value string")
        (r,) = kmv_distinct(df, k=64).collect()
        assert r.n_kept == 64
        # KMV with k=64: relative error ~ 1/sqrt(k-1) ~ 13%; allow 3 sigma
        assert abs(r.est_distinct - n) / n < 0.4

    def test_merge_by_union_truncate(self, spark):
        """Sketching two halves then merging bottom-k == sketching the whole."""
        from webcrawler_woc_spark.operators.sketches import kmv_distinct
        from webcrawler_woc_spark.operators.dedup import _sql_str_hash31

        rows = [("g", f"item{i}") for i in range(3000)]
        df = spark.createDataFrame(rows, "host string, value string")
        whole = kmv_distinct(df, k=32).collect()[0]
        # manual merge: union the two halves' bottom-32 hash sets, truncate
        h = df.select(_sql_str_hash31(F.col("value")).alias("h31")).distinct()
        merged_kth = (
            h.orderBy("h31").limit(32).agg(F.max("h31").alias("m")).collect()[0].m
        )
        assert whole.kth_min == merged_kth


class TestEpochShuffle:
    def test_deterministic_and_epoch_sensitive(self, spark):
        from webcrawler_woc_spark.operators.sampling import epoch_shuffle

        df = spark.createDataFrame([(i,) for i in range(200)], "doc_id bigint")
        e1a = [r.doc_id for r in epoch_shuffle(df, 1).orderBy("position").collect()]
        e1b = [r.doc_id for r in epoch_shuffle(df, 1).orderBy("position").collect()]
        e2 = [r.doc_id for r in epoch_shuffle(df, 2).orderBy("position").collect()]
        assert e1a == e1b  # reproducible
        assert e1a != e2  # epochs differ
        assert sorted(e1a) == sorted(e2) == list(range(200))  # permutations

    def test_positions_are_contiguous(self, spark):
        from webcrawler_woc_spark.operators.sampling import epoch_shuffle

        df = spark.createDataFrame([(i * 7,) for i in range(50)], "doc_id bigint")
        pos = sorted(r.position for r in epoch_shuffle(df, 3).collect())
        assert pos == list(range(1, 51))
