"""Train/eval n-gram decontamination (operators/decontaminate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_woc_spark.operators.decontaminate import decontaminate


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontaminate:
    def test_verbatim_overlap_is_flagged(self, spark):
        eval_docs = _df(spark, [(1000, "the quick brown fox jumps over it")])
        train = _df(
            spark,
            [
                (1, "prefix junk the quick brown fox jumps over it suffix"),  # contains eval text
                (2, "completely unrelated content with no overlap at all xyzzy"),
            ],
        )
        out = {r["doc_id"]: r for r in decontaminate(train, eval_docs, n=16).collect()}
        assert out[1]["contaminated"] is True and out[1]["n_hit_shingles"] > 0
        assert out[2]["contaminated"] is False and out[2]["n_hit_shingles"] == 0

    def test_every_train_doc_gets_a_row(self, spark):
        eval_docs = _df(spark, [(100, "aaaaaaaaaaaaaaaaaaaa")])
        train = _df(spark, [(i, f"document number {i} body text goes here") for i in range(5)])
        out = decontaminate(train, eval_docs, n=16)
        assert out.count() == 5
        assert out.filter(F.col("contaminated")).count() == 0

    def test_short_texts_compare_whole_string(self, spark):
        # texts shorter than n fall back to the single truncated shingle
        eval_docs = _df(spark, [(100, "tiny")])
        train = _df(spark, [(1, "tiny"), (2, "other")])
        out = {r["doc_id"]: r["contaminated"] for r in decontaminate(train, eval_docs).collect()}
        assert out == {1: True, 2: False}

    def test_plan_broadcasts_eval_side(self, spark):
        from webcrawler_woc_spark.plans.explain import physical_plan

        eval_docs = _df(spark, [(100, "x" * 40)])
        train = _df(spark, [(1, "y" * 40)])
        plan = physical_plan(decontaminate(train, eval_docs))
        assert "BroadcastExchange" in plan
        assert "BatchEvalPython" not in plan  # pure Catalyst
