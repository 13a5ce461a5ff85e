"""Multimodal plumbing (operators/multimodal.py): binary columns, mapInPandas
batch shapes, 1->N frame explosion, schema stability. Values are also pinned
by the DuckDB oracle gate (multimodal_* in __spark_entry__)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _media(spark, texts):
    from webcrawler_woc_spark.operators.multimodal import synth_media

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return synth_media(docs)


class TestFrameSample:
    def test_explodes_one_video_to_many_frames(self, spark):
        from webcrawler_woc_spark.operators.multimodal import frame_sample

        # doc_id 2 => video; 1500 bytes at frame_size 256 => 5 frames, stride 2
        # keeps frame_idx 0, 2, 4
        media = _media(spark, ["x", "y", "a" * 1500])
        rows = frame_sample(media, frame_size=256, stride=2).collect()
        got = {(r["doc_id"], r["frame_idx"]): (r["frame_bytes"], r["frame_head"]) for r in rows}
        assert set(got) == {(2, 0), (2, 2), (2, 4)}
        assert got[(2, 0)] == (256, ord("a"))
        assert got[(2, 4)] == (256, ord("a"))

    def test_short_and_empty_blobs(self, spark):
        from webcrawler_woc_spark.operators.multimodal import frame_sample

        media = _media(spark, ["i", "a", ""])  # doc 2 = video with empty blob
        rows = frame_sample(media, frame_size=256, stride=4).collect()
        assert [(r["doc_id"], r["frame_idx"], r["frame_bytes"], r["frame_head"]) for r in rows] == [
            (2, 0, 0, None)
        ]

    def test_non_video_rows_never_reach_python(self, spark):
        from webcrawler_woc_spark.operators.multimodal import frame_sample
        from webcrawler_woc_spark.plans.explain import physical_plan

        media = _media(spark, ["img", "aud", "vid"])
        plan = physical_plan(frame_sample(media))
        # the media_kind filter must sit below the Python stage (plans print
        # root-first, so 'below' = larger string offset). Catalyst constant-
        # folds the kind CASE into a doc_id%3 predicate — even better: the
        # filter is a cheap arithmetic gate, not a string compare.
        assert "MapInPandas" in plan and "Filter" in plan
        assert plan.index("Filter") > plan.index("MapInPandas")


class TestResize:
    def test_truncate_and_pad(self, spark):
        from webcrawler_woc_spark.operators.multimodal import (
            media_features,
            resize_feature,
            synth_media,
        )

        media = _media(spark, ["hello world"])
        up = resize_feature(media_features(media), out_dim=6).collect()[0]["feature"]
        down = resize_feature(media_features(media), out_dim=2).collect()[0]["feature"]
        assert len(up) == 6 and up[4] == 0.0 and up[5] == 0.0  # padded
        assert len(down) == 2 and down[0] == 11.0 and down[1] == float(ord("h"))
