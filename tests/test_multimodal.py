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


class TestRealDecodeEscapeHatch:
    """decode_media adapts to its environment: real PIL decode when the lib
    exists, NotImplementedError stub otherwise — stub contract unchanged."""

    def test_stub_contract_without_decoder(self):
        import pytest

        from webcrawler_woc_spark.operators.multimodal import _probe_pil, decode_media

        if _probe_pil() is not None:
            pytest.skip("PIL present: stub path not reachable for images")
        with pytest.raises(NotImplementedError):
            decode_media(b"\x89PNG\r\n", "image")

    def test_video_always_stubbed(self):
        import pytest

        from webcrawler_woc_spark.operators.multimodal import decode_media

        with pytest.raises(NotImplementedError):
            decode_media(b"\x00\x00\x00\x18ftyp", "video")

    def test_real_decode_when_pil_present(self):
        import pytest

        from webcrawler_woc_spark.operators.multimodal import (
            _probe_pil,
            decode_media,
            image_feature,
        )

        image_mod = _probe_pil()
        if image_mod is None:
            pytest.skip("PIL not importable in this environment")
        import io

        img = image_mod.new("RGB", (7, 3), color=(10, 20, 30))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        blob = buf.getvalue()
        decoded = decode_media(blob, "image")
        assert (decoded.width, decoded.height) == (7, 3)
        w, h, bands, mean = image_feature(blob)
        assert (w, h, bands) == (7.0, 3.0, 3.0)
        assert mean == 10.0  # uniform first band: extrema (10, 10)

    def test_media_features_real_flag_falls_back_on_undecodable(self, spark):
        """use_real_decode=True over undecodable blobs must equal the stub
        output row-for-row (per-row fallback) — in a PIL-less sandbox this
        exercises the fallback wholesale, with PIL it exercises the corrupt-
        bytes branch (text bytes are not a valid image either way)."""
        from webcrawler_woc_spark.operators.multimodal import media_features, synth_media

        docs = spark.createDataFrame(
            [(0, "alpha beta"), (1, "gamma"), (2, "delta eps")], "doc_id long, text string"
        )
        media = synth_media(docs)
        stub = {r.doc_id: r.feature for r in media_features(media).collect()}
        real = {r.doc_id: r.feature for r in media_features(media, use_real_decode=True).collect()}
        assert stub == real
