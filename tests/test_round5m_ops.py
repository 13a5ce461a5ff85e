"""Round-5 batch-13 operators: URL decontamination, PMI collocation pairs."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestUrlDecontaminate:
    def test_tracking_noise_still_matches(self, spark):
        from webcrawler_woc_spark.operators.decontaminate import url_decontaminate

        corpus = spark.createDataFrame(
            [
                (1, "http://a.example/page?utm_source=feed"),
                (2, "http://a.example/clean"),
                (3, "http://a.example/other"),
            ],
            "doc_id bigint, url string",
        )
        evalset = spark.createDataFrame(
            [
                ("http://a.example/page",),
                ("http://a.example/clean?utm_campaign=x&fbclid=y",),
            ],
            "url string",
        )
        got = {r.doc_id for r in url_decontaminate(corpus, evalset).collect()}
        assert got == {1, 2}

    def test_real_params_distinguish(self, spark):
        from webcrawler_woc_spark.operators.decontaminate import url_decontaminate

        corpus = spark.createDataFrame(
            [(1, "http://a.example/p?id=1"), (2, "http://a.example/p?id=2")],
            "doc_id bigint, url string",
        )
        evalset = spark.createDataFrame([("http://a.example/p?id=1",)], "url string")
        got = {r.doc_id for r in url_decontaminate(corpus, evalset).collect()}
        assert got == {1}


class TestPmiPairs:
    def test_collocation_scores_high(self, spark):
        from webcrawler_woc_spark.operators.textstats import pmi_pairs

        # "new york" always adjacent; "the" everywhere -> low PMI with anything
        docs = [(i, "the new york times reported the story the end") for i in range(5)]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {(r.tok_a, r.tok_b): r for r in pmi_pairs(df, window=2, min_count=3).collect()}
        ny = got[("new", "york")]
        the_story = got.get(("story", "the")) or got.get(("the", "story"))
        assert ny.c_ab == 5
        assert the_story is not None
        assert ny.pmi_bits > the_story.pmi_bits

    def test_matches_python_reference(self, spark):
        from webcrawler_woc_spark.operators.textstats import pmi_pairs
        from collections import Counter

        texts = {1: "a b c a b", 2: "b a a c"}
        w = 2
        pair_c: Counter = Counter()
        tok_c: Counter = Counter()
        total = 0
        for t in texts.values():
            toks = t.split()
            total += len(toks)
            tok_c.update(toks)
            for i, a in enumerate(toks):
                for k in range(1, w + 1):
                    if i + k < len(toks):
                        b = toks[i + k]
                        pair_c[tuple(sorted((a, b)))] += 1
        ilog2 = lambda x: x.bit_length() - 1
        expect = {
            p: (c, ilog2(c * total) - ilog2(tok_c[p[0]] * tok_c[p[1]]))
            for p, c in pair_c.items()
            if c >= 2
        }
        df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
        got = {
            (r.tok_a, r.tok_b): (r.c_ab, r.pmi_bits)
            for r in pmi_pairs(df, window=2, min_count=2).collect()
        }
        assert got == expect
