"""Round-5 training-data operators: edit-distance near-dup pairs, word
n-grams, length-band drift, alpha-temperature mixture weights, tracking-
param URL canonicalization."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


class TestEditdistancePairs:
    def test_prefix_bucketed_pairs_within_threshold(self, spark):
        from webcrawler_woc_spark.operators.dedup import editdistance_pairs

        base = "the quick brown fox jumps over the lazy dog"
        rows_a = [(1, base), (2, "completely unrelated text body here"), (3, base + " twice")]
        rows_b = [
            (11, base[:-3] + "cat"),       # same prefix, dist 3
            (12, "the quick brown shark"), # same prefix-16, large dist
            (13, "zzz different prefix entirely"),
        ]
        a = spark.createDataFrame(rows_a, "doc_id bigint, text string")
        b = spark.createDataFrame(rows_b, "doc_id bigint, text string")
        got = {
            (r.doc_id_a, r.doc_id_b): r.dist
            for r in editdistance_pairs(a, b, prefix_len=16, max_dist=6).collect()
        }
        assert got == {(1, 11): 3}  # 12 fails dist, 13 fails bucket, 2 no bucket-mate

    def test_plan_has_no_cartesian(self, spark):
        from webcrawler_woc_spark.operators.dedup import editdistance_pairs

        a = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
        plan = editdistance_pairs(a, a)._jdf.queryExecution().executedPlan().toString()
        assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

    def test_matches_duckdb_levenshtein(self, spark):
        """Engine parity spot-check: Spark levenshtein == DuckDB levenshtein
        on asymmetric edits (insert vs delete vs substitute)."""
        import duckdb

        pairs = [
            ("kitten", "sitting"),
            ("flaw", "lawn"),
            ("", "abc"),
            ("same", "same"),
            ("ab", "ba"),
        ]
        df = spark.createDataFrame(pairs, "l string, r string")
        got = {
            (r.l, r.r): r.d
            for r in df.select("l", "r", F.levenshtein("l", "r").alias("d")).collect()
        }
        for (l, r), d in got.items():
            (dd,) = duckdb.sql(f"SELECT levenshtein('{l}', '{r}')").fetchone()
            assert d == dd, (l, r)


class TestWordNgrams:
    def test_trigram_counts_and_topk_tiebreak(self, spark):
        from webcrawler_woc_spark.operators.textstats import word_ngrams

        docs = spark.createDataFrame(
            [
                (1, "a b c a b c"),     # trigrams: abc, bca, cab, abc
                (2, "a b c"),           # abc
                (3, "x y"),             # too short: none
                (4, None),              # null text: none
            ],
            "doc_id bigint, text string",
        )
        got = {r.ngram: r.n_occurrences for r in word_ngrams(docs, n=3).collect()}
        assert got == {"a b c": 3, "b c a": 1, "c a b": 1}
        top = word_ngrams(docs, n=3, top_k=2).collect()
        assert [(r.ngram, r.n_occurrences) for r in top] == [("a b c", 3), ("b c a", 1)]

    def test_bigrams_n_param(self, spark):
        from webcrawler_woc_spark.operators.textstats import word_ngrams

        docs = spark.createDataFrame([(1, "  a   b  a ")], "doc_id bigint, text string")
        got = {r.ngram: r.n_occurrences for r in word_ngrams(docs, n=2).collect()}
        assert got == {"a b": 1, "b a": 1}


class TestLengthBandDrift:
    def test_integer_chi_square_per_bin(self, spark):
        from webcrawler_woc_spark.operators.textstats import length_band_drift

        old = spark.createDataFrame(
            [(i, "x" * 100) for i in range(6)] + [(9, "y" * 600)],
            "doc_id bigint, text string",
        )
        new = spark.createDataFrame(
            [(i, "x" * 100) for i in range(2)], "doc_id bigint, text string"
        )
        rows = {r.bin: r for r in length_band_drift(old, new, band=500, n_bins=3).collect()}
        assert set(rows) == {0, 1, 2}
        assert (rows[0].n_old, rows[0].n_new) == (6, 2)
        assert rows[0].drift_ppm == (16 * 1_000_000) // 8
        assert (rows[1].n_old, rows[1].n_new, rows[1].drift_ppm) == (1, 0, 1_000_000)
        assert (rows[2].n_old, rows[2].n_new, rows[2].drift_ppm) == (0, 0, 0)

    def test_null_text_counts_as_empty(self, spark):
        from webcrawler_woc_spark.operators.textstats import length_band_drift

        old = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
        new = spark.createDataFrame([(2, "")], "doc_id bigint, text string")
        rows = {r.bin: r for r in length_band_drift(old, new, band=10, n_bins=2).collect()}
        assert (rows[0].n_old, rows[0].n_new, rows[0].drift_ppm) == (1, 1, 0)


class TestMixtureWeights:
    def test_sqrt_temperature_upweights_tail(self, spark):
        from webcrawler_woc_spark.operators.sampling import mixture_weights

        rows = [(i, "en") for i in range(900)] + [(1000 + i, "mi") for i in range(9)]
        docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
        out = {r.group: r for r in mixture_weights(docs, total_target=1000).collect()}
        w_en, w_mi = math.isqrt(900), math.isqrt(9)  # 30, 3
        tot = w_en + w_mi
        assert out["en"].weight_ppm == (w_en * 1_000_000) // tot
        assert out["mi"].weight_ppm == (w_mi * 1_000_000) // tot
        # tail group: raw share would be 9/909 ~ 1%; sqrt-temperature gives ~9%
        assert out["mi"].weight_ppm > 90_000
        # target capped at availability
        assert out["mi"].target_n == 9  # (1000*3)//33 = 90 > 9 available
        assert out["en"].target_n == 900  # (1000*30)//33 = 909 > 900 available

    def test_weights_sum_near_unity(self, spark):
        from webcrawler_woc_spark.operators.sampling import mixture_weights

        rows = [(i, f"l{i % 7}") for i in range(500)]
        docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
        total = sum(r.weight_ppm for r in mixture_weights(docs).collect())
        assert 1_000_000 - 7 <= total <= 1_000_000  # floor-div loses < 1 per group


class TestStripTrackingParams:
    CASES = [
        ("http://a.example/p?utm_source=x&id=7&fbclid=z", "http://a.example/p?id=7"),
        ("http://a.example/p?utm_source=x&utm_medium=y", "http://a.example/p"),
        ("http://a.example/p?id=7&ref=r", "http://a.example/p?id=7&ref=r"),
        ("http://a.example/p", "http://a.example/p"),
        ("http://a.example/p?gclid=1", "http://a.example/p"),
        # order of surviving params preserved
        ("http://a.example/p?b=2&utm_x=1&a=1", "http://a.example/p?b=2&a=1"),
        # 'utm' must match as a PREFIX of the param name only
        ("http://a.example/p?xutm_source=1", "http://a.example/p?xutm_source=1"),
        # a second '?' is legal INSIDE the query: split at the FIRST one,
        # never drop the middle segment (last-'?' split regression)
        ("http://a.example/p?a=1?b=2", "http://a.example/p?a=1?b=2"),
        ("http://a.example/p?utm_s=1&a=1?b=2", "http://a.example/p?a=1?b=2"),
        # trailing '?' / empty params: kept joins to '' -> the '?' drops,
        # identically in the Catalyst form and the Python twin
        ("http://a.example/p?", "http://a.example/p"),
        ("http://a.example/p?&", "http://a.example/p?&"),
    ]

    def test_catalyst_and_python_twins_agree(self, spark):
        from webcrawler_woc_spark.functions.urlnorm import (
            strip_tracking_params,
            strip_tracking_params_col,
        )

        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "url string")
        got = {
            r.url: r.canon
            for r in df.select(
                "url", strip_tracking_params_col(F.col("url")).alias("canon")
            ).collect()
        }
        for url, want in self.CASES:
            assert got[url] == want, url
            assert strip_tracking_params(url) == want, url
