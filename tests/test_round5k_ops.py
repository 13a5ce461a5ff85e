"""Round-5 batch-11 operators: language-agreement matrix, degree histogram."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestLangAgreement:
    def test_confusion_rollup(self, spark):
        from webcrawler_woc_spark.operators.textstats import lang_agreement

        rows = [
            (1, "en", "the cat and the dog of a house"),   # en declared, en detected
            (2, "en", "the big and old town of light"),    # en/en
            (3, "de", "the quick thing of and to it"),     # de declared, en detected
            (4, "fr", "xyzzy qwerty plugh"),               # fr declared, no hits -> und
            (5, None, "der und das ist die"),              # undeclared, de detected
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
        got = {(r.declared, r.lang_pred): r for r in lang_agreement(df).collect()}
        assert got[("en", "en")].n_docs == 2
        assert got[("en", "en")].agree == 1
        assert got[("de", "en")].n_docs == 1 and got[("de", "en")].agree == 0
        assert got[("fr", "und")].n_docs == 1
        assert got[("und", "de")].n_docs == 1 and got[("und", "de")].agree == 0


class TestDegreeHistogram:
    def test_buckets_and_minmax(self, spark):
        from webcrawler_woc_spark.operators.graph import degree_histogram

        # hub 0 with 9 spokes (deg 9 -> bucket 3); spokes deg 1 -> bucket 0;
        # a triangle 100-101-102 (deg 2 -> bucket 1)
        edges = [(0, i) for i in range(1, 10)] + [(100, 101), (101, 102), (102, 100)]
        e = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {r.bucket: r for r in degree_histogram(e).collect()}
        assert got[0].n_nodes == 9 and got[0].min_degree == 1 and got[0].max_degree == 1
        assert got[1].n_nodes == 3 and got[1].min_degree == 2
        assert got[3].n_nodes == 1 and got[3].max_degree == 9

    def test_duplicate_and_reverse_edges_counted_once(self, spark):
        from webcrawler_woc_spark.operators.graph import degree_histogram

        e = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 2)], "src bigint, dst bigint"
        )
        got = {r.bucket: r for r in degree_histogram(e).collect()}
        assert list(got) == [0]
        assert got[0].n_nodes == 2 and got[0].max_degree == 1
