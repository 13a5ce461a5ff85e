"""Round-5 batch-14 operators: schedule makespan, feature-hash embedding."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestScheduleMakespan:
    def test_critical_host_and_defaults(self, spark):
        from webcrawler_woc_spark.operators.politeness import schedule_makespan

        rows = [
            ("fast", 100, 100),     # 99 * 100 = 9900
            ("slow", 20, 1000),     # 19 * 1000 = 19000 <- critical
            ("nodelay", 30, None),  # default 500 -> 14500
            ("single", 1, 5000),    # 0
        ]
        df = spark.createDataFrame(rows, "host string, n_urls int, delay_ms bigint")
        got = {r.host: r for r in schedule_makespan(df).collect()}
        assert got["slow"].host_time_ms == 19000 and got["slow"].is_critical == 1
        assert got["fast"].is_critical == 0
        assert got["nodelay"].host_time_ms == 29 * 500
        assert got["single"].host_time_ms == 0
        assert all(r.makespan_ms == 19000 for r in got.values())

    def test_tied_critical_hosts_all_flagged(self, spark):
        from webcrawler_woc_spark.operators.politeness import schedule_makespan

        df = spark.createDataFrame(
            [("a", 3, 100), ("b", 3, 100)], "host string, n_urls int, delay_ms bigint"
        )
        got = [r.is_critical for r in schedule_makespan(df).collect()]
        assert got == [1, 1]


class TestHashEmbedding:
    def test_counts_and_merge_property(self, spark):
        from webcrawler_woc_spark.operators.textstats import hash_embedding

        docs = spark.createDataFrame(
            [(1, "alpha beta alpha"), (2, "alpha"), (3, "")],
            "doc_id bigint, text string",
        )
        rows = hash_embedding(docs, dims=8).collect()
        v = {}
        for r in rows:
            v.setdefault(r.doc_id, {})[r.dim] = r.cnt
        assert sum(v[1].values()) == 3
        assert sum(v[2].values()) == 1
        assert 3 not in v  # empty doc has no rows (sparse form)
        # same token -> same dim across docs: doc2's single dim is in doc1's
        (d2dim,) = v[2].keys()
        assert d2dim in v[1]
        # merge property: doc1 = doc2 ('alpha') + 'beta' + 'alpha'
        assert v[1][d2dim] >= 2

    def test_dims_bounded(self, spark):
        from webcrawler_woc_spark.operators.textstats import hash_embedding

        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(200)))], "doc_id bigint, text string"
        )
        rows = hash_embedding(docs, dims=16).collect()
        assert all(0 <= r.dim < 16 for r in rows)
        assert sum(r.cnt for r in rows) == 200
