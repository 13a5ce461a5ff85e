"""Unit tests for the round-2 additions: capture-history compaction +
recrawl scheduling, SURT keys, PII scrub, doc-frequency top terms, and
near-dup cluster canonicalization."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _captures(spark):
    from webcrawler_woc_spark.operators.recrawl import explode_captures

    pages = spark.createDataFrame(
        [
            ("http://h0.example/a", 1000),
            ("http://h0.example/b", 2000),
            ("http://h1.example/c", 500),
        ],
        "url string, epoch int",
    ).select("url", F.timestamp_seconds("epoch").alias("warc_ts"))
    n = F.when(F.col("url").endswith("/a"), 3).otherwise(1)
    return explode_captures(pages, n)


class TestRecrawl:
    def test_explode_counts_and_epochs(self, spark):
        rows = {(r.url, r.capture_no): r.capture_epoch for r in _captures(spark).collect()}
        assert len(rows) == 5  # 3 + 1 + 1
        assert rows[("http://h0.example/a", 0)] == 1000
        assert rows[("http://h0.example/a", 2)] == 1000 + 2 * 86400
        assert rows[("http://h1.example/c", 0)] == 500

    def test_latest_keeps_newest_and_counts(self, spark):
        from webcrawler_woc_spark.operators.recrawl import latest_captures

        latest = {r.url: (r.n_captures, r.latest_epoch) for r in
                  latest_captures(_captures(spark)).collect()}
        assert latest["http://h0.example/a"] == (3, 1000 + 2 * 86400)
        assert latest["http://h0.example/b"] == (1, 2000)

    def test_schedule_budget_and_order(self, spark):
        from webcrawler_woc_spark.operators.recrawl import latest_captures, recrawl_schedule

        latest = latest_captures(_captures(spark))
        host = F.regexp_extract(F.col("url"), r"^http://([^/]+)/", 1)
        now = 10 * 86400
        out = recrawl_schedule(latest, host, now, min_age_sec=0, per_host_budget=1).collect()
        by_host = {r.host: r for r in out}
        assert len(out) == 2  # budget 1 per host
        # h0: /b last captured at 2000, /a at 1000+2d => /b is staler, wins slot 0
        assert by_host["h0.example"].url == "http://h0.example/b"
        assert by_host["h0.example"].age_sec == now - 2000
        assert by_host["h0.example"].slot == 0

    def test_min_age_filters(self, spark):
        from webcrawler_woc_spark.operators.recrawl import latest_captures, recrawl_schedule

        latest = latest_captures(_captures(spark))
        host = F.regexp_extract(F.col("url"), r"^http://([^/]+)/", 1)
        # only /c (latest 500) is older than now-173500
        out = recrawl_schedule(latest, host, 174000, 173000, 5).collect()
        assert [r.url for r in out] == ["http://h1.example/c"]


class TestSurt:
    def test_keys(self, spark):
        from webcrawler_woc_spark.functions.surt import surt_host, surt_key

        df = spark.createDataFrame(
            [
                ("http://a.b.example/path/x?q=1",),
                ("https://example/",),
                ("http://host0.example",),  # no path => '/'
                ("mailto:u@example.com",),  # non-hierarchical => null
            ],
            "url string",
        ).select("url", surt_host(F.col("url")).alias("sh"), surt_key(F.col("url")).alias("sk"))
        rows = {r.url: (r.sh, r.sk) for r in df.collect()}
        assert rows["http://a.b.example/path/x?q=1"] == (
            "example,b,a", "example,b,a)/path/x?q=1")
        assert rows["https://example/"] == ("example", "example)/")
        assert rows["http://host0.example"] == ("example,host0", "example,host0)/")
        assert rows["mailto:u@example.com"] == ("", None)

    def test_domain_prefix_clusters(self, spark):
        """All subdomain URLs of one domain sort contiguously by SURT."""
        from webcrawler_woc_spark.functions.surt import surt_key

        urls = [
            "http://a.example/z", "http://b.other/a", "http://sub.a.example/m",
            "http://a.example/a", "http://zzz.aardvark/x",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = [r.url for r in
               df.select("url", surt_key(F.col("url")).alias("k")).orderBy("k").collect()]
        ours = [u for u in got if re.search(r"://(sub\.)?a\.example", u)]
        i = got.index(ours[0])
        assert got[i:i + len(ours)] == ours  # contiguous block


class TestPii:
    def test_scrub_counts_and_redaction(self, spark):
        from webcrawler_woc_spark.operators.pii import pii_scrub, redact

        df = spark.createDataFrame(
            [
                (1, "mail me at jo.doe+x@sub.example.org or call +12345678901 from 10.0.0.1"),
                (2, "no pii here, just 1.2 numbers and an @ sign"),
            ],
            "id bigint, t string",
        )
        out = {r.id: r for r in pii_scrub(df, F.col("t"), ["id"]).collect()}
        assert (out[1].n_emails, out[1].n_phones, out[1].n_ipv4) == (1, 1, 1)
        assert (out[2].n_emails, out[2].n_phones, out[2].n_ipv4) == (0, 0, 0)
        red = df.filter("id=1").select(redact(F.col("t")).alias("r")).head().r
        assert red == "mail me at <EMAIL> or call <PHONE> from <IP>"
        # fingerprint of id=2 equals fingerprint of the unredacted original
        fp2 = out[2].redacted_fp
        from webcrawler_woc_spark.operators.textstats import fingerprints

        base = fingerprints(
            df.filter("id=2").select(F.col("id").alias("doc_id"), F.col("t").alias("text"))
        ).head().fingerprint
        assert fp2 == base


class TestDocFrequency:
    def test_df_counts_documents_not_occurrences(self, spark):
        from webcrawler_woc_spark.operators.textstats import doc_frequency

        docs = spark.createDataFrame(
            [(1, "a a a b", "en"), (2, "a c", "en"), (3, "a", "de")],
            "doc_id bigint, text string, lang string",
        )
        rows = {(r.lang, r.token): r.df for r in doc_frequency(docs).collect()}
        assert rows[("en", "a")] == 2  # two docs, not four occurrences
        assert rows[("en", "b")] == 1
        assert rows[("de", "a")] == 1

    def test_topk_rank_deterministic(self, spark):
        from webcrawler_woc_spark.operators.textstats import top_terms_per_lang

        docs = spark.createDataFrame(
            [(1, "x y", "en"), (2, "y z", "en"), (3, "z y", "en")],
            "doc_id bigint, text string, lang string",
        )
        out = top_terms_per_lang(docs, k=2).orderBy("rnk").collect()
        assert [(r.token, r.df, r.rnk) for r in out] == [("y", 3, 1), ("z", 2, 2)]


class TestDedupClusters:
    def test_chain_collapses_to_one_keeper(self, spark):
        from webcrawler_woc_spark.operators.dedup import dedup_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
        )
        rows = {r.doc_id: (r.cluster_id, r.is_kept) for r in dedup_clusters(pairs).collect()}
        assert rows == {
            1: (1, True), 2: (1, False), 3: (1, False),
            10: (10, True), 11: (10, False),
        }


def test_zero_captures_emit_no_rows(spark):
    from pyspark.sql import functions as F

    from webcrawler_woc_spark.operators.recrawl import explode_captures

    pages = spark.createDataFrame([("http://h/a", 100), ("http://h/b", 200)],
                                  "url string, epoch int").select(
        "url", F.timestamp_seconds("epoch").alias("warc_ts"))
    n = F.when(F.col("url").endswith("/a"), 0).otherwise(2)
    rows = explode_captures(pages, n).collect()
    # /a (zero captures) contributes nothing — no fabricated [0, -1] pair
    assert sorted((r.url, r.capture_no) for r in rows) == [
        ("http://h/b", 0), ("http://h/b", 1)]
class TestParagraphDedup:
    def test_first_occurrence_wins_and_docs_reassemble(self, spark):
        from webcrawler_woc_spark.operators.dedup import paragraph_dedup

        # k=2 chunks; doc 1: [a b][c d]; doc 2: [a b][x y] (boilerplate 'a b'
        # dropped); doc 3: [a b][c d] (drops ENTIRELY); doc 4 repeats its own
        # chunk: [p q][p q] -> intra-doc dup dropped too
        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b x y"), (3, "a b c d"), (4, "p q p q")],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: (r.n_chunks, r.n_kept, r.cleaned_text)
               for r in paragraph_dedup(docs, chunk_tokens=2).collect()}
        assert out == {
            1: (2, 2, "a b c d"),
            2: (2, 1, "x y"),
            3: (2, 0, ""),
            4: (2, 1, "p q"),
        }


class TestAdaptiveRecrawl:
    def test_budget_proportional_to_change_counts(self, spark):
        from pyspark.sql import functions as F

        from webcrawler_woc_spark.operators.recrawl import adaptive_recrawl_budgets

        rows = (
            [("http://a.ex/p%d" % i, "changed") for i in range(6)]
            + [("http://a.ex/q%d" % i, "unchanged") for i in range(4)]
            + [("http://b.ex/p%d" % i, "changed") for i in range(2)]
            + [("http://c.ex/p%d" % i, "unchanged") for i in range(5)]
            + [("http://c.ex/x", "added")]  # added is NOT a change signal
        )
        diff = spark.createDataFrame(rows, "url string, status string")
        host = F.regexp_extract(F.col("url"), r"^http://([^/]+)/", 1)
        out = {
            r.host: (r.n_urls, r.n_changed, r.change_ppm, r.host_budget)
            for r in adaptive_recrawl_budgets(diff, host, budget_total=100).collect()
        }
        # total_changed = 8: a gets (100*6) div 8 = 75; b (100*2) div 8 = 25
        assert out["a.ex"] == (10, 6, 600000, 75)
        assert out["b.ex"] == (2, 2, 1000000, 25)
        assert out["c.ex"] == (6, 0, 0, 0)  # no changes -> zero budget

    def test_min_one_slot_for_any_changed_host(self, spark):
        from pyspark.sql import functions as F

        from webcrawler_woc_spark.operators.recrawl import adaptive_recrawl_budgets

        rows = [("http://big.ex/p%d" % i, "changed") for i in range(99)] + [
            ("http://tiny.ex/p", "changed")
        ]
        diff = spark.createDataFrame(rows, "url string, status string")
        host = F.regexp_extract(F.col("url"), r"^http://([^/]+)/", 1)
        out = {
            r.host: r.host_budget
            for r in adaptive_recrawl_budgets(diff, host, budget_total=10).collect()
        }
        assert out["tiny.ex"] == 1  # floor: a changing host never starves
        assert out["big.ex"] == 9

    def test_no_int32_overflow_at_crawl_scale_counts(self, spark):
        """n_changed * 1000000 must multiply in BIGINT: 3000 changed URLs on
        one host overflowed INT32 under ANSI mode before the cast fix."""
        from pyspark.sql import functions as F

        from webcrawler_woc_spark.operators.recrawl import adaptive_recrawl_budgets

        rows = [("http://big.ex/p%d" % i, "changed") for i in range(3000)]
        diff = spark.createDataFrame(rows, "url string, status string")
        host = F.regexp_extract(F.col("url"), r"^http://([^/]+)/", 1)
        r = adaptive_recrawl_budgets(diff, host, budget_total=100).head()
        assert (r.n_changed, r.change_ppm, r.host_budget) == (3000, 1000000, 100)


class TestMergeUpsert:
    def test_merge_into_semantics(self, spark):
        from webcrawler_woc_spark.operators.recrawl import merge_upsert

        current = spark.createDataFrame(
            [("u1", 10), ("u2", 10), ("u3", 10)], "url string, ts bigint"
        )
        updates = spark.createDataFrame(
            [("u2", 20), ("u3", 10), ("u4", 5)], "url string, ts bigint"
        )
        out = {r.url: (r.op, r.ts) for r in merge_upsert(current, updates).collect()}
        assert out == {
            "u1": ("keep", 10),    # no update row
            "u2": ("update", 20),  # strictly newer
            "u3": ("keep", 10),    # tie: current wins
            "u4": ("insert", 5),   # no current row
        }
