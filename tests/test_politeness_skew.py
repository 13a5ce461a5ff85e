"""Hot-host skew behavior of the politeness scheduler (north rule: explicit
skew handling for hot hosts).

The salted partial top-k in schedule_wave bounds any single window task to
salt_buckets * budget rows; these tests pin (a) exactness of the salted trim
against a brute-force sort at volume, and (b) that the pre-trim actually
discards the bulk of a hot host before the exact per-host window.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_woc_spark.operators.politeness import schedule_wave


def _hot_frontier(spark, n_hot=50_000, n_cold_hosts=20):
    hot = spark.range(n_hot).select(
        F.concat(F.lit("http://hot.example/p/"), F.col("id")).alias("url"),
        F.lit("hot.example").alias("host"),
        (F.col("id") % 97).cast("double").alias("priority"),
    )
    cold = spark.range(n_cold_hosts).select(
        F.concat(F.lit("http://cold"), F.col("id"), F.lit(".example/p/0")).alias("url"),
        F.concat(F.lit("cold"), F.col("id"), F.lit(".example")).alias("host"),
        F.lit(1.0).alias("priority"),
    )
    df = hot.unionByName(cold)
    return df.withColumn("url_hash", F.xxhash64("url")).withColumn(
        "wave", F.lit(0).cast("int")
    )


def test_salted_topk_exact_at_volume(spark):
    """50k URLs on ONE host, budget 25: the salted pre-trim must yield the
    byte-identical schedule a brute-force per-host sort would."""
    frontier = _hot_frontier(spark)
    budget = 25
    scheduled, deferred = schedule_wave(frontier, None, budget)
    got = [
        (r["slot"], r["url"])
        for r in scheduled.filter(F.col("host") == "hot.example")
        .orderBy("slot")
        .collect()
    ]
    expect = [
        (i + 1, r["url"])
        for i, r in enumerate(
            frontier.filter(F.col("host") == "hot.example")
            .orderBy(F.desc("priority"), F.asc("url"))
            .limit(budget)
            .collect()
        )
    ]
    assert got == expect
    # every cold host still gets its single URL scheduled
    assert scheduled.filter(F.col("host") != "hot.example").count() == 20
    # counts conserve: scheduled + deferred == frontier
    assert scheduled.count() + deferred.count() == frontier.count()


def test_pre_trim_bounds_the_window_input(spark):
    """The exact per-host window must see at most salt_buckets * budget rows
    of the hot host — not all 50k (the single-task skew hazard)."""
    frontier = _hot_frontier(spark)
    budget, salt_buckets = 25, 16
    from pyspark.sql import Window

    # reproduce the survivor set the scheduler's exact window runs on
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    w_salt = Window.partitionBy("host", salt).orderBy(F.desc("priority"), F.asc("url"))
    survivors = (
        frontier.withColumn("_r", F.row_number().over(w_salt))
        .filter(F.col("_r") <= budget)
        .filter(F.col("host") == "hot.example")
        .count()
    )
    assert survivors <= salt_buckets * budget  # 400, not 50_000
    assert survivors >= budget  # still a superset of the true top-k


class TestDisallowWildcards:
    CASES = [
        # (rule, path, disallowed?)
        ("/private", "/private/x", True),       # plain prefix
        ("/private", "/privateer", True),       # prefix, not segment-aware (spec)
        ("/private", "/pub", False),
        ("/*.pdf$", "/docs/a.pdf", True),       # wildcard + anchor
        ("/*.pdf$", "/docs/a.pdfx", False),     # anchor rejects suffix
        ("/*.pdf", "/docs/a.pdfx", True),       # unanchored wildcard
        ("/a*b", "/aXXXb", True),
        ("/a*b", "/ab", True),                  # '*' matches empty
        ("/a*b", "/b a", False),
        ("/x$", "/x", True),
        ("/x$", "/xy", False),
        ("/.^+(){}[]|", "/.^+(){}[]|Z", True),  # metachars are literal ("?" would start a query)
    ]

    def test_engine_matches_python_twin(self, spark):
        from pyspark.sql import functions as F

        from webcrawler_woc_spark.operators.fetch import with_host, with_url_hash
        from webcrawler_woc_spark.operators.politeness import filter_disallowed
        from webcrawler_woc_spark.oracle.pyoracle import _rule_matches

        host = "host0.example"
        frontier = with_host(
            with_url_hash(
                spark.createDataFrame(
                    [(f"http://{host}{path}", 1.0) for _, path, _ in self.CASES],
                    "url string, priority double",
                )
            )
        )
        rules = spark.createDataFrame(
            [(host, rule) for rule, _, _ in self.CASES], "host string, prefix string"
        ).distinct()
        kept = {r["url"] for r in filter_disallowed(frontier, rules).collect()}
        all_rules = [rule for rule, _, _ in self.CASES]
        for rule, path, want_blocked in self.CASES:
            url = f"http://{host}{path}"
            # engine semantics: blocked iff ANY rule matches
            blocked_engine = url not in kept
            blocked_twin = any(_rule_matches(path, r) for r in all_rules)
            assert blocked_engine == blocked_twin, (rule, path)
            # and each case's own rule behaves as specified
            assert _rule_matches(path, rule) == want_blocked, (rule, path)
