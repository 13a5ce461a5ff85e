"""Real DNS enrichment (operators/dns.py): loopback names resolve, unknown
names yield NULLs (never task failures), resolution is once-per-host."""

from __future__ import annotations


def test_localhost_resolves_and_unknown_is_null(spark):
    from webcrawler_woc_spark.operators.dns import resolve_hosts

    hosts = spark.createDataFrame(
        [("localhost",), ("definitely-not-a-host-xyz.invalid",)], "host string"
    )
    got = {r.host: (r.ipv4, r.ipv6) for r in resolve_hosts(hosts).collect()}
    assert got["localhost"][0] == "127.0.0.1"
    assert got["definitely-not-a-host-xyz.invalid"] == (None, None)


def test_duplicate_hosts_resolve_once(spark):
    from webcrawler_woc_spark.operators.dns import resolve_hosts

    hosts = spark.createDataFrame(
        [("localhost",)] * 5 + [("localhost",)], "host string"
    )
    rows = resolve_hosts(hosts).collect()
    assert len(rows) == 1  # distinct-host contract: one output row per host
