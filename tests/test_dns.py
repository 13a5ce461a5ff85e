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


def test_pool_thread_count_bounded_under_blackholed_resolver(monkeypatch):
    """ADVICE r4: a persistently hanging getaddrinfo must not leak one
    abandoned thread per hung host per batch — the shared pool is the bound.
    Drives the module-level pool primitives directly (no Spark: in local
    mode a driver monkeypatch never reaches executor worker processes)."""
    import threading
    import time

    from webcrawler_woc_spark.operators import dns

    hang = threading.Event()

    def black_hole(host):
        hang.wait(30)  # released at teardown; simulates a wedged getaddrinfo
        return (None, None)

    monkeypatch.setattr(dns, "_resolve_one", black_hole)
    before = threading.active_count()
    try:
        for batch in range(4):  # 4 batches x 3 hung hosts, pool of 2
            hosts = [f"b{batch}-h{i}.invalid" for i in range(3)]
            out = dns._resolve_batch(hosts, timeout_s=0.1, max_workers=2)
            assert out == [(h, None, None) for h in hosts]  # all hung -> NULLs
            # the batch drains its own cancelled tasks: with every pool
            # thread wedged, nothing else pops the queue, and without the
            # drain it would grow by len(batch) per call forever
            assert dns._task_q.qsize() == 0
        # old design: 4 batches x up-to-3 leaked threads; pool design: <= 2 new
        assert threading.active_count() - before <= 2
    finally:
        hang.set()
        time.sleep(0.1)  # let in-flight wedged lookups finish
