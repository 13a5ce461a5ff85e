"""Real DNS enrichment — the un-simulated twin of fetch.synth_ipv4/ipv6.

The reference resolves A/AAAA per crawled page (src/links.rs:309-334,
`dns_lookup::lookup_host`); the engine's default stays the deterministic
synthetic columns (oracle-checkable), and this module is the real-resolver
path for deployments: ``resolve_hosts`` maps a DISTINCT host frame through
``socket.getaddrinfo`` in an Arrow-batched thread pool.

Scale shape — resolve the HOST SET, not the URL stream: a 10^10-URL frontier
has maybe 10^7 hosts; dedup first (one groupBy), resolve each host once,
broadcast the tiny (host, ipv4, ipv6) table back into the wave (the same
join shape as the robots cache). Per-row python would re-resolve per URL and
hammer the resolver; the reference itself resolves per page fetch, which is
exactly the anti-pattern this operator exists to avoid at scale.

Failure contract mirrors the reference (links.rs:318-320: lookup errors =>
no enrichment): any resolver error or timeout yields NULL columns, never a
task failure. ``getaddrinfo`` has no timeout parameter of its own, so
lookups run on DAEMON threads joined against ONE batch-wide deadline: a
hung lookup yields NULL rows at the deadline and the stuck thread is truly
abandoned — daemon threads are joined by no one, including the interpreter
at exit (a ThreadPoolExecutor would re-join them via concurrent.futures'
atexit hook and wedge the python worker's graceful shutdown). Per-host
timeouts never compound — the batch is bounded by timeout_s per wave of
``max_workers`` concurrent lookups, not ``len(batch) * timeout_s``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RESOLVE_SCHEMA = "host string, ipv4 string, ipv6 string"


def _resolve_one(host: str) -> tuple[str | None, str | None]:
    import socket

    ipv4 = ipv6 = None
    try:
        for family, _type, _proto, _canon, addr in socket.getaddrinfo(host, None):
            if family == socket.AF_INET and ipv4 is None:
                ipv4 = addr[0]
            elif family == socket.AF_INET6 and ipv6 is None:
                ipv6 = addr[0]
    except Exception:
        pass  # reference contract: lookup failure => no enrichment
    return ipv4, ipv6


def resolve_hosts(
    hosts: DataFrame, timeout_s: float = 5.0, max_workers: int = 16
) -> DataFrame:
    """(host) frame -> (host, ipv4, ipv6); first A and first AAAA record,
    NULLs on failure/timeout. Input should be the distinct host set (the
    function distincts defensively — resolution must be once-per-host)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        import queue
        import threading
        import time

        for pdf in batches:
            if len(pdf) == 0:
                continue
            batch = list(pdf["host"])
            workers = min(max_workers, len(batch))
            # DAEMON threads, not ThreadPoolExecutor: concurrent.futures
            # registers an atexit hook that JOINS non-daemon pool threads, so
            # one getaddrinfo stuck on a blackholed resolver would wedge the
            # python worker's eventual graceful exit. Daemon threads are
            # truly abandoned: the batch yields NULLs at the deadline and the
            # stuck thread dies with the process, joined by no one.
            todo: queue.Queue[str] = queue.Queue()
            for h in batch:
                todo.put(h)
            results: dict[str, tuple[str | None, str | None]] = {}

            def work() -> None:
                while True:
                    try:
                        h = todo.get_nowait()
                    except queue.Empty:
                        return
                    results[h] = _resolve_one(h)  # dict store: atomic under GIL

            threads = [
                threading.Thread(target=work, daemon=True) for _ in range(workers)
            ]
            for t in threads:
                t.start()
            # One deadline for the whole batch: timeout_s per wave of
            # ``workers`` concurrent lookups (not per host — per-host joins
            # would compound to len(batch) * timeout).
            deadline = time.monotonic() + timeout_s * max(
                1, math.ceil(len(batch) / workers)
            )
            for t in threads:
                t.join(max(0.0, deadline - time.monotonic()))
            out = [(h, *results.get(h, (None, None))) for h in batch]
            yield pd.DataFrame(out, columns=["host", "ipv4", "ipv6"])

    return (
        hosts.select("host")
        .distinct()
        .repartition("host")
        .mapInPandas(gen, schema=RESOLVE_SCHEMA)
    )
