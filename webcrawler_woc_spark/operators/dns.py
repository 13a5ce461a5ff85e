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
lookups run on ONE module-level pool of forever-looping DAEMON threads
shared by every batch the python worker processes, waited on against ONE
batch-wide deadline: a hung lookup yields NULL rows at the deadline and the
wedged thread simply stays in the pool, so the TOTAL thread count is
bounded by the pool size for the life of the worker (the previous
per-batch-abandonment design leaked one thread per hung host per batch,
unbounded against a persistently blackholed resolver; a ThreadPoolExecutor
is still out — concurrent.futures' atexit hook would re-join non-daemon
threads and wedge the worker's graceful shutdown). Wedged threads shrink
effective concurrency; if every pool thread is stuck, later batches time
out to all-NULLs AND drain their own cancelled tasks from the queue at
batch end, so neither threads nor queued tasks grow without bound —
degraded, never unbounded. Per-host timeouts never
compound — the batch is bounded by timeout_s per wave of ``max_workers``
concurrent lookups, not ``len(batch) * timeout_s``.
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESOLVE_SCHEMA = "host string, ipv4 string, ipv6 string"

# one process-wide resolver pool: tasks are (batch_state, host); batch_state
# carries that batch's results dict + completion semaphore + cancel flag so
# a timed-out batch's still-queued tasks are skipped, not resolved into the
# void. All mutation is GIL-atomic (dict store, bool flip, semaphore).
_pool_lock = threading.Lock()
_task_q: queue.Queue = queue.Queue()
_pool_threads: list[threading.Thread] = []


def _pool_worker() -> None:
    while True:
        state, host = _task_q.get()
        if not state["cancelled"]:
            state["results"][host] = _resolve_one(host)
        state["sem"].release()


def _ensure_workers(n: int) -> None:
    """Grow the shared pool to >= n live threads (never shrink, never exceed
    the high-water max_workers across batches — the bounded-leak guarantee)."""
    with _pool_lock:
        _pool_threads[:] = [t for t in _pool_threads if t.is_alive()]
        for _ in range(n - len(_pool_threads)):
            t = threading.Thread(target=_pool_worker, daemon=True)
            t.start()
            _pool_threads.append(t)


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


def _resolve_batch(
    batch: list, timeout_s: float, max_workers: int
) -> list[tuple]:
    """Resolve one host batch through the shared pool; (host, ipv4, ipv6)
    tuples, NULLs past the batch deadline. Module-level so the wedged-pool
    tests can drive the exact production path without Spark."""
    import math
    import time

    workers = min(max_workers, len(batch))
    _ensure_workers(workers)
    state = {
        "cancelled": False,
        "results": {},
        "sem": threading.Semaphore(0),
    }
    for h in batch:
        _task_q.put((state, h))
    # One deadline for the whole batch: timeout_s per wave of ``workers``
    # concurrent lookups (not per host — per-host waits would compound to
    # len(batch) * timeout).
    deadline = time.monotonic() + timeout_s * max(1, math.ceil(len(batch) / workers))
    done = 0
    while done < len(batch):
        if not state["sem"].acquire(timeout=max(0.0, deadline - time.monotonic())):
            break  # deadline: unresolved hosts yield NULLs
        done += 1
    # cancel: queued leftovers are skipped by the workers; a late
    # completion from a wedged thread lands in this batch's own results
    # dict after we've read it (harmless)
    state["cancelled"] = True
    # Drain cancelled tasks ourselves: with EVERY pool thread wedged in
    # getaddrinfo nothing else pops the queue, and each later batch would
    # grow it by len(batch) forever — the unbounded growth this design
    # exists to prevent. Only one batch is live per worker process, so
    # anything still queued is cancelled; a live task raced to the queue
    # head is put back and we stop.
    try:
        while True:
            s, h = _task_q.get_nowait()
            if not s["cancelled"]:
                _task_q.put((s, h))
                break
            s["sem"].release()
    except queue.Empty:
        pass
    return [(h, *state["results"].get(h, (None, None))) for h in batch]


def resolve_hosts(
    hosts: DataFrame, timeout_s: float = 5.0, max_workers: int = 16
) -> DataFrame:
    """(host) frame -> (host, ipv4, ipv6); first A and first AAAA record,
    NULLs on failure/timeout. Input should be the distinct host set (the
    function distincts defensively — resolution must be once-per-host)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # resolve the pool through the module AT RUN TIME: cloudpickle
        # serializes a nested function's referenced globals BY VALUE, and the
        # task queue holds unpicklable locks (plus each worker must use its
        # OWN process's pool, not a copy of the driver's)
        from webcrawler_woc_spark.operators import dns as _dns

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = _dns._resolve_batch(list(pdf["host"]), timeout_s, max_workers)
            yield pd.DataFrame(out, columns=["host", "ipv4", "ipv6"])

    return (
        hosts.select("host")
        .distinct()
        .repartition("host")
        .mapInPandas(gen, schema=RESOLVE_SCHEMA)
    )


def cohost_clusters(resolved: DataFrame, min_cohosts: int = 2) -> DataFrame:
    """Shared-IP host clustering over the DNS-enrichment output: spam and
    link farms run hundreds of "independent" domains off one box, so the
    resolved address is the cheapest farm signal there is — hosts behind
    one IP inherit each other's reputation (TrustRank seeds, trap ratios,
    domain quality all propagate along co-hosting). CDNs co-host
    legitimately; that is why the output is a SIGNAL table (count + flag)
    for the policy layer, not a blocklist.

    Input (host, ip) — one row per host; a resolve_hosts frame
    (host, ipv4, ipv6) is accepted directly, ip = coalesce(ipv4, ipv6). Output per host: (host, ip, n_cohosts — total hosts on
    the ip INCLUDING this one, rep_host — min host on the ip,
    co_hosted 0/1 by ``min_cohosts``). NULL ips (resolution failures)
    pass through with n_cohosts 0 and no flag: unresolvable is not
    co-hosted.

    One groupBy(ip) to the ip-cardinality rollup + one broadcast join
    back — the host table is already orders smaller than the corpus, the
    rollup smaller still."""
    if "ip" not in resolved.columns:
        resolved = resolved.withColumn("ip", F.coalesce("ipv4", "ipv6"))
    groups = (
        resolved.filter(F.col("ip").isNotNull())
        .groupBy("ip")
        .agg(
            F.countDistinct("host").cast("int").alias("n_cohosts"),
            F.min("host").alias("rep_host"),
        )
    )
    return (
        resolved.join(F.broadcast(groups), "ip", "left")
        .withColumn("n_cohosts", F.coalesce(F.col("n_cohosts"), F.lit(0)).cast("int"))
        .withColumn(
            "co_hosted", (F.col("n_cohosts") >= min_cohosts).cast("int")
        )
        .select("host", "ip", "n_cohosts", "rep_host", "co_hosted")
    )
