"""Idle-machine attribution probe for the crawl_depth3 bench number.

Mirrors bench.py's exact protocol (sf0.1 corpus x4 replicas, local[32],
depth-1 warm-up, then N back-to-back depth-3 crawls) and prints one JSON
line with every run, so a bench-median swing can be attributed to code vs
co-tenant noise the same way the round-4 kernel attribution was
(BENCH/BASELINE.md). Run on an otherwise idle machine.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _cpu_jiffies() -> dict:
    """user/system/idle/iowait/steal jiffies from /proc/stat (whole box)."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    return {
        "user": int(f[1]),
        "system": int(f[3]),
        "idle": int(f[4]),
        "iowait": int(f[5]),
        "steal": int(f[8]),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("ATTR_RUNS", "6"))

    from webcrawler_woc_spark.session import get_spark

    spark = get_spark(
        app_name="wcw-attr-depth3", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus * 2)
    )
    pages, _ = bench.build_corpus(spark, sf_dir, mult=4)
    pages = pages.persist()
    pages.count()

    bench.bench_wave_kernel(spark, pages)  # python-worker warm-up
    bench.bench_crawl_depth3(spark, pages, depth=1)  # codegen/JIT warm-up
    runs, stats = [], []
    for i in range(n_runs):
        j0 = _cpu_jiffies()
        r = bench.bench_crawl_depth3(spark, pages)
        j1 = _cpu_jiffies()
        runs.append(round(r["sec"], 3))
        d = {k: j1[k] - j0[k] for k in j0}
        # jiffy deltas normalized to per-second-of-wall CPU shares: a slow
        # run with the same busy share but inflated steal/idle is co-tenant
        # noise; a slow run with MORE busy jiffies is the code doing more work
        tot = max(sum(d.values()), 1)
        stats.append({k: round(v / tot, 4) for k, v in d.items()} | {"busy_jiffies": d["user"] + d["system"]})
        print(f"run {i + 1}/{n_runs}: {r['sec']:.2f}s {stats[-1]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "probe": "crawl_depth3_attribution",
                "runs": runs,
                "median": round(statistics.median(runs), 3),
                "min": min(runs),
                "max": max(runs),
                "cpu_shares": stats,
                "t0_epoch": int(time.time()),
            }
        )
    )


if __name__ == "__main__":
    main()
