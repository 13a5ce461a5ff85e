"""One scaling-bench run at a given core count. Prints one JSON line.

The workload is the engine's per-wave inner job (fetch-gate -> pandas-UDF
extraction -> canonicalize -> wave dedup -> policy route -> count), i.e. the
URLs/sec kernel the north rule measures, over a corpus replicated to
SPARK_GRAFT_BENCH_MULT x sf0.1 (~deterministic, no wall-clock inputs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    mult = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "100"))

    from webcrawler_woc_spark.session import get_spark

    spark = get_spark(
        app_name=f"wcw-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=128,  # fixed across runs: same plan, same splits
        extra_conf={
            # tmpfs shuffle dirs: measure compute scaling, not /tmp disk
            "spark.local.dir": "/dev/shm/spark-local",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        },
    )

    from bench import bench_wave_kernel, build_corpus

    pages, _ = build_corpus(spark, sf_dir, mult=mult)
    # fixed partition count so both core counts see identical task layout
    pages = pages.repartition(128).persist()
    pages.count()

    # warmup (JIT, python worker pool spin-up), then median of 3 measured
    # runs — single runs at high core counts show 2-3x variance from JIT /
    # AQE stat timing
    bench_wave_kernel(spark, pages)
    runs = [bench_wave_kernel(spark, pages) for _ in range(3)]
    secs = sorted(r["sec"] for r in runs)
    res = {"urls": runs[0]["urls"], "sec": secs[1]}

    print(
        json.dumps(
            {
                "cores": cores,
                "mult": mult,
                "urls": res["urls"],
                "sec": round(res["sec"], 3),
                "all_secs": [round(s, 2) for s in secs],
                "urls_per_sec": round(res["urls"] / res["sec"], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
