"""Extra benchmarks for the optimization round (guide §1.4): per-query
noop-sink isolation timings with job labels, independent of the frozen
bench.py. Prints one JSON line {query: [run_sec, ...]}.

Usage: python bench_extra.py [query ...]      (default: the bench-12 set)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT = [
    "crawl_extracted_text",
    "dedup_exact",
    "dedup_simhash",
    "dedup_substrings",
    "cluster_kmeans",
    "crawl_domain_quality",
    "pipeline_chunk_passages",
    "text_token_counts",
    "text_fingerprint",
    "ann_cosine_topk",
    "rel_agg_pricing",
    "rel_topk_per_group",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    names = sys.argv[1:] or DEFAULT

    import __spark_entry__ as entrymod
    from webcrawler_woc_spark.session import get_spark

    spark = get_spark(
        app_name="wcw-bench-extra", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus * 2)
    )
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    # warm-up: pay JVM codegen + Python worker startup outside the timings
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        runs = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
