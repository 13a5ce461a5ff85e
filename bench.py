"""Benchmark harness — prints ONE JSON line per run.

    {"metric": "frontier_expansion", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, "urls_per_sec": ...,
     "corpus_pages": ...}

Headline workloads:
* ``crawl_depth3``  — the full engine (politeness slots, bloom-prefiltered
  anti-joins, warehouse commits) to depth 3 from 10 seeds;
* ``wave_kernel``   — one fetch->extract->canonicalize->dedup->route wave over
  the whole corpus (the inner loop whose URLs/sec is the north-rule metric);
* extraction / dedup / text / ann / relational headliners.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32). Deterministic — no wall-clock inputs.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_corpus(spark, sf_dir: str, mult: int = 1):
    """Derived pages corpus, optionally replicated ``mult``x with disjoint
    doc-id spaces (deterministic scale-up for bench runs)."""
    from pyspark.sql import functions as F

    from webcrawler_woc_spark.sources.corpus import doc_pages, robots_sitemap_pages

    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = documents.count()
    if mult > 1:
        documents = (
            documents.crossJoin(spark.range(mult).withColumnRenamed("id", "rep"))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
            .drop("rep")
        )
        n = n * mult
    pages = doc_pages(documents, n).unionByName(robots_sitemap_pages(spark, n))
    # size cache partitions to the data (the raw read inherits one splittable
    # parquet partition per ~tiny file x mult => hundreds of near-empty
    # partitions; every downstream corpus scan then pays per-task overhead)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return pages.repartition(min(n_part, max(8, n // 2000))), n


def bench_crawl_depth3(spark, pages, depth: int = 3) -> dict:
    from webcrawler_woc_spark.config import CrawlConfig
    from webcrawler_woc_spark.plans.crawl import crawl
    from webcrawler_woc_spark.plans.state import Warehouse

    wl = [f"host{i}.example" for i in range(10)]
    seeds = [(f"http://host{i}.example/page/{i}", 1.0) for i in range(10)]
    cfg = CrawlConfig(whitelist=wl, words=["merge"], depth=depth, use_bloom=True, n_buckets=32)
    with tempfile.TemporaryDirectory(prefix="wcw_bench_") as tmp:
        wh = Warehouse(spark, tmp, n_buckets=32)
        t0 = time.time()
        summary = crawl(spark, wh, pages, seeds, cfg)
        wall = time.time() - t0
        return {"sec": wall, "scheduled": summary["scheduled_total"], "waves": summary["waves"]}


def bench_wave_kernel(spark, pages) -> dict:
    """One full-corpus wave: every page is frontier; extract+canonicalize+
    type+dedup+policy-route. URLs/sec = extracted links / wall."""
    from pyspark.sql import functions as F

    from webcrawler_woc_spark.operators.extract import extract_child_links, mime_ok
    from webcrawler_woc_spark.operators.fetch import with_host, with_url_hash
    from webcrawler_woc_spark.operators.routing import dedup_wave, should_crawl_col
    from webcrawler_woc_spark.sources.corpus import default_content_type_expr

    wl = [f"host{i}.example" for i in range(5)]
    t0 = time.time()
    ct = default_content_type_expr(F.col("url"))
    gated = pages.withColumn("content_type", ct).filter(mime_ok(F.col("content_type")))
    children = extract_child_links(gated)
    deduped = with_host(with_url_hash(dedup_wave(children.select("url", "link_type"))))
    routed = deduped.withColumn("sc", should_crawl_col(F.col("host"), wl, None))
    counts = routed.groupBy("sc").agg(F.count("*").alias("n")).collect()
    wall = time.time() - t0
    total = sum(r["n"] for r in counts)
    return {"sec": wall, "urls": total}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_CORPUS_MULT", "4"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from webcrawler_woc_spark.session import get_spark

    spark = get_spark(
        app_name="wcw-bench", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus * 2)
    )

    import __spark_entry__ as entrymod

    pages, n_pages = build_corpus(spark, sf_dir, mult=mult)
    pages = pages.persist()
    n_rows = pages.count()  # materialize once; bench measures compute, not gen

    queries: dict[str, float] = {}

    t0 = time.time()
    bench_wave_kernel(spark, pages)  # warm-up: Python UDF workers + codegen

    # this VM shows bursty co-tenant noise (identical crawls swing 3x
    # back-to-back); run three times, report the MEDIAN (not min — a min is
    # biased toward favorable noise), disclose every run
    import statistics

    # depth-1 warm-up first: the first crawl in a fresh JVM pays codegen/JIT
    # for the whole wave plan (~+4s on this box), which would otherwise land
    # in one of the three measured runs and skew the median
    _warm_cfg_runs = bench_crawl_depth3(spark, pages, depth=1)
    crawl_runs = [bench_crawl_depth3(spark, pages) for _ in range(3)]
    queries["crawl_depth3"] = round(statistics.median(r["sec"] for r in crawl_runs), 3)
    crawl_res = crawl_runs[0]  # scheduled/waves are deterministic across runs

    # median-of-3 per query: the r02 "crawl_extracted_text regression" was a
    # single-run artifact (warm steady-state is ~0.9s; one cold/noisy sample
    # read as +41%) — short queries get the same noise protocol as the crawl
    query_runs: dict[str, list[float]] = {}
    for name in (
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
    ):
        fn = entrymod.queries()[name]
        runs = []
        for _ in range(3):
            t = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t)
        queries[name] = round(statistics.median(runs), 3)
        query_runs[name] = [round(r, 3) for r in runs]

    # steady-state kernel throughput (the north-rule URLs/sec metric),
    # measured LAST on a larger replica so per-job fixed costs amortize and
    # its cache never pressures the other workloads (same protocol as the
    # BENCH/BASELINE.md scaling runs).
    kern_mult = int(os.environ.get("SPARK_GRAFT_KERNEL_MULT", "40"))
    pages.unpersist()  # the x4 corpus is done; don't let it shove the kernel cache
    kern_pages, _ = build_corpus(spark, sf_dir, mult=kern_mult)
    kern_pages = kern_pages.persist()
    kern_pages.count()
    # 5 runs (not 3): this VM's co-tenant bursts run several seconds, long
    # enough to poison 2 of 3 samples — a 5-sample median survives one burst
    kern_runs = [bench_wave_kernel(spark, kern_pages) for _ in range(5)]
    kern = {
        "sec": statistics.median(r["sec"] for r in kern_runs),
        "urls": kern_runs[0]["urls"],
    }
    # metric name carries the replica multiplier: throughput scales with the
    # corpus mult (fixed per-job costs amortize), so an x40 number must never
    # be conflated with an old un-suffixed (x4-corpus) baseline
    queries[f"wave_kernel_x{kern_mult}"] = round(kern["sec"], 3)
    kern_pages.unpersist()

    total = round(time.time() - t0, 3)
    out = {
        "metric": "frontier_expansion_suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "corpus_pages": n_rows,
        "wave_kernel_urls": kern["urls"],
        "wave_kernel_urls_per_sec": round(kern["urls"] / max(kern["sec"], 1e-9), 1),
        "kernel_mult": kern_mult,
        "wave_kernel_runs": [round(r["sec"], 3) for r in kern_runs],
        "wave_kernel_stat": "median",
        "crawl_scheduled": crawl_res["scheduled"],
        "crawl_depth3_runs": [round(r["sec"], 3) for r in crawl_runs],
        "crawl_depth3_stat": "median",
        "query_runs": query_runs,
        "query_stat": "median",
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
