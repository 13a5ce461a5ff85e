"""One BFS wave as a single composed DataFrame job.

Maps the reference's wave body (src/crawler.rs:53-99 / 135-192) to:

    frontier_w --politeness schedule--> scheduled + deferred
    scheduled --left join pages (fetch sim)--> fetched
    fetched --MIME gate--> gated --pandas UDFs--> contains_words, child links
    children (+ sitemap children on wave 0 of no-depth) --wave dedup-->
      --bloom prefilter + anti-join seen--> next frontier candidates
      --anti-join rejected--> newly rejected (emitted once)
    writes: links_out (self rows + rejected rows), flagged, seen += scheduled,
            frontier_{w+1} = candidates ∪ deferred, crawl_order, lineage

Determinism: all order comes from explicit sorts (politeness slots); the
wave barrier is the parquet write action; within-wave seen semantics are the
race-free batch interpretation (see operators/routing.py docstring).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..operators.bloom import PartitionedBloom, bloom_prefiltered_anti_join
from ..operators.extract import HTML_MIMES, extract_child_links
from ..operators.fetch import fetch_join, with_host, with_url_hash
from ..operators.politeness import crawl_order, schedule_wave
from ..operators.routing import dedup_wave, route_children
from ..functions.udfs import link_type_col, make_contains_words_udf
from .state import Warehouse


def run_wave(
    spark: SparkSession,
    wh: Warehouse,
    pages: DataFrame,
    wave: int,
    cfg: CrawlConfig,
    bloom: PartitionedBloom | None,
    robots: DataFrame | None = None,
    extra_children: DataFrame | None = None,
    content_type_expr=None,
) -> dict:
    """Execute wave `wave`; commit all outputs; return counts."""
    t0 = time.time()
    frontier = wh.read_frontier(wave)
    if frontier is None:
        raise RuntimeError(f"no frontier for wave {wave}")

    # -- politeness schedule (defines deterministic crawl order) ------------
    scheduled, deferred = schedule_wave(frontier, robots, cfg.host_budget)
    scheduled = scheduled.cache()  # reused: fetch, seen-update, anti-join

    # -- fetch simulation ---------------------------------------------------
    fetched = fetch_join(scheduled, pages, content_type_expr)
    gate = F.col("fetched") & F.col("content_type").isin(*HTML_MIMES)
    if cfg.words:
        words_udf = make_contains_words_udf(cfg.words)
        fetched = fetched.withColumn(
            "contains_words", F.when(gate, words_udf(F.col("html"))).otherwise(F.lit(False))
        )
    else:
        fetched = fetched.withColumn("contains_words", F.lit(False))
    fetched = fetched.cache()

    # -- self rows: every scheduled URL becomes a crawled Link --------------
    self_links = fetched.select(
        F.col("url"),
        F.col("url_hash"),
        F.col("host"),
        F.col("content_type"),
        F.col("headers"),
        F.lit(True).alias("crawled"),
        F.col("ipv4"),
        F.col("ipv6"),
        link_type_col(F.col("url")).alias("link_type"),
        F.col("contains_words"),
        F.col("fetched"),
    )

    # -- extraction ---------------------------------------------------------
    gated = fetched.filter(gate)
    children = extract_child_links(gated).select("url", "link_type")
    if extra_children is not None:
        children = children.unionByName(extra_children.select("url", "link_type"))
    children = children.cache()  # the pandas-UDF extraction runs exactly once

    deduped = with_host(with_url_hash(dedup_wave(children)))

    # -- routing ------------------------------------------------------------
    seen_prev = wh.read_waves("seen", up_to_wave=wave - 1)
    rejected_prev = wh.read_waves("rejected", up_to_wave=wave - 1)
    empty_seen = spark.createDataFrame([], "url_hash long, url string")
    seen_prev = seen_prev.select("url_hash", "url") if seen_prev is not None else empty_seen
    rejected_prev = (
        rejected_prev.select("url_hash", "url") if rejected_prev is not None else empty_seen
    )

    sc_frontier, newly_rejected = route_children(
        deduped, empty_seen.limit(0), rejected_prev, cfg.whitelist, cfg.blacklist
    )
    # seen anti-join with Bloom fast path (bloom covers waves < wave);
    # then subtract THIS wave's scheduled urls (batch seen semantics).
    sc_frontier = bloom_prefiltered_anti_join(spark, sc_frontier, seen_prev, bloom)
    sc_frontier = sc_frontier.join(
        F.broadcast(scheduled.select("url_hash", "url")), ["url_hash", "url"], "left_anti"
    )

    # a deferred url rediscovered as a child merges deterministically to the
    # max priority (url_hash/host are functions of url, so min() is exact)
    next_frontier = (
        sc_frontier.select(
            "url",
            "url_hash",
            "host",
            F.lit(cfg.child_priority).alias("priority"),
        )
        .unionByName(deferred.select("url", "url_hash", "host", "priority"))
        .groupBy("url")
        .agg(
            F.min("url_hash").alias("url_hash"),
            F.min("host").alias("host"),
            F.max("priority").alias("priority"),
        )
        .select(F.lit(wave + 1).cast("int").alias("wave"), "url", "url_hash", "host", "priority")
    )

    # -- rejected links become output rows (crawled=false, no metadata) -----
    rejected_links = newly_rejected.select(
        F.col("url"),
        F.col("url_hash"),
        F.col("host"),
        F.lit(None).cast("string").alias("content_type"),
        F.lit(None).cast("map<string,string>").alias("headers"),
        F.lit(False).alias("crawled"),
        F.lit(None).cast("string").alias("ipv4"),
        F.lit(None).cast("string").alias("ipv6"),
        F.col("link_type"),
        F.lit(False).alias("contains_words"),
        F.lit(True).alias("fetched"),  # unused for rejected; kept for schema
    )
    links_out = self_links.unionByName(rejected_links)

    # -- writes (the wave barrier) -----------------------------------------
    table_paths = {}
    table_paths["links_out"] = wh.write_wave_table(
        "links_out", wave, links_out.drop("fetched"), bucket=False
    )
    new_seen = scheduled.select("url_hash", "url")
    table_paths["seen"] = wh.write_wave_table("seen", wave, new_seen, bucket=True)
    new_rej = newly_rejected.select("url_hash", "url")
    table_paths["rejected"] = wh.write_wave_table("rejected", wave, new_rej, bucket=True)
    table_paths["frontier"] = wh.write_wave_table("frontier", wave + 1, next_frontier, bucket=True)
    flagged = fetched.filter(F.col("contains_words")).select("url")
    table_paths["flagged"] = wh.write_wave_table("flagged", wave, flagged)
    from ..operators.extract import extracted_text

    table_paths["extracted_text"] = wh.write_wave_table(
        "extracted_text", wave, extracted_text(gated)
    )
    order_df = crawl_order(scheduled, wave)
    table_paths["crawl_order"] = wh.write_wave_table("crawl_order", wave, order_df)

    # -- metrics + lineage (read back from committed files: exact, cheap) ---
    frontier_in = frontier.count()
    n_scheduled = scheduled.count()
    fetch_ok = fetched.filter(F.col("fetched")).count()
    extracted = children.count()
    new_frontier_n = spark.read.parquet(table_paths["frontier"]).count()
    new_rejected_n = spark.read.parquet(table_paths["rejected"]).count()
    host_lineage = [
        {"host": r["host"], "fetched": r["cnt"]}
        for r in fetched.groupBy("host")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("host"))
        .limit(100)  # lineage keeps the hottest hosts; full counts live in parquet
        .collect()
    ]

    # -- bloom update (transactional with the manifest commit). Bitmaps are
    # built distributed (one small bitmap per bucket reaches the driver,
    # never the URLs) and OR-merged into the running filter. ----------------
    if cfg.use_bloom:
        if bloom is None:
            bloom = PartitionedBloom(cfg.n_buckets)
        from ..operators.bloom import build_bucket_bitmaps

        rows = build_bucket_bitmaps(new_seen, bloom.n_buckets, bloom.m_bits, bloom.k)
        bloom.merge_spark_bitmaps(rows)

    counts = {
        "frontier_in": frontier_in,
        "scheduled": n_scheduled,
        "fetched": fetch_ok,
        "fetch_failed": n_scheduled - fetch_ok,
        "extracted_links": extracted,
        "new_frontier": new_frontier_n,
        "new_rejected": new_rejected_n,
    }
    wh.commit_wave(wave, table_paths, counts, host_lineage, time.time() - t0, bloom)
    scheduled.unpersist()
    fetched.unpersist()
    children.unpersist()
    return counts
