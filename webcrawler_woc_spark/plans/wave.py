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
from ..operators.extract import extract_child_links, mime_ok
from ..operators.fetch import fetch_join, with_host, with_url_hash
from ..operators.politeness import crawl_order, schedule_wave
from ..operators.routing import dedup_wave, route_children
from ..functions.udfs import link_type_col, make_contains_words_udf
from .state import Warehouse


def cfg_fingerprint(cfg: CrawlConfig) -> str:
    """Stable fingerprint of every cfg field that shapes wave outputs — the
    mid-wave-resume staging sidecar records it so leftovers from a crashed
    attempt under a DIFFERENT cfg are never mixed into a resumed wave."""
    import dataclasses
    import hashlib
    import json

    return hashlib.sha256(
        json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str).encode()
    ).hexdigest()


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
    disallow: DataFrame | None = None,
    input_fp: str = "",
) -> dict:
    """Execute wave `wave`; commit all outputs; return counts."""
    t0 = time.time()
    frontier = wh.read_frontier(wave)
    if frontier is None:
        raise RuntimeError(f"no frontier for wave {wave}")

    # exact size of this frontier, from the previous wave's committed manifest
    # (wave 0 seeds are driver-written and tiny => None => broadcast). Gates
    # every wave-side broadcast below: an unbudgeted crawl's out-degree can
    # exceed what a broadcast survives (see config.BROADCAST_MAX_ROWS).
    prev_info = wh.manifest["waves"].get(str(wave - 1), {})
    frontier_rows = prev_info.get("counts", {}).get("new_frontier")

    # -- robots Disallow gate (opt-in politeness extension; the disallow
    # cache is parsed once per crawl by the driver, not per wave) ------------
    if disallow is not None:
        from ..operators.politeness import filter_disallowed

        frontier = filter_disallowed(frontier, disallow)

    # -- crawler-trap gate (opt-in; scan-only projection, so trap subtrees
    # cost nothing past this point — not a schedule slot, not a seen-filter
    # probe, not a fetch) ----------------------------------------------------
    if cfg.trap_filter:
        from ..operators.traps import filter_traps

        frontier = filter_traps(frontier)

    # -- politeness schedule (defines deterministic crawl order) ------------
    scheduled, deferred = schedule_wave(frontier, robots, cfg.host_budget)
    scheduled = scheduled.cache()  # reused: fetch, seen-update, anti-join

    # -- fetch simulation ---------------------------------------------------
    # ``matched`` is cached so the corpus is scanned EXACTLY ONCE per wave:
    # the fetch-failure anti-join, the word scan, extraction, and the text
    # write all read the (wave-bounded) hit set from cache, never rescanning
    # pages. At 10^10-URL scale this cache is the wave's politeness-bounded
    # working set (use MEMORY_AND_DISK semantics — Spark default spills).
    from ..operators.fetch import fetch_matched

    if cfg.fetch_mode == "http":
        # real HTTP fetch (operators/httpfetch.py): one mapInPandas pool per
        # host partition, same output contract as fetch_join, so the rest of
        # the wave is mode-agnostic. localCheckpoint (NOT cache): the live
        # fetch is non-deterministic, so its output must be PINNED — cache
        # eviction / task retry would re-issue real GETs and let the two
        # consumers (slim metadata path, gated extraction path) observe
        # different responses, breaking wave determinism and politeness.
        # Lineage truncation makes recompute impossible by construction.
        # eager=False: the first action below materializes it exactly once.
        from ..operators.httpfetch import http_fetch_join

        matched = http_fetch_join(
            scheduled,
            timeout_ms=cfg.timeout_ms,
            max_per_host=cfg.http_max_per_host,
            http_base=cfg.http_base,
        ).localCheckpoint(eager=False)
        fetched = matched
    else:
        matched = fetch_matched(scheduled, pages, frontier_rows=frontier_rows).cache()
        fetched = fetch_join(
            scheduled,
            pages,
            content_type_expr,
            matched=matched,
            timeout_ms=cfg.timeout_ms,
            frontier_rows=frontier_rows,
        )
    gate = F.col("fetched") & mime_ok(F.col("content_type"))
    if cfg.words:
        words_udf = make_contains_words_udf(cfg.words)
        fetched = fetched.withColumn(
            "contains_words", F.when(gate, words_udf(F.col("html"))).otherwise(F.lit(False))
        )
    else:
        fetched = fetched.withColumn("contains_words", F.lit(False))
    # metadata consumers (self rows, flagged, counts, lineage) never need the
    # page bytes — cache the slim projection, not the html payload.
    fetched = fetched.drop("html", "page_text").cache()

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
    # html lives only in the matched cache; the body gate (MIME + timeout) is
    # THE shared html_body_gate expression — identical to fetch_join's, so
    # links_out metadata and the extracted corpus cannot diverge.
    from ..operators.extract import html_body_gate

    if cfg.fetch_mode == "http":
        # http mode gates on the ACTUAL response metadata (fetched already
        # encodes timeout/refused; content_type came off the wire)
        gated = matched.filter(
            F.col("fetched") & mime_ok(F.col("content_type"))
        ).select("url", "html")
    else:
        if content_type_expr is None:
            from ..sources.corpus import default_content_type_expr as content_type_expr
        gated = matched.filter(
            html_body_gate(F.col("url"), content_type_expr, cfg.timeout_ms)
        ).select("url", "html")
    children = extract_child_links(gated).select("url", "link_type")
    if cfg.strip_tracking:
        # tracking-param canonicalization BEFORE the wave dedup, so utm_*
        # variants of one URL merge there and the seen set only ever holds
        # stripped forms (scan-side higher-order exprs, no extra shuffle)
        from ..functions.urlnorm import strip_tracking_params_col

        children = children.select(
            strip_tracking_params_col(F.col("url")).alias("url"), "link_type"
        )
    if extra_children is not None:
        children = children.unionByName(extra_children.select("url", "link_type"))
    children = children.cache()  # the pandas-UDF extraction runs exactly once

    # -- fill the shared caches ONCE, sequentially (a concurrent first touch
    # would compute the same lineage twice). children.count drives the one
    # corpus scan of the wave and fills the matched cache en route; fetched
    # then reads that cache. The exact children count also sizes the routing
    # broadcasts below.
    timings: dict[str, float] = {}

    def _timed(key: str, fn):
        t = time.time()
        out = fn()
        timings[key] = round(time.time() - t, 3)
        return out

    _timed("cache_scheduled", scheduled.count)  # politeness window only
    extracted = _timed("cache_children", children.count)  # corpus scan + matched cache

    # deduped feeds BOTH routing branches (next-frontier and rejected), and
    # newly_rejected feeds BOTH the rejected write and links_out — cached, or
    # the dedup shuffle + anti-join subplans re-run once per consuming write
    deduped = with_host(with_url_hash(dedup_wave(children))).cache()

    # -- routing ------------------------------------------------------------
    seen_prev = wh.read_waves("seen", up_to_wave=wave - 1)
    rejected_prev = wh.read_waves("rejected", up_to_wave=wave - 1)
    empty_seen = spark.createDataFrame([], "url_hash long, url string")
    seen_prev = seen_prev.select("url_hash", "url") if seen_prev is not None else empty_seen
    rejected_prev = (
        rejected_prev.select("url_hash", "url") if rejected_prev is not None else empty_seen
    )

    sc_frontier, newly_rejected = route_children(
        deduped,
        empty_seen.limit(0),
        rejected_prev,
        cfg.whitelist,
        cfg.blacklist,
        children_rows=extracted,
    )
    # seen anti-join with the sketch fast path (the sidecar covers waves <
    # wave; bloom and cuckoo share the no-false-negative prefilter contract);
    # then subtract THIS wave's scheduled urls (batch seen semantics).
    # seen_probe="sharded" swaps the whole-filter broadcast for the
    # file-per-bucket probe (each task loads only its own bucket — the
    # 10^10-URL form); falls back to broadcast when no sharded sidecar is
    # committed yet (wave 0, or a warehouse written in broadcast mode).
    # scale-adaptive probe skip: the sketch prefilter (broadcast bitmaps +
    # a pandas-UDF probe evaluated on BOTH union branches) pays for itself
    # only once the cumulative seen set dwarfs the wave's candidates. While
    # the whole seen set is itself broadcast-small, the exact anti-join
    # alone is strictly cheaper — and by the no-false-negative contract the
    # result is identical with or without the probe. The manifest's exact
    # per-wave scheduled counts give the cumulative size for free. The
    # sidecar UPDATE below is unconditional either way (resume contract).
    from ..config import small_enough_to_broadcast as _bcast_ok

    _seen_rows = sum(
        int(info.get("counts", {}).get("scheduled", 0))
        for w, info in wh.manifest["waves"].items()
        if int(w) < wave
    )
    probe_filter = bloom if not _bcast_ok(_seen_rows) else None
    _sharded_dir = (
        wh.sharded_dir() if cfg.seen_probe_mode() == "sharded" and bloom is not None else None
    )
    if _sharded_dir is not None:
        from ..operators.sharded_probe import sharded_prefiltered_anti_join

        sc_frontier = sharded_prefiltered_anti_join(
            spark, sc_frontier, seen_prev, _sharded_dir, candidates_rows=extracted
        )
    elif probe_filter is not None and getattr(probe_filter, "kind", "bloom") == "cuckoo":
        from ..operators.cuckoo import cuckoo_prefiltered_anti_join

        sc_frontier = cuckoo_prefiltered_anti_join(
            spark, sc_frontier, seen_prev, probe_filter, candidates_rows=extracted
        )
    else:
        sc_frontier = bloom_prefiltered_anti_join(
            spark, sc_frontier, seen_prev, probe_filter, candidates_rows=extracted
        )
    from ..config import small_enough_to_broadcast

    sched_keys = scheduled.select("url_hash", "url")
    if small_enough_to_broadcast(frontier_rows):  # |scheduled| <= |frontier|
        sched_keys = F.broadcast(sched_keys)
    sc_frontier = sc_frontier.join(sched_keys, ["url_hash", "url"], "left_anti")

    # two independent fill chains over already-materialized caches — overlap
    # them (fetched reads matched; rejected reads deduped, so that pair chains)
    newly_rejected = newly_rejected.cache()
    from concurrent.futures import ThreadPoolExecutor as _TPE

    def _fill_routing():
        _timed("cache_deduped", deduped.count)
        _timed("cache_rejected", newly_rejected.count)

    with _TPE(max_workers=2) as _pool:
        f1 = _pool.submit(_timed, "cache_fetched", fetched.count)
        f2 = _pool.submit(_fill_routing)
        f1.result(), f2.result()

    # a deferred url rediscovered as a child merges deterministically to the
    # max priority (url_hash/host are functions of url, so min() is exact).
    # With no politeness budget the deferred side is empty by construction and
    # sc_frontier is already wave-deduped — skip the merge shuffle entirely.
    new_candidates = sc_frontier.select(
        "url", "url_hash", "host", F.lit(cfg.child_priority).alias("priority")
    )
    if cfg.host_budget is None:
        merged = new_candidates
    else:
        merged = (
            new_candidates.unionByName(deferred.select("url", "url_hash", "host", "priority"))
            .groupBy("url")
            .agg(
                F.min("url_hash").alias("url_hash"),
                F.min("host").alias("host"),
                F.max("priority").alias("priority"),
            )
        )
    next_frontier = merged.select(
        F.lit(wave + 1).cast("int").alias("wave"), "url", "url_hash", "host", "priority"
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
    from pyspark.sql import Observation

    # counts ride the write actions as observations — no extra jobs.
    obs_links = Observation(f"links_out_w{wave}")
    links_out = links_out.observe(
        obs_links,
        F.count(F.when(F.col("crawled"), 1)).alias("scheduled"),
        F.count(F.when(F.col("crawled") & F.col("fetched"), 1)).alias("fetch_ok"),
        F.count(F.when(~F.col("crawled"), 1)).alias("rejected"),
    )
    obs_frontier = Observation(f"frontier_w{wave}")
    next_frontier = next_frontier.observe(obs_frontier, F.count(F.lit(1)).alias("n"))

    # the caches are already filled (sequential block above) — fire the
    # independent table writes from a driver thread pool; Spark schedules
    # concurrent jobs fine, and the writes only read the caches. The wave
    # barrier is the pool join; the manifest commit below stays atomic.
    from concurrent.futures import ThreadPoolExecutor

    from ..operators.extract import extracted_text

    new_seen = scheduled.select("url_hash", "url")
    new_rej = newly_rejected.select("url_hash", "url")
    flagged = fetched.filter(F.col("contains_words")).select("url")
    order_df = crawl_order(scheduled, wave)
    writes = {
        "links_out": ("w_links_out", wave, links_out.drop("fetched"), False),
        "seen": ("w_seen", wave, new_seen, True),
        "rejected": ("w_rejected", wave, new_rej, True),
        "frontier": ("w_frontier", wave + 1, next_frontier, True),
        "flagged": ("w_flagged", wave, flagged, False),
        "extracted_text": ("w_text", wave, extracted_text(gated), False),
        "crawl_order": ("w_order", wave, order_df, False),
    }
    # mid-wave resume: a wave that crashed BETWEEN table writes left some
    # tables complete (parquet _SUCCESS marker) but no manifest entry. Wave
    # outputs are deterministic given (frontier, corpus, cfg), so completed
    # tables are skipped, only the missing ones are (re)written, and the
    # manifest commit below still makes the wave visible atomically.
    #
    # The determinism premise is VALIDATED, not assumed: a staging sidecar
    # records the cfg fingerprint AND the input fingerprint (seed list +
    # corpus input files, computed by crawl()) before any write; if the
    # crashed attempt ran under a different cfg OR different inputs (the CLI
    # re-derives both from flags on every resume), its leftovers are ignored
    # and every table is rewritten — otherwise a resumed wave could
    # atomically commit a mix of old-run and new-run tables.
    import json as _json
    import os as _os

    cfg_fp = cfg_fingerprint(cfg)
    staging_path = _os.path.join(wh.path, f"staging_wave_{wave}.json")
    stale_attempt = True
    if _os.path.exists(staging_path):
        try:
            with open(staging_path) as f:
                prior = _json.load(f)
                stale_attempt = (
                    prior.get("cfg_fp") != cfg_fp or prior.get("input_fp") != input_fp
                )
        except (OSError, ValueError):
            stale_attempt = True
    with open(staging_path + ".tmp", "w") as f:
        _json.dump({"cfg_fp": cfg_fp, "input_fp": input_fp, "wave": wave}, f)
    _os.replace(staging_path + ".tmp", staging_path)

    skipped: set[str] = set()

    def _write_or_skip(table: str, wv: int, df_, bucket: bool) -> str:
        path = wh.table_wave_path(table, wv)
        if not stale_attempt and _os.path.exists(_os.path.join(path, "_SUCCESS")):
            skipped.add(table)
            return path
        return wh.write_wave_table(table, wv, df_, bucket=bucket)

    # seen-filter update job, defined here so it can OVERLAP the write pool
    # below (it reads only the already-filled scheduled cache; the merged
    # sidecar is persisted by commit_wave AFTER the pool joins). Both kinds
    # build distributed (one small table/bitmap per bucket reaches the
    # driver, never the URLs) and merge into the running filter.
    kind = cfg.seen_filter_kind()
    _filter_update = None
    if kind == "bloom":
        if bloom is None:
            bloom = PartitionedBloom(cfg.n_buckets)
        from ..operators.bloom import build_bucket_bitmaps

        def _filter_update(b=bloom):
            rows = build_bucket_bitmaps(new_seen, b.n_buckets, b.m_bits, b.k)
            b.merge_spark_bitmaps(rows)

    elif kind == "cuckoo":
        if bloom is None:
            from ..operators.cuckoo import PartitionedCuckoo

            bloom = PartitionedCuckoo(cfg.n_buckets)
        from ..operators.cuckoo import build_bucket_tables, merge_spark_tables

        def _filter_update(b=bloom):
            rows = build_bucket_tables(new_seen, b.n_buckets, b.m)
            merge_spark_tables(b, rows)

    def _lineage_job():
        return [
            {"host": r["host"], "fetched": r["cnt"]}
            for r in fetched.groupBy("host")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("host"))
            .limit(100)  # lineage keeps the hottest hosts; full counts live in parquet
            .collect()
        ]

    table_paths = {}
    # one pool slot per job: every input is cached, so the jobs only
    # contend for executor cores, and the block is bounded by the slowest
    # single write. The three metric/sidecar jobs (frontier-in count, host
    # lineage, seen-filter build) read only filled caches / tiny parquet,
    # so they back-fill cores the write tail leaves idle (guide §2.6)
    # instead of running sequentially after the pool.
    with ThreadPoolExecutor(max_workers=len(writes) + 3) as pool:
        futs = {
            table: pool.submit(
                _timed, tkey, lambda t=table, w=wv, d=df_, b=bucket: _write_or_skip(t, w, d, b)
            )
            for table, (tkey, wv, df_, bucket) in writes.items()
        }
        f_frontier_in = pool.submit(_timed, "c_frontier_in", frontier.count)
        f_lineage = pool.submit(_timed, "c_lineage", _lineage_job)
        f_filter = (
            pool.submit(_timed, "bloom_update", _filter_update)
            if _filter_update is not None
            else None
        )
        for table, fut in futs.items():
            table_paths[table] = fut.result()
        frontier_in = f_frontier_in.result()
        host_lineage = f_lineage.result()
        if f_filter is not None:
            f_filter.result()

    # -- metrics (observed on the writes: exact, zero extra jobs) -----------
    if "links_out" in skipped:
        # the observation never fired (write skipped on mid-wave resume);
        # recover the counts from the committed parquet. fetched was dropped
        # before the write, but for crawled rows fetched <=> content_type
        # is non-null (fetch_join nulls every response column on failure).
        lo = spark.read.parquet(table_paths["links_out"])
        n_scheduled = lo.filter(F.col("crawled")).count()
        fetch_ok = lo.filter(F.col("crawled") & F.col("content_type").isNotNull()).count()
        new_rejected_n = lo.filter(~F.col("crawled")).count()
    else:
        n_scheduled = int(obs_links.get["scheduled"])
        fetch_ok = int(obs_links.get["fetch_ok"])
        new_rejected_n = int(obs_links.get["rejected"])
    if "frontier" in skipped:
        new_frontier_n = spark.read.parquet(table_paths["frontier"]).count()
    else:
        new_frontier_n = int(obs_frontier.get["n"])

    counts = {
        "frontier_in": frontier_in,
        "scheduled": n_scheduled,
        "fetched": fetch_ok,
        "fetch_failed": n_scheduled - fetch_ok,
        "extracted_links": extracted,
        "new_frontier": new_frontier_n,
        "new_rejected": new_rejected_n,
    }
    wh.commit_wave(
        wave, table_paths, counts, host_lineage, time.time() - t0, bloom, timings,
        sharded=cfg.seen_probe_mode() == "sharded",
    )
    try:
        _os.remove(staging_path)  # the wave is committed; the sidecar is spent
    except OSError:
        pass
    scheduled.unpersist()
    if cfg.fetch_mode == "http":
        # matched is localCheckpoint()ed (not cached): DataFrame.unpersist
        # only clears CacheManager entries, so the checkpoint blocks (full
        # fetch output, html included) would otherwise pile up across waves
        # until the driver GC happens to collect the RDD reference
        _release_local_checkpoint(matched)
    else:
        matched.unpersist()
    fetched.unpersist()
    children.unpersist()
    deduped.unpersist()
    newly_rejected.unpersist()
    return counts


def _release_local_checkpoint(df) -> None:
    """Free the storage behind a localCheckpoint()ed frame NOW instead of at
    driver GC: the blocks belong to the LogicalRDD under the analyzed plan,
    which plain unpersist() never touches. Best-effort by design — a plan
    shape we don't recognize just falls back to the GC path."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
