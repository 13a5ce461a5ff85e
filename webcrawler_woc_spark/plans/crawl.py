"""Crawl drivers: depth-bounded and run-to-exhaustion BFS loops + resume.

Maps the reference entry points (SURVEY.md §3):
* ``crawl_with_depth``  (src/crawler.rs:32-109)  -> ``crawl(depth=N)``,
  including the residual-frontier flush (crawler.rs:102-108) which emits
  leftover frontier URLs as uncrawled links BYPASSING the rejected dedup;
* ``crawl_no_depth``    (src/crawler.rs:113-195) -> ``crawl(depth=None)``,
  sitemap seeding on the first wave only, loop until the frontier empties.

Resume: the warehouse manifest records the last committed wave; ``crawl``
called on an existing warehouse continues from there (kill/resume test in
tests/test_resume.py). Per the north rule every wave commit carries counts,
per-host lineage and the Bloom sidecar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..operators.fetch import with_host, with_url_hash
from ..operators.politeness import parse_robots_crawl_delay
from ..operators.sitemaps import sitemap_children
from .state import Warehouse
from .wave import run_wave



def _load_seen_filter(wh: Warehouse, cfg: CrawlConfig):
    """Load the seen-filter sidecar, REFUSING a kind mismatch: resuming a
    cuckoo-written warehouse with --seen-filter bloom (or vice versa) would
    feed the wrong object into the wave's update path and crash mid-wave
    AFTER the table writes — fail fast with an actionable message instead.
    A fresh warehouse (no sidecar yet) loads None and the requested kind is
    built on the first wave."""
    kind = cfg.seen_filter_kind()
    if kind is None:
        return None
    side = wh.load_seen_filter()
    side_kind = getattr(side, "kind", "bloom") if side is not None else None
    if side is not None and side_kind != kind:
        raise ValueError(
            f"warehouse sidecar was written by the {side_kind!r} seen filter but "
            f"this run requests {kind!r}; resume with the matching --seen-filter "
            "(switching kinds mid-crawl requires rebuilding the sidecar)"
        )
    return side


def seed_frontier(
    spark: SparkSession, wh: Warehouse, seeds: list[tuple[str, float]],
    strip_tracking: bool = False,
) -> DataFrame:
    """Wave-0 frontier from parsed seed URLs (reference cli.rs:114-117:
    unparsable seeds abort; here they are dropped with the same effect of
    never being crawled). ``strip_tracking`` applies the same tracking-param
    canonicalization the waves apply to extracted children — the seed must
    live in the same URL space as the seen set it founds."""
    from ..functions.urlnorm import parse_absolute, strip_tracking_params

    rows = []
    for raw, priority in seeds:
        canon = parse_absolute(raw)
        if canon is not None:
            if strip_tracking:
                canon = strip_tracking_params(canon)
            rows.append((0, canon, float(priority)))
    df = spark.createDataFrame(rows, "wave int, url string, priority double")
    df = with_host(with_url_hash(df)).select("wave", "url", "url_hash", "host", "priority")
    wh.write_wave_table("frontier", 0, df, bucket=True)
    return df


def crawl(
    spark: SparkSession,
    wh: Warehouse,
    pages: DataFrame,
    seeds: list[tuple[str, float]],
    cfg: CrawlConfig,
    content_type_expr=None,
) -> dict:
    """Run (or resume) a crawl; returns summary counts."""
    start_wave = wh.last_wave + 1
    if start_wave == 0:
        seed_frontier(spark, wh, seeds, strip_tracking=cfg.strip_tracking)

    robots = None
    if cfg.host_budget is not None:
        robots = parse_robots_crawl_delay(pages).cache()
    disallow = None
    if cfg.respect_disallow:
        from ..operators.politeness import parse_robots_disallow

        disallow = parse_robots_disallow(pages).cache()

    bloom = _load_seen_filter(wh, cfg)
    seed_urls = [u for u, _ in seeds]

    # Mid-wave-resume identity: cfg alone doesn't pin a wave's outputs — the
    # same cfg with a different seed list or --pages corpus produces different
    # tables, and a resumed wave must not mix them. Fingerprint the seeds and
    # the corpus' input files (file-based sources list them deterministically;
    # an in-memory corpus contributes its empty list plus the seeds, which
    # still catches the seed-swap case) and thread it into the staging sidecar.
    import hashlib as _hashlib
    import json as _json

    input_fp = _hashlib.sha256(
        _json.dumps([sorted(pages.inputFiles()), sorted(map(list, seeds))]).encode()
    ).hexdigest()

    summary = {"waves": 0, "scheduled_total": 0}
    if cfg.depth is not None:
        last = -1
        for wave in range(start_wave, cfg.depth):
            # depth mode never consults sitemaps (crawler.rs:30-31)
            counts = run_wave(
                spark, wh, pages, wave, cfg, bloom, robots, None, content_type_expr,
                disallow, input_fp=input_fp,
            )
            bloom = _load_seen_filter(wh, cfg)
            summary["waves"] += 1
            summary["scheduled_total"] += counts["scheduled"]
            last = wave
        # residual flush (crawler.rs:102-108): leftover frontier emitted as
        # fresh uncrawled links, bypassing the rejected dedup.
        final_wave = cfg.depth
        residual = wh.read_frontier(final_wave)
        if residual is not None:
            _flush_residual(wh, residual, final_wave)
    else:
        wave = start_wave
        while wave < cfg.max_waves:
            frontier = wh.read_frontier(wave)
            if frontier is None or frontier.limit(1).count() == 0:
                break
            extra = (
                sitemap_children(
                    spark, pages, seed_urls,
                    xml=cfg.sitemap_xml, content_type_expr=content_type_expr,
                )
                if wave == 0
                else None
            )
            counts = run_wave(
                spark, wh, pages, wave, cfg, bloom, robots, extra, content_type_expr,
                disallow, input_fp=input_fp,
            )
            bloom = _load_seen_filter(wh, cfg)
            summary["waves"] += 1
            summary["scheduled_total"] += counts["scheduled"]
            wave += 1
    return summary


def _flush_residual(wh: Warehouse, residual: DataFrame, final_wave: int) -> None:
    """Emit leftover frontier as crawled=false links (op 19)."""
    from ..functions.udfs import link_type_col

    from pyspark.sql import Observation

    flush = residual.select(
        F.col("url"),
        F.col("url_hash"),
        F.col("host"),
        F.lit(None).cast("string").alias("content_type"),
        F.lit(None).cast("map<string,string>").alias("headers"),
        F.lit(False).alias("crawled"),
        F.lit(None).cast("string").alias("ipv4"),
        F.lit(None).cast("string").alias("ipv6"),
        link_type_col(F.col("url")).alias("link_type"),
        F.lit(False).alias("contains_words"),
    )
    # the count rides the write as an observation — the previous read-back
    # count() was a whole extra job per crawl (guide §1.5 zero-extra-jobs
    # metrics, same pattern as run_wave's links_out counts)
    obs = Observation(f"residual_flush_w{final_wave}")
    flush = flush.observe(obs, F.count(F.lit(1)).alias("n"))
    path = wh.write_wave_table("links_out", final_wave, flush)
    n = int(obs.get["n"])
    wh.manifest["waves"][str(final_wave)] = {
        "tables": {"links_out": path},
        "counts": {"residual_flush": n},
        "host_lineage": [],
        "wall_sec": 0.0,
        # the flush adds no new URLs: carry the previous wave's seen-filter
        # sidecar forward, kind included (a cuckoo path loaded as a bloom
        # would fail on the meta shape)
        "bloom": wh.manifest["waves"].get(str(final_wave - 1), {}).get("bloom"),
        "sidecar_kind": wh.manifest["waves"].get(str(final_wave - 1), {}).get("sidecar_kind"),
        "sharded_dir": wh.manifest["waves"].get(str(final_wave - 1), {}).get("sharded_dir"),
    }
    wh.manifest["last_wave"] = final_wave
    wh._commit_manifest()


def read_links_out(wh: Warehouse) -> DataFrame | None:
    """All emitted links across waves (the four JSON files' content,
    partitioned by (link_type, crawled) at rest)."""
    return wh.read_waves("links_out")


def read_seen(wh: Warehouse) -> DataFrame | None:
    return wh.read_waves("seen")


def read_crawl_order(wh: Warehouse) -> DataFrame | None:
    return wh.read_waves("crawl_order")
