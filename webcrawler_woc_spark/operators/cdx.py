"""CDX-style URL capture index — the web-archive index layout (Common Crawl's
CDXJ, OpenWayback CDX) re-expressed as range-partitioned parquet.

A CDX index answers "every capture under this URL/domain prefix (optionally
in this time window)" without scanning the archive: rows are keyed by
(SURT, timestamp) and kept SORTED at rest, so a prefix query is a contiguous
key range. The reference crawler keeps its URL set in RAM
(`/root/reference/src/crawler.rs:43-45` HashSet) — no at-rest index at all;
at 10^11 captures the sorted range layout is the standard answer.

Layout contract (mirrors write_inverted_index's bucket layout, but RANGES
instead of hash buckets — prefix queries need contiguous key spans):

* rows are ``repartitionByRange(n_ranges)`` on (surt, epoch) and sorted
  within each range file, so every file holds one contiguous SURT span and
  row-group stats prune within it;
* each range directory is ``range_id=K`` (spark_partition_id AFTER the
  range shuffle — deterministic: RangePartitioner orders its bounds);
* a tiny meta JSON (written last, the commit marker) records each range's
  [min_surt, max_surt], so the READER maps a prefix to the intersecting
  ranges driver-side — ``range_id IN (...)`` is a STATIC partition filter
  (file listing never touches other directories), and the residual
  startswith/epoch filters push into the pruned scan.

Scale shape: the write is one range shuffle (the sort a 100 TB index needs
anyway); n_ranges sizes files to executor memory (thousands at CC scale).
A lookup reads only intersecting ranges — O(result + one range span),
independent of index size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_woc_spark.functions.surt import surt_key

CDX_META = "_cdx_meta.json"


def build_cdx(captures: DataFrame) -> DataFrame:
    """(url, capture_ts[, ...]) -> (surt, epoch, url) index rows.
    Non-hierarchical URLs (no host => no SURT) are dropped — they are not
    addressable by prefix and a NULL sort key would poison range bounds."""
    return (
        captures.select(
            surt_key(F.col("url")).alias("surt"),
            F.col("capture_ts").cast("long").alias("epoch"),
            "url",
        )
        .filter(F.col("surt").isNotNull())
    )


def write_cdx(cdx: DataFrame, path: str, n_ranges: int = 16) -> None:
    """Persist CDX rows range-partitioned by (surt, epoch), sorted within
    each range, with per-range SURT bounds in the meta sidecar."""
    ranged = (
        cdx.repartitionByRange(n_ranges, "surt", "epoch")
        .withColumn("range_id", F.spark_partition_id())
        # leading range_id (constant per task) makes the ordering satisfy the
        # dynamic-partition write's required ordering, so FileFormatWriter
        # does NOT insert its own (unstable) sort and the (surt, epoch)
        # within-file order survives to disk
        .sortWithinPartitions("range_id", "surt", "epoch")
    )
    ranged.write.mode("overwrite").partitionBy("range_id").parquet(path)
    bounds = (
        # bounds from the WRITTEN files (column-pruned scan of surt only),
        # not from `ranged` — recomputing it would be a second full range
        # shuffle of the input at 100 TB
        ranged.sparkSession.read.parquet(path)
        .groupBy("range_id")
        .agg(F.min("surt").alias("lo"), F.max("surt").alias("hi"))
        .collect()  # n_ranges rows — driver-tiny by construction
    )
    with open(os.path.join(path, CDX_META), "w") as fh:
        json.dump(
            {
                "n_ranges": n_ranges,
                "bounds": sorted((r.range_id, r.lo, r.hi) for r in bounds),
            },
            fh,
        )


def _select_ranges(meta: dict, surt_prefix: str) -> list[int]:
    """Range ids whose [lo, hi] span can contain a key starting with the
    prefix: keys with prefix p live in [p, p + U+FFFF), so a range overlaps
    iff hi >= p and lo < p + U+FFFF. Pure driver-side string compares."""
    hi_bound = surt_prefix + "\uffff"
    return [
        rid
        for rid, lo, hi in meta["bounds"]
        if hi >= surt_prefix and lo <= hi_bound
    ]


def lookup_cdx(
    spark,
    path: str,
    surt_prefix: str,
    epoch_min: int | None = None,
    epoch_max: int | None = None,
) -> DataFrame:
    """Captures under a SURT prefix (optionally within [epoch_min,
    epoch_max]): static range_id partition filter from the meta bounds +
    pushed startswith/epoch scan filters. Reads ONLY intersecting range
    directories (pinned by the pruning test)."""
    with open(os.path.join(path, CDX_META)) as fh:
        meta = json.load(fh)
    ranges = _select_ranges(meta, surt_prefix)
    if not ranges:
        empty = spark.createDataFrame([], "surt string, epoch bigint, url string")
        return empty
    out = (
        spark.read.parquet(path)
        .filter(F.col("range_id").isin(ranges) & F.col("surt").startswith(surt_prefix))
        .drop("range_id")
    )
    if epoch_min is not None:
        out = out.filter(F.col("epoch") >= epoch_min)
    if epoch_max is not None:
        out = out.filter(F.col("epoch") <= epoch_max)
    return out


def asof_cdx(spark, path: str, urls: list[str], epoch_at: int) -> DataFrame:
    """Wayback-style point lookup: for each queried URL, the LATEST capture
    at or before ``epoch_at`` ("show me the page as of T"). The query set is
    a driver-side list (the read_postings contract — point lookups are
    driver-known by nature); each URL's SURT key selects its containing
    range(s) from the meta bounds, so the scan unions only those
    directories and pushes ``surt IN (...) AND epoch <= T`` into it.

    Output: (surt, url, epoch) — one row per queried URL that has any
    capture <= T (earlier-capture-less URLs are absent, the Wayback 404).
    The reduction is one partial-agg'd groupBy(surt) max(struct(epoch,
    url)): order-independent, no window.

    Scale shape: k point lookups read at most k range directories out of
    n_ranges; the agg input is bounded by those ranges' row counts, not
    the index."""
    with open(os.path.join(path, CDX_META)) as fh:
        meta = json.load(fh)
    keys = [k for k in (_surt_of(u) for u in urls) if k is not None]
    ranges = sorted({rid for k in keys for rid in _select_ranges(meta, k)})
    if not ranges or not keys:
        return spark.createDataFrame([], "surt string, url string, epoch bigint")
    hits = (
        spark.read.parquet(path)
        .filter(
            F.col("range_id").isin(ranges)
            & F.col("surt").isin(keys)
            & (F.col("epoch") <= epoch_at)
        )
    )
    latest = F.max(F.struct("epoch", "url")).alias("_m")
    return (
        hits.groupBy("surt")
        .agg(latest)
        .select("surt", F.col("_m.url").alias("url"), F.col("_m.epoch").alias("epoch"))
    )


def _surt_of(url: str) -> str | None:
    """Driver-side twin of functions.surt.surt_key (same regex semantics)."""
    import re

    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", url)
    if not m:
        return None
    host = m.group(1)
    rev = ",".join(reversed(host.split(".")))
    rest = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "", url)
    return rev + ")" + (rest if rest else "/")
