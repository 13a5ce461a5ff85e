"""Seen/rejected routing — the reference's channel-drain loop
(src/crawler.rs:82-99) as set algebra over DataFrames.

Deterministic batch semantics (SURVEY.md §7): the reference's within-wave
routing order is tokio-completion-order nondeterministic (a child observed
before its parent's self-record can slip into the next frontier and cause a
refetch). We pin the race-free interpretation: all wave-w fetches enter the
seen set *before* wave-w children are routed. The Python oracle implements
the identical rule, so crawl order and seen-set are well-defined.

Scale notes:
* the wave-level dedup + anti-joins shuffle ONLY the freshly-extracted links
  (bounded by wave out-degree), never the cumulative seen set when the
  Bloom prefilter (operators/bloom.py) is on — the exact anti-join then runs
  against the small maybe-seen remainder.
* seen/rejected tables are bucketed by pmod(url_hash, n_buckets) so the
  anti-join co-partitions wave over wave.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def should_crawl_col(
    host: Column,
    whitelist: list[str] | None,
    blacklist: list[str] | None,
) -> Column:
    """The reference's should_crawl policy (links.rs:122-143), exactly:

    * whitelist present -> host ∈ whitelist (NULL host -> false);
    * else blacklist present -> host ∉ blacklist (NULL host -> false);
    * NEITHER list -> constant false (links.rs:133 quirk: only the seed is
      ever fetched).

    Lists are shipped as literals (they are small host lists; for huge lists
    swap in a broadcast join — semantics unchanged).
    """
    if whitelist is not None:
        if not whitelist:
            return F.lit(False)
        return F.coalesce(host.isin(*whitelist), F.lit(False))
    if blacklist is not None:
        if not blacklist:
            return host.isNotNull()  # empty blacklist: host present => true
        return F.when(host.isNull(), F.lit(False)).otherwise(~host.isin(*blacklist))
    return F.lit(False)


def anti_join_scan(
    small: DataFrame, big: DataFrame, keys: list[str], small_rows: int | None = None
) -> DataFrame:
    """small LEFT ANTI big without ever shuffling ``big``.

    A plain left-anti join hash-partitions BOTH sides; when ``big`` is the
    cumulative seen set (10^10 rows at design scale) that shuffle dominates
    the wave. Instead: (1) semi-join big against a BROADCAST of small's keys
    (big is only scanned, stream-side of a broadcast hash join), producing
    ``hits`` (<= |small|); (2) small anti-joins the broadcast hits.
    Semantics identical to left-anti; big moves zero bytes over the network.

    ``small_rows`` gates the broadcast: past BROADCAST_MAX_ROWS (an
    unbudgeted wave with huge out-degree) broadcasting ``small`` would OOM,
    so fall back to the plain shuffled left-anti — in the full-scale layout
    the seen table is bucketed by pmod(url_hash, n_buckets) at rest (see
    module docstring), so a storage-partitioned join moves only ``small``;
    the in-sandbox fallback shuffles both sides, which is slower but safe.
    """
    from ..config import small_enough_to_broadcast

    if not small_enough_to_broadcast(small_rows):
        return small.join(big.select(*keys), keys, "left_anti")
    hits = big.select(*keys).join(F.broadcast(small.select(*keys)), keys, "left_semi")
    return small.join(F.broadcast(hits), keys, "left_anti")


def dedup_wave(children: DataFrame) -> DataFrame:
    """Wave-level dedup by canonical URL (the reference's HashSet inserts).

    Keeps an arbitrary-but-deterministic row per url via min aggregation —
    (url, link_type) is functionally dependent on url, so min() is exact.
    """
    return children.groupBy("url").agg(F.min("link_type").alias("link_type"))


def route_children(
    children: DataFrame,
    seen: DataFrame,
    rejected: DataFrame,
    whitelist: list[str] | None,
    blacklist: list[str] | None,
    children_rows: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Route deduped children (url, url_hash, host, link_type) into
    (next_frontier_candidates, newly_rejected).

    * crawl-worthy and never crawled  -> next frontier (crawler.rs:90-91);
    * not crawl-worthy and not yet rejected -> rejected, emitted once
      (crawler.rs:92-96);
    * crawl-worthy but already seen -> silently dropped (crawler.rs:90).

    Anti-joins run on url_hash (cheap 8-byte shuffle key) then confirm on the
    full url — hash collisions cannot drop a truly-new URL.
    """
    sc = should_crawl_col(F.col("host"), whitelist, blacklist)
    tagged = children.withColumn("should_crawl", sc)

    crawlable = tagged.filter(F.col("should_crawl"))
    uncrawlable = tagged.filter(~F.col("should_crawl"))

    next_frontier = anti_join_scan(crawlable, seen, ["url_hash", "url"], small_rows=children_rows)
    newly_rejected = anti_join_scan(
        uncrawlable, rejected, ["url_hash", "url"], small_rows=children_rows
    )
    return next_frontier, newly_rejected
