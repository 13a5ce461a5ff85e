"""Fetch simulation: frontier ⋈ pages equi-join.

Replaces the reference's HTTP GET (src/crawler.rs:310-316) per the survey's
design: a frontier URL *present* in the corpus is a successful fetch; an
absent URL is a fetch failure, which the reference still marks crawled and
emits with no metadata and no extraction (crawler.rs:209-216).

Scale notes:
* the join key is the canonical URL string; both sides can be pre-bucketed by
  ``pmod(xxhash64(url), n_buckets)`` so repeated waves shuffle only the
  (small) frontier side — at 10^10 URLs the pages side is the 100 TB table
  and must never be re-shuffled per wave. AQE skew-join covers hot-host skew.
* only ``url, html, text`` are read from the corpus (column pruning reaches
  the parquet scan; verified in tests via the explain plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import host_udf


FETCH_MS_MOD = 10**15 - 11  # same field as textstats.FINGERPRINT_MOD


def synth_fetch_ms(url: Column) -> Column:
    """Deterministic synthetic fetch latency in ms, 0..19999 (stands in for
    the reference's per-request wall time; its 10 s default timeout is
    cli.rs:34-35 applied at crawler.rs:14-20). Pure Catalyst AND exactly
    SQL-expressible (no xxhash64 — DuckDB lacks it): the rolling polynomial
    hash of textstats.fingerprints over the url chars, then a square-and-mod
    mix — the raw rolling hash has NO avalanche (urls sharing a prefix land
    in one contiguous block, so whole url families would share a timeout
    fate); squaring makes neighbors jump ~2m apart mod a prime. All
    intermediates < 2^63, engine-identical integer math."""
    chars = F.filter(F.split(url, ""), lambda c: c != "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FETCH_MS_MOD,
    )
    m = F.pmod(fp, F.lit(1_000_003))
    return F.pmod(m * m, F.lit(19_997))


def synth_ipv4(host: Column) -> Column:
    """Deterministic synthetic A record (stands in for links.rs:309-320).

    For synthetic hosts ``host{d}.example``: 10.0.{d/256}.{d%256}; other
    hosts resolve to NULL. Pure Catalyst expression (and SQL-expressible for
    the DuckDB oracle)."""
    d = F.regexp_extract(host, r"^host(\d+)\.example$", 1)
    di = F.when(d != "", d.cast("int"))
    return F.when(
        di.isNotNull(),
        F.concat(F.lit("10.0."), (di / 256).cast("int").cast("string"), F.lit("."), (di % 256).cast("string")),
    )


def synth_ipv6(host: Column) -> Column:
    """Deterministic synthetic AAAA record (stands in for links.rs:323-334)."""
    d = F.regexp_extract(host, r"^host(\d+)\.example$", 1)
    di = F.when(d != "", d.cast("int"))
    return F.when(di.isNotNull(), F.concat(F.lit("fd00::"), F.lower(F.hex(di))))


def fetch_matched(
    frontier: DataFrame, pages: DataFrame, frontier_rows: int | None = None
) -> DataFrame:
    """The ONE corpus scan of a wave: pages inner-probed by a BROADCAST of
    the (politeness-bounded) frontier. Pages is only scanned, never shuffled;
    the hit set (<= |frontier| rows) is then re-shuffled by url_hash so that
    AQE sizes its partitions by bytes — downstream consumers (extraction /
    text UDFs, caching) never inherit the corpus scan's partitioning.

    ``frontier_rows`` (the previous wave's manifest ``new_frontier`` count)
    gates the broadcast: above BROADCAST_MAX_ROWS an unbudgeted wave's
    out-degree would OOM the driver, so the probe falls back to a
    shuffle-hash join with the frontier as build side — in the full-scale
    layout pages is bucketed by url at rest (Iceberg bucket transform), so
    only the frontier moves; the corpus is still never re-shuffled wave
    over wave.
    """
    from ..config import small_enough_to_broadcast

    pages_side = pages.select(
        F.col("url").alias("p_url"),
        F.col("html"),
        F.col("text").alias("page_text"),
    )
    if small_enough_to_broadcast(frontier_rows):
        bf = F.broadcast(frontier)
        matched = pages_side.join(bf, bf["url"] == pages_side["p_url"], "inner")
    else:
        bf = frontier.hint("shuffle_hash")
        matched = pages_side.join(bf, frontier["url"] == pages_side["p_url"], "inner")
    return matched.repartition(F.col("url_hash"))


def fetch_join(
    frontier: DataFrame,
    pages: DataFrame,
    content_type_expr=None,
    matched: DataFrame | None = None,
    timeout_ms: int | None = None,
    frontier_rows: int | None = None,
) -> DataFrame:
    """Simulated fetch of every frontier URL.

    Returns one row per frontier URL with columns::

        url, url_hash, host, priority, fetched(bool), content_type, headers,
        ipv4, ipv6, html, page_text

    * ``fetched`` false => fetch failure: content_type/headers/ipv4/ipv6/html
      are NULL (reference crawler.rs:209-216 emits the bare link);
    * on success, content_type is derived from the url by
      ``content_type_expr`` (simulation rule, FIXTURES.md §1), headers is the
      simulated response header map, DNS columns are synthetic
      (crawler.rs:219-224);
    * ``timeout_ms`` (op 27): a matched row whose synthetic latency
      ``synth_fetch_ms(url)`` is >= timeout_ms is ALSO a fetch failure —
      the reference's per-client request timeout (10 s default). None (the
      default) disables the gate: success == corpus membership.

    ``matched`` lets the caller pass a CACHED ``fetch_matched`` result so the
    corpus is scanned exactly once per wave (every broadcast-exchange subplan
    below would otherwise rebuild the probe join and rescan pages).
    """
    if content_type_expr is None:
        from ..sources.corpus import default_content_type_expr

        content_type_expr = default_content_type_expr

    # Join strategy for 100 TB: a plain left join (frontier ⋈ pages) would
    # shuffle the ENTIRE corpus every wave. Instead the (politeness-bounded)
    # frontier is broadcast into an inner probe of the corpus scan — pages is
    # only scanned, never shuffled — and fetch failures are recovered with a
    # second broadcast anti-join against the (small) matched-url set.
    from ..config import small_enough_to_broadcast

    if matched is None:
        matched = fetch_matched(frontier, pages, frontier_rows=frontier_rows)
    matched_urls = matched.select(F.col("p_url").alias("url"))
    if small_enough_to_broadcast(frontier_rows):  # |matched| <= |frontier|
        matched_urls = F.broadcast(matched_urls)
    failed = frontier.join(matched_urls, "url", "left_anti").select(
        "url", "url_hash", "host", "priority",
        F.lit(None).cast("string").alias("p_url"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("page_text"),
    )
    joined = matched.select(
        "url", "url_hash", "host", "priority", "p_url", "html", "page_text"
    ).unionByName(failed)
    fetched = F.col("p_url").isNotNull()
    if timeout_ms is not None:
        # timed-out rows keep their frontier identity but lose the response
        # (body never read, crawler.rs:209-216) — same shape as a miss
        fetched = fetched & (synth_fetch_ms(F.col("url")) < F.lit(timeout_ms))
        joined = joined.select(
            "url", "url_hash", "host", "priority", "p_url",
            F.when(fetched, F.col("html")).alias("html"),
            F.when(fetched, F.col("page_text")).alias("page_text"),
        )
    ct = F.when(fetched, content_type_expr(F.col("url")))
    headers = F.when(
        fetched,
        F.create_map(
            F.lit("content-type"), content_type_expr(F.col("url")),
            F.lit("content-length"), F.length(F.col("html")).cast("string"),
        ),
    )
    host = F.col("host")
    return joined.select(
        F.col("url"),
        F.col("url_hash"),
        host,
        F.col("priority"),
        fetched.alias("fetched"),
        ct.alias("content_type"),
        headers.alias("headers"),
        F.when(fetched, synth_ipv4(host)).alias("ipv4"),
        F.when(fetched, synth_ipv6(host)).alias("ipv6"),
        F.col("html"),
        F.col("page_text"),
    )


def with_url_hash(df: DataFrame, url_col: str = "url") -> DataFrame:
    """64-bit URL hash, JVM-side (xxhash64) — join/bucket/bloom key."""
    return df.withColumn("url_hash", F.xxhash64(F.col(url_col)))


def host_expr(url: Column) -> Column:
    """Host of a CANONICAL url as a pure Catalyst expression (JVM-side; the
    python twin urlnorm.host_of is used only by the oracle and tests).

    Only WHATWG special schemes carry a host; canonical urls already have
    lowercase hosts, so two regexes suffice: authority capture, then
    userinfo/port strip (ipv6 literals keep their brackets).
    """
    auth = F.regexp_extract(url, r"^(?:https?|ftp|wss?|file)://([^/?#]*)", 1)
    host = F.regexp_extract(auth, r"^(?:[^@]*@)?(\[[^\]]*\]|[^:]*)", 1)
    return F.when(host != "", host)


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Host column, JVM-side (no python stage in the routing hot path)."""
    return df.withColumn("host", host_expr(F.col(url_col)))
