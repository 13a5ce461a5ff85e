"""Re-crawl scheduling over multi-capture page histories.

A production crawl sees the same URL many times (Common-Crawl keeps one
capture per snapshot); the engine needs three shapes the reference's
single-shot crawler (`/root/reference/src/crawler.rs:32-109` crawls each URL
exactly once) never had to solve:

* **capture history** — explode a per-URL capture count into one row per
  (url, capture_no) with a deterministic capture timestamp;
* **latest-capture compaction** — "keep the newest snapshot per key", the
  CDC/as-of dedup every warehouse ingest runs. One window `row_number()=1`
  per key: a single hash-partition shuffle on the key, no driver state —
  at 10^10 captures this is the same plan Spark would pick for any CDC
  MERGE source dedup (AQE splits skewed hot URLs);
* **recrawl scheduling** — age-prioritized per-host re-fetch selection under
  a politeness budget: stale URLs ranked oldest-first within each host,
  top-k per host. Window over `host` (bounded partitions: budget caps the
  output, AQE handles hot hosts), never a global sort.

All arithmetic is integer (epoch seconds), so the DuckDB oracle twin is
value-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DAY_SEC = 86400


def explode_captures(pages: DataFrame, n_captures: Column) -> DataFrame:
    """pages(url, warc_ts, ...) -> one row per capture: (url, capture_no,
    capture_epoch). Capture c is taken c days after the base snapshot
    (deterministic synthetic history; a real archive would supply these
    rows directly). Epoch bigints throughout — timezone-proof."""
    base_epoch = F.unix_timestamp(F.col("warc_ts"))
    # guard: sequence(0, -1) would generate a DESCENDING [0, -1] — a
    # zero-capture URL must emit no rows, not two fabricated ones
    n = n_captures.cast("int")
    caps = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.expr("CAST(array() AS array<int>)")
    )
    return pages.select(
        "url",
        base_epoch.alias("base_epoch"),
        F.explode(caps).alias("capture_no"),
    ).select(
        "url",
        "capture_no",
        (F.col("base_epoch") + F.col("capture_no").cast("bigint") * DAY_SEC).alias(
            "capture_epoch"
        ),
    )


def latest_captures(captures: DataFrame) -> DataFrame:
    """Latest-snapshot-per-URL compaction: (url, n_captures, latest_epoch).

    The canonical "argmax per key" plan: one window over the key. Ordering
    carries a full tiebreak (epoch DESC, capture_no DESC) so the survivor is
    engine-deterministic even on equal timestamps."""
    w = Window.partitionBy("url")
    ranked = captures.select(
        "url",
        "capture_epoch",
        F.row_number()
        .over(w.orderBy(F.col("capture_epoch").desc(), F.col("capture_no").desc()))
        .alias("rn"),
        F.count("*").over(w).alias("n_captures"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "url", F.col("n_captures").cast("int").alias("n_captures"),
        F.col("capture_epoch").alias("latest_epoch"),
    )


def recrawl_schedule(
    latest: DataFrame,
    host: Column,
    now_epoch: int,
    min_age_sec: int,
    per_host_budget: int,
) -> DataFrame:
    """Select stale URLs for re-crawl: age >= min_age_sec, ranked oldest-first
    per host, at most ``per_host_budget`` per host (politeness cap). Output
    (host, url, age_sec, slot) with slot = 0-based per-host rank.

    Scale shape: filter pushes to the scan; the window partitions by host and
    the budget bounds every partition's output, so the job is one shuffle on
    host regardless of corpus size."""
    aged = latest.select(
        host.alias("host"),
        "url",
        (F.lit(now_epoch).cast("bigint") - F.col("latest_epoch")).alias("age_sec"),
    ).filter(F.col("age_sec") >= min_age_sec)
    w = Window.partitionBy("host").orderBy(F.col("age_sec").desc(), F.col("url").asc())
    return (
        aged.withColumn("slot", (F.row_number().over(w) - 1).cast("int"))
        .filter(F.col("slot") < per_host_budget)
        .select("host", "url", "age_sec", "slot")
    )


def adaptive_recrawl_budgets(
    diff: DataFrame, host: Column, budget_total: int
) -> DataFrame:
    """ADAPTIVE recrawl (the Cho & Garcia-Molina insight: refresh frequency
    should track OBSERVED change rate, not uniform age): allocate a global
    re-fetch budget across hosts proportionally to how many of their URLs
    the latest snapshot diff saw change.

    Input: a snapshot_diff status frame (url/status). Output per host:
    (host, n_urls, n_changed, change_ppm, host_budget) where
    ``host_budget = max(1, (budget_total * n_changed) div total_changed)``
    for hosts with changes, 0 otherwise — all-integer, truncating,
    documented (no largest-remainder rebalance; the +1 floor means totals
    may exceed budget_total by at most #changed-hosts, the usual tolerance).

    Shape: one partial-agg'd groupBy on host + a 1-row total broadcast into
    the allocation projection — no second shuffle. The change signal is the
    feedback loop closing recrawl_schedule's age-only prioritization."""
    per_host = diff.groupBy(host.alias("host")).agg(
        F.count("*").cast("int").alias("n_urls"),
        F.sum((F.col("status") == "changed").cast("int")).cast("int").alias("n_changed"),
    )
    total = per_host.agg(
        F.sum("n_changed").cast("bigint").alias("total_changed")
    )
    alloc = per_host.crossJoin(F.broadcast(total))
    # BIGINT multiplies: n_changed * 1000000 overflows INT32 at >= 2148
    # changed URLs per host (an ANSI-mode crash, not a wrap) — routine at
    # crawl scale; the oracle casts identically
    budget = F.when(
        F.col("n_changed") > 0,
        F.greatest(
            F.lit(1),
            F.expr(
                f"CAST(({budget_total} * CAST(n_changed AS BIGINT))"
                " div total_changed AS INT)"
            ),
        ),
    ).otherwise(F.lit(0))
    return alloc.select(
        "host",
        "n_urls",
        "n_changed",
        F.expr(
            "CAST(CAST(n_changed AS BIGINT) * 1000000 div n_urls AS BIGINT)"
        ).alias("change_ppm"),
        budget.cast("int").alias("host_budget"),
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str = "url") -> DataFrame:
    """Incremental-crawl delta between two corpus snapshots, compared by a
    per-key content fingerprint: (key, status) with status in
    {added, gone, changed, unchanged}.

    Inputs are (key, fp) frames — fp any stable content hash (the engine
    uses textstats' rolling poly fingerprint, computed scan-side so the join
    ships 16 bytes per row, never the documents). One FULL OUTER hash join
    on the key: co-partitioned with the engine's url_hash bucketing at
    scale, and the only operator class (full outer) the wave path itself
    never needs — recrawl planning does."""
    o = old.select(F.col(key).alias(key), F.col("fp").alias("fp_old"))
    n = new.select(F.col(key).alias(key), F.col("fp").alias("fp_new"))
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), "added")
        .when(F.col("fp_new").isNull(), "gone")
        .when(F.col("fp_old") != F.col("fp_new"), "changed")
        .otherwise("unchanged")
    )
    return j.select(key, status.alias("status"))


def merge_upsert(current: DataFrame, updates: DataFrame, key: str = "url") -> DataFrame:
    """Warehouse MERGE INTO semantics over a latest-capture table — the
    exact operation the engine would issue against a real Iceberg table
    (``MERGE INTO current USING updates ON key WHEN MATCHED AND newer THEN
    UPDATE WHEN NOT MATCHED THEN INSERT``), expressed engine-neutrally as
    one FULL OUTER join so the parquet warehouse and an Iceberg deployment
    share the semantics:

    * update row with no current row            -> op 'insert';
    * update strictly newer than current (ts)   -> op 'update';
    * update present but not newer              -> op 'keep' (current wins);
    * current row with no update                -> op 'keep'.

    Input frames carry (key, ts); output (key, op, ts) where ts is the
    SURVIVING timestamp. One hash shuffle on the merge key (co-partitioned
    with the url_hash bucketing at rest); ties favor current — re-observing
    an identical capture is not an update."""
    c = current.select(F.col(key).alias("k"), F.col("ts").alias("c_ts"))
    u = updates.select(F.col(key).alias("uk"), F.col("ts").alias("u_ts"))
    j = c.join(u, c["k"] == u["uk"], "full_outer")
    op = (
        F.when(F.col("k").isNull(), F.lit("insert"))
        .when(F.col("uk").isNull(), F.lit("keep"))
        .when(F.col("u_ts") > F.col("c_ts"), F.lit("update"))
        .otherwise(F.lit("keep"))
    )
    surviving = F.when(op.isin("insert", "update"), F.col("u_ts")).otherwise(F.col("c_ts"))
    return j.select(
        F.coalesce(F.col("k"), F.col("uk")).alias(key),
        op.alias("op"),
        surviving.alias("ts"),
    )


def digest_dedup(captures: DataFrame) -> DataFrame:
    """Content-digest dedup across captures, keep-EARLIEST semantics — the
    Common-Crawl/web-archive convention (a payload digest seen in an older
    snapshot is not re-stored; the first capture owns the content). The
    mirror image of ``latest_captures`` (newest-per-URL): here the key is
    the CONTENT hash, not the URL, so the same page served from two URLs
    (or the same URL over time with unchanged bytes) collapses to its first
    appearance.

    Input: (url, capture_ts, digest). Output one row per distinct digest:
    (digest, url, capture_ts, n_copies) — the earliest capture (ties broken
    by url ASC: min over struct(capture_ts, url) is order-independent) and
    how many captures carried the digest.

    Scale shape: a single partial-agg'd groupBy(digest) — min(struct) and
    count both combine map-side, so shuffle rows = distinct digests per
    partition, never the capture count. No window, no join: at 10^10
    captures this is strictly cheaper than the row_number()=1 form because
    hot digests (empty pages, error boilerplate) collapse before the
    shuffle instead of landing on one window partition."""
    keep = F.min(F.struct("capture_ts", "url")).alias("_keep")
    return (
        captures.groupBy("digest")
        .agg(keep, F.count("*").alias("n_copies"))
        .select(
            "digest",
            F.col("_keep.url").alias("url"),
            F.col("_keep.capture_ts").alias("capture_ts"),
            "n_copies",
        )
    )


def resolve_redirects(redirects: DataFrame, max_rounds: int = 5) -> DataFrame:
    """Transitive 3xx redirect resolution by POINTER JUMPING: every URL in
    a (src, dst) redirect map resolves to the end of its chain. A crawl
    dedups and indexes by FINAL URL — a 5-hop www->https->apex->cdn chain
    is one page, and following chains one hop per pass over a 10^10-URL
    map is the naive O(L)-round plan this operator exists to beat.

    Pointer jumping squares the step each round — f' = f(f(x)) — so round
    k resolves chains up to 2^k hops: ``max_rounds`` = 5 covers 32-hop
    chains (browsers give up at ~20) in FIVE self-joins total, not 32.
    Each round is one equi-join of the map with itself on the current
    target + a lineage cut; shuffle rows = map size, never corpus size.

    Cycles (a -> b -> a, the classic redirect-loop trap) can't loop the
    fixed-round plan; a cycle member's resolved target is itself a cycle
    member, flagged ``is_cycle`` by one semi-join back against the map's
    source set EXCLUDING self-resolution (a self-redirect is its own
    cycle). Output (src, final_url, is_cycle).

    The map must be a FUNCTION — one dst per src (a URL serves one
    Location header; reduce conflicting multi-capture records to the
    latest upstream, e.g. via latest_captures). Exact duplicate rows —
    the same redirect captured twice, normal in capture logs — are
    deduped here: un-deduped, every self-join round would MULTIPLY rows
    routed through the duplicated link (up to 2^max_rounds copies)."""
    redirects = redirects.select("src", "dst").distinct()
    f = redirects.select(F.col("src"), F.col("dst").alias("cur"))
    for _ in range(max_rounds):
        # the JUMP: follow cur's own CURRENT resolution, not one raw hop —
        # f' = f∘f doubles the resolved distance per round (joining against
        # the raw map instead would advance one hop per round, the naive
        # O(chain-length) plan this operator exists to beat)
        g = f.select(F.col("src").alias("_k"), F.col("cur").alias("_nxt"))
        f = (
            f.join(g, f["cur"] == g["_k"], "left")
            .select("src", F.coalesce(F.col("_nxt"), F.col("cur")).alias("cur"))
            .localCheckpoint()  # truncate lineage per jump (pagerank pattern)
        )
    # a resolved target that still redirects somewhere = unterminated chain
    # after 2^max_rounds hops = cycle (or absurd depth; flagged identically)
    srcs = redirects.select(F.col("src").alias("cur"), F.lit(1).alias("_m"))
    return (
        f.join(srcs, "cur", "left")
        .select(
            "src",
            F.col("cur").alias("final_url"),
            F.col("_m").isNotNull().cast("int").alias("is_cycle"),
        )
    )


def plan_revalidation(captures: DataFrame) -> DataFrame:
    """Conditional-request planning for a recrawl wave — the HTTP
    revalidation step between "this URL is stale" (recrawl_schedule) and
    "fetch it": RFC 9110 prefers the strong validator, so a stored ETag
    plans an If-None-Match request, else a stored Last-Modified plans
    If-Modified-Since, else the fetch is unconditional. A 304 costs
    headers; a full refetch costs the body — at 10^10 URLs the validator
    coverage ratio IS the recrawl bandwidth bill.

    Input (url, etag, last_modified, stored_digest, current_digest) —
    digests of the stored capture and the live content (the simulation
    twin of the server's own comparison; a real deployment drops
    current_digest and reads the response code instead). Output
    (url, mode, validator, outcome):

    * mode      — if-none-match | if-modified-since | unconditional;
    * validator — the header value the request would carry (NULL when
      unconditional);
    * outcome   — not_modified (304: validator present AND content
      unchanged) | refetch (changed, or nothing to validate against).

    Scan-only projection; zero shuffle."""
    has_etag = F.col("etag").isNotNull()
    has_lm = F.col("last_modified").isNotNull()
    mode = (
        F.when(has_etag, F.lit("if-none-match"))
        .when(has_lm, F.lit("if-modified-since"))
        .otherwise(F.lit("unconditional"))
    )
    validator = F.when(has_etag, F.col("etag")).when(has_lm, F.col("last_modified"))
    unchanged = F.col("stored_digest") == F.col("current_digest")
    outcome = F.when(
        (has_etag | has_lm) & unchanged, F.lit("not_modified")
    ).otherwise(F.lit("refetch"))
    return captures.select(
        "url", mode.alias("mode"), validator.alias("validator"), outcome.alias("outcome")
    )


def freshness_stats(captures: DataFrame, now_ms: int) -> DataFrame:
    """Per-host capture-freshness profile — the staleness readout a
    recrawl budget is allocated against: median and p90 AGE of each
    host's LATEST captures (latest per url first — a url recrawled
    yesterday is fresh no matter how old its history), plus the stale
    share past a 30-day horizon. Ages in whole days; nearest-rank
    percentiles (observed values, all-integer — the adaptive-timeout
    discipline: interpolated percentiles differ across engines in IEEE
    op order).

    Input: the capture log (url, host, capture_ms, ...). Output per host:
    (host, n_urls, median_age_days, p90_age_days, n_stale_30d,
    stale_ppm). One latest-per-url max-agg + one host rollup over sorted
    collect_list — host arrays bounded by the same politeness invariant
    as plan_adaptive_timeouts; swap approx percentiles past it."""
    latest = captures.groupBy("host", "url").agg(
        F.max("capture_ms").alias("capture_ms")
    )
    age_days = ((F.lit(now_ms) - F.col("capture_ms")) / F.lit(86_400_000)).cast(
        "bigint"
    )
    per_host = (
        latest.withColumn("age_days", age_days)
        .groupBy("host")
        .agg(
            F.sort_array(F.collect_list("age_days")).alias("_ages"),
        )
    )
    n = F.size("_ages")
    idx50 = F.expr("greatest((size(_ages) * 50 + 99) div 100, 1)").cast("int")
    idx90 = F.expr("greatest((size(_ages) * 90 + 99) div 100, 1)").cast("int")
    return (
        per_host.withColumn("n_urls", n.cast("int"))
        .withColumn("median_age_days", F.element_at(F.col("_ages"), idx50))
        .withColumn("p90_age_days", F.element_at(F.col("_ages"), idx90))
        .withColumn(
            "n_stale_30d",
            F.size(F.filter(F.col("_ages"), lambda a: a > 30)).cast("int"),
        )
        .withColumn(
            "stale_ppm",
            F.expr("(n_stale_30d * 1000000) div greatest(size(_ages), 1)").cast("bigint"),
        )
        .select("host", "n_urls", "median_age_days", "p90_age_days",
                "n_stale_30d", "stale_ppm")
    )
