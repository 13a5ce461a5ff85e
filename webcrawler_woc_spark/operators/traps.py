"""Crawler-trap detection over frontier URLs — the pre-fetch guard every
production crawler runs that the reference lacks entirely (its policy is a
host whitelist, /root/reference/src/crawler.rs should_crawl): calendar
pages, session-id links, and self-similar path loops generate unbounded
URL spaces that a BFS frontier will happily expand forever. Flagging them
URL-side costs one scan-only projection; NOT flagging them costs the
crawl budget of an infinite subtree.

Signals (each independently thresholdable, all pure Catalyst — split /
filter / transform higher-order expressions inside whole-stage codegen,
zero shuffle, zero Python):

* ``path_depth``      — number of non-empty path segments; traps nest deep;
* ``max_seg_repeat``  — max multiplicity of any single path segment
  (``/foo/x/foo/y/foo`` -> 3): self-similar loops repeat a segment;
* ``n_date_segs``     — segments shaped like years (19xx/20xx) or 1-2-digit
  day/month numbers: calendar traps are date lattices;
* ``n_params``        — query-param count: faceted-search explosions carry
  many params;
* ``has_session_param`` — a session-id param (phpsessid/jsessionid/...)
  makes every visit a "new" URL, the classic dedup-defeating trap.

``is_trap`` is the pinned composite OR. At 100 TB this projection runs
frontier-side before the seen-filter probe, so trap URLs never even cost a
filter lookup; the per-host rollup (host_trap_stats) feeds the same policy
layer as domain_quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000

# dedup-defeating session/state query params (lowercased name match)
SESSION_PARAMS = ("phpsessid", "jsessionid", "sessionid", "sid", "cfid", "cftoken")

# composite thresholds (pinned; callers override per deployment)
MAX_PATH_DEPTH = 8
MAX_SEG_REPEAT = 3
MAX_DATE_SEGS = 4
MAX_PARAMS = 8


def url_trap_flags(
    frontier: DataFrame,
    max_depth: int = MAX_PATH_DEPTH,
    repeat_limit: int = MAX_SEG_REPEAT,
    date_limit: int = MAX_DATE_SEGS,
    max_params: int = MAX_PARAMS,
) -> DataFrame:
    """(url, ...) -> (url, path_depth, max_seg_repeat, n_date_segs,
    n_params, has_session_param, is_trap) — all ints (flags 0/1) so the
    result value-hashes identically across engines.

    max_seg_repeat is O(d^2) per URL over d path segments — d is tiny
    (paths are short) and it stays a scan-side expression; a NULL/hostless
    url yields zeros (never NULL flags)."""
    path = F.regexp_extract(F.col("url"), r"^https?://[^/?#]+([^?#]*)", 1)
    # strip the fragment BEFORE locating '?': a '#frag?x' url has no real
    # query (phantom params otherwise), and 'p?a=1#f' must not fold the
    # fragment into the last param value
    nofrag = F.substring_index(F.col("url"), "#", 1)
    query = F.when(
        nofrag.contains("?"),
        F.substr(nofrag, F.locate("?", nofrag) + F.lit(1)),
    ).otherwise(F.lit(""))
    sess_re = "^(" + "|".join(SESSION_PARAMS) + ")="
    out = (
        frontier.withColumn("_path", F.coalesce(path, F.lit("")))
        .withColumn("_q", F.coalesce(query, F.lit("")))
        .withColumn("_segs", F.expr("filter(split(_path, '/'), s -> s <> '')"))
        .withColumn("_params", F.expr("filter(split(_q, '&'), p -> p <> '')"))
        .withColumn("path_depth", F.size("_segs").cast("int"))
        .withColumn(
            "max_seg_repeat",
            F.when(
                F.col("path_depth") > 0,
                F.expr(
                    "array_max(transform(array_distinct(_segs),"
                    " s -> size(filter(_segs, x -> x = s))))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .withColumn(
            "n_date_segs",
            F.expr(
                "size(filter(_segs, s -> s rlike '^(19|20)[0-9]{2}$'"
                " or s rlike '^[0-9]{1,2}$'))"
            ).cast("int"),
        )
        .withColumn("n_params", F.size("_params").cast("int"))
        .withColumn(
            "has_session_param",
            F.expr(f"exists(_params, p -> lower(p) rlike '{sess_re}')")
            .cast("int"),
        )
    )
    is_trap = (
        (F.col("max_seg_repeat") >= repeat_limit)
        | (F.col("path_depth") > max_depth)
        | (F.col("n_date_segs") >= date_limit)
        | (F.col("n_params") > max_params)
        | (F.col("has_session_param") == 1)
    )
    return out.withColumn("is_trap", is_trap.cast("int")).drop(
        "_path", "_q", "_segs", "_params"
    )


def host_trap_stats(frontier: DataFrame, **thresholds) -> DataFrame:
    """Per-host trap exposure: (host, n_urls, n_traps, trap_ratio_ppm) —
    the frontier-side twin of domainstats.domain_quality's corpus-side
    rollup; a host past a trap-ratio threshold gets its frontier budget
    cut before a single trap page is fetched. One partial-agg'd
    groupBy(host) over the scan-side flags projection."""
    flagged = url_trap_flags(frontier, **thresholds)
    host = F.lower(F.regexp_extract(F.col("url"), r"^https?://([^/?#]+)", 1))
    return (
        flagged.groupBy(host.alias("host"))
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.sum("is_trap").cast("bigint").alias("n_traps"),
        )
        .withColumn("trap_ratio_ppm", F.expr(f"(n_traps * {PPM}) div n_urls"))
    )


# phrases that mark an error page served with a 200 (word-ish bounded,
# probed over the page's leading text where titles/H1s land)
SOFT404_PHRASES = (
    "page not found",
    "404 not found",
    "404 error",
    "does not exist",
    "no longer available",
    "file not found",
)
SOFT404_PROBE_CHARS = 512
# thin-content gate: text_len < 25% of the host's median length
SOFT404_THIN_PPM = 250_000


def soft404_flags(
    pages: DataFrame,
    thin_ppm: int = SOFT404_THIN_PPM,
    probe_chars: int = SOFT404_PROBE_CHARS,
) -> DataFrame:
    """Soft-404 detection: pages that return HTTP 200 but ARE the error
    page — the single biggest source of junk rows a status-code gate
    cannot catch (misconfigured CMSes serve their 404 template with 200;
    Common Crawl carries millions). Two independent signals:

    * ``err_phrase`` — a known error phrase in the first ``probe_chars``
      characters of extracted text (where the title/H1 lands);
    * ``thin``       — text length below ``thin_ppm``/1e6 of the HOST's
      median text length (error templates are short relative to the
      host's real pages; an absolute cutoff would misfire on terse hosts).

    ``soft404`` = status 200 AND (err_phrase OR thin) — pinned composite.

    Input: (url, host, http_status, text). The host medians are one
    partial-agg'd groupBy(host) (host-cardinality rows, broadcast back —
    never a corpus-sized shuffle); the flags are scan-side. Median is the
    exact interpolated percentile on both engines so the double compares
    value-hash identically.
    """
    # \s+ between words: HTML-to-text extraction leaves double spaces and
    # newlines inside the phrases ('page not\nfound')
    phrase_re = "(" + "|".join(p.replace(" ", r"\s+") for p in SOFT404_PHRASES) + ")"
    probe = F.lower(F.substring(F.col("text"), 1, probe_chars))
    lens = pages.withColumn("text_len", F.length("text").cast("bigint"))
    medians = lens.groupBy("host").agg(
        F.percentile(F.col("text_len"), F.lit(0.5)).alias("host_median_len")
    )
    out = (
        lens.join(F.broadcast(medians), "host")
        .withColumn("err_phrase", probe.rlike(phrase_re).cast("int"))
        .withColumn(
            "thin",
            (F.col("text_len") * PPM < F.lit(thin_ppm) * F.col("host_median_len"))
            .cast("int"),
        )
    )
    soft = (F.col("http_status") == 200) & (
        (F.col("err_phrase") == 1) | (F.col("thin") == 1)
    )
    return out.withColumn("soft404", soft.cast("int")).select(
        "url", "host", "http_status", "text_len", "host_median_len",
        "err_phrase", "thin", "soft404",
    )


def filter_traps(frontier: DataFrame, **thresholds) -> DataFrame:
    """Frontier rows whose URL is NOT a trap, original columns preserved —
    the wave-side gate (CrawlConfig.trap_filter / CLI --trap-filter): trap
    URLs are dropped BEFORE scheduling, the seen-filter probe and the
    fetch, so an infinite subtree costs nothing past this projection.
    Same scan-only shape as url_trap_flags; opt-in, default off (the
    reference has no trap notion — parity first)."""
    flagged = url_trap_flags(frontier, **thresholds)
    added = [
        "path_depth", "max_seg_repeat", "n_date_segs", "n_params",
        "has_session_param", "is_trap",
    ]
    return flagged.filter(F.col("is_trap") == 0).drop(*added)


# masking order is pinned (uuid before hex before digits: a uuid IS hex
# runs, a hex run often IS digits); both engines' regexp_replace are
# global (DuckDB needs the explicit 'g' flag — the oracle passes it)
URL_PATTERN_MASKS = (
    (r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", "{uuid}"),
    (r"[0-9a-f]{16,}", "{hex}"),
    (r"[0-9]+", "{n}"),
)


def url_patterns(frontier: DataFrame) -> DataFrame:
    """Per-host URL-template mining: mask the variable parts of every
    path (numeric ids, hex tokens, uuids) and count URLs per residual
    pattern — ``/product/{n}/review/{n}`` at 40M URLs and ``/static/css``
    at 3 is the shape of a site, and the shape is what a frontier
    scheduler budgets on: patterns with unbounded {n} cardinality are the
    crawl-space; singleton patterns are the site chrome. The trap flags
    (url_trap_flags) judge ONE url; this judges the host's URL SPACE.

    Returns (host, pattern, n_urls, example_url) — pattern is the masked
    path (query dropped: param VALUES are masked by definition and
    param-set explosion is already n_params' job). One scan-side
    projection + one partial-agg'd groupBy (host, pattern): shuffle rows
    collapse from URL count to pattern count, tiny. Masking is pinned
    lowercase-path, uuid > hex > digit order (each later mask would eat
    the earlier's token otherwise)."""
    host = F.lower(F.regexp_extract(F.col("url"), r"^https?://([^/?#]+)", 1))
    path = F.lower(F.regexp_extract(F.col("url"), r"^https?://[^/?#]+([^?#]*)", 1))
    pattern = F.when(path == "", F.lit("/")).otherwise(path)
    for mask_re, token in URL_PATTERN_MASKS:
        pattern = F.regexp_replace(pattern, mask_re, token)
    return (
        frontier.select(
            host.alias("host"), pattern.alias("pattern"), F.col("url")
        )
        .groupBy("host", "pattern")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.min("url").alias("example_url"),
        )
    )
