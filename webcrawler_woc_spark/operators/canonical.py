"""rel=canonical and meta-refresh extraction — the two in-band URL-aliasing
channels a crawl must honor before dedup/indexing.

The reference crawler (src/crawler.rs) follows only server-side redirects
implicitly through reqwest; real webtext pipelines additionally collapse
pages by their DECLARED canonical (the ``<link rel="canonical">`` tag and
the ``Link: <...>; rel="canonical"`` response header) and follow
client-side ``<meta http-equiv="refresh">`` redirects — both are how CMSes
express "this URL is an alias". Ignoring them inflates the index with
URL-level duplicates that no content-hash dedup catches cheaply (the bodies
often differ by session tokens or timestamps).

All extraction here is scan-only pure Catalyst (latin-1 prescan + regexp —
see extract.detect_charset for why latin-1: total over byte sequences, tag
bytes are ASCII). The clustering step is one groupBy on the canonical
target — at 100 TB it shuffles one small row per page, same key the
index/dedup layers already use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# WHATWG-ish prescan window for <head> probes, shared with robots_meta_flags.
HEAD_SCAN_BYTES = 4096


def _absolutize(target, page_url):
    """Resolve an extracted href against the page URL — Catalyst-only form
    covering the two shapes CMSes actually emit for canonicals: absolute
    http(s) URLs (kept verbatim) and root-relative paths (joined to the
    page's scheme://host). Anything else (protocol-relative, dot-relative,
    javascript:) is NULL — a conservative gate, not a full RFC 3986
    resolver; the crawl's link extractor owns general resolution."""
    origin = F.regexp_extract(page_url, r"^(https?://[^/]+)", 1)
    return (
        F.when(target.rlike(r"^https?://"), target)
        .when(target.startswith("/") & ~target.startswith("//"), F.concat(origin, target))
        .otherwise(F.lit(None).cast("string"))
    )


def canonical_links(pages: DataFrame, body_col: str = "html") -> DataFrame:
    """Adds ``canonical_source`` ('header' | 'link' | NULL) and
    ``canonical_url`` (absolutized, NULL when the page declares none or the
    declaration is unresolvable).

    Channels, transport-first precedence (mirrors detect_charset's
    header-over-meta ordering; Google documents both channels as equivalent
    hints, so a fixed precedence is required for determinism):

    * ``Link: <url>; rel="canonical"`` response header (``headers`` map
      column, lowercased keys as the fetch schema stores them);
    * ``<link rel="canonical" href="...">`` probed in the first 4096
      latin-1-decoded bytes.

    A self-canonical (target == page url) is kept — it is an explicit
    declaration, and the cluster step treats it identically to "none".
    """
    # UN-lowered head with (?i) matching: URL paths are case-sensitive, so
    # lowering the head before extraction would emit targets that 404 on
    # case-sensitive servers and break self-canonical detection
    head = F.decode(F.substring(F.col(body_col), 1, HEAD_SCAN_BYTES), "ISO-8859-1")
    # attribute order varies in the wild: match rel=canonical ... href= OR
    # href= ... rel=canonical within one <link> tag
    link_tag = F.coalesce(
        F.when(
            (t := F.regexp_extract(
                head,
                r'(?is)<link[^>]*rel\s*=\s*["\']?canonical["\']?[^>]*href\s*=\s*["\']([^"\'>\s]+)',
                1,
            )) != "",
            t,
        ),
        F.when(
            (t2 := F.regexp_extract(
                head,
                r'(?is)<link[^>]*href\s*=\s*["\']([^"\'>\s]+)["\'][^>]*rel\s*=\s*["\']?canonical',
                1,
            )) != "",
            t2,
        ),
    )
    hdr_raw = F.element_at(F.col("headers"), "link")
    hdr_tgt = F.regexp_extract(
        F.coalesce(hdr_raw, F.lit("")), r'(?i)<([^>]+)>\s*;\s*rel\s*=\s*"?canonical', 1
    )
    hdr_tgt = F.when(hdr_tgt == "", F.lit(None)).otherwise(hdr_tgt)

    target = F.coalesce(hdr_tgt, link_tag)
    source = (
        F.when(hdr_tgt.isNotNull(), F.lit("header"))
        .when(link_tag.isNotNull(), F.lit("link"))
        .otherwise(F.lit(None).cast("string"))
    )
    return pages.withColumn("canonical_source", source).withColumn(
        "canonical_url", _absolutize(target, F.col("url"))
    )


def canonical_clusters(pages: DataFrame, body_col: str = "html") -> DataFrame:
    """Collapse pages by declared canonical: every page maps to
    ``coalesce(canonical_url, url)`` (a page with no declaration — or a
    self-canonical — is its own target) and clusters are the groups.

    Returns one row per cluster:
    (canonical_url, n_members, n_declared, rep_url) where ``n_declared``
    counts members that EXPLICITLY declared the target (self-canonicals
    count: an explicit self-declaration is still a declaration) and
    ``rep_url`` is the canonical target itself when it is a member, else
    the lexicographic min member (the target may not have been fetched).

    One groupBy on the target key — the same shuffle key the dedup/index
    layers use downstream, so at scale this folds into their exchange.
    """
    with_canon = canonical_links(pages, body_col=body_col)
    member_key = F.coalesce(F.col("canonical_url"), F.col("url"))
    return (
        with_canon.select(
            member_key.alias("canonical_url"),
            F.col("url"),
            F.col("canonical_source").isNotNull().cast("int").alias("declared"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("declared").alias("n_declared"),
            F.coalesce(
                F.min(F.when(F.col("url") == F.col("canonical_url"), F.col("url"))),
                F.min("url"),
            ).alias("rep_url"),
        )
    )


def meta_refresh_redirects(pages: DataFrame, body_col: str = "html") -> DataFrame:
    """Client-side redirects: ``<meta http-equiv="refresh"
    content="N; url=TARGET">`` probed in the head-scan window.

    Returns only the redirecting rows, as (url, refresh_delay_s,
    refresh_target) — a refresh with no url= part reloads itself and is
    dropped (self-refresh is a liveness hint, not an alias). The output is
    edge-shaped on purpose: union it with the 3xx redirect map and feed
    ``recrawl.resolve_redirects`` so mixed server/client chains collapse in
    the same pointer-jumping rounds.
    """
    # un-lowered head, (?i) matching: the refresh TARGET's casing matters
    head = F.decode(F.substring(F.col(body_col), 1, HEAD_SCAN_BYTES), "ISO-8859-1")
    content = F.regexp_extract(
        head,
        r'(?is)<meta[^>]*http-equiv\s*=\s*["\']?refresh["\']?[^>]*content\s*=\s*["\']([^"\'>]*)',
        1,
    )
    delay = F.regexp_extract(content, r"^\s*(\d+)", 1)
    target = F.regexp_extract(content, r"(?i)(?:;|,)\s*url\s*=\s*[\"']?([^\"'>\s]+)", 1)
    return (
        pages.withColumn("refresh_delay_s", F.when(delay != "", delay.cast("int")))
        .withColumn("refresh_target", _absolutize(F.when(target != "", target), F.col("url")))
        .filter(F.col("refresh_delay_s").isNotNull() & F.col("refresh_target").isNotNull())
        .select("url", "refresh_delay_s", "refresh_target")
    )


def hreflang_alternates(pages: DataFrame, body_col: str = "html") -> DataFrame:
    """Language-variant edges from ``<link rel="alternate" hreflang="xx"
    href="...">`` — how multilingual sites declare that /en/about and
    /de/ueber-uns are ONE document in two languages. A multilingual corpus
    builder needs these clusters for two jobs: language-balanced sampling
    that doesn't count one document once per language, and
    translation-pair mining (the declared alignment is the supervision
    signal).

    Emits one row per declared alternate: (url, hreflang, alt_url) —
    lowercased BCP-47-ish tag (``x-default`` passes through), target
    absolutized with the same conservative resolver as canonicals.
    Extraction is two passes, both Catalyst-only: collect whole
    ``<link ...rel=alternate...>`` tags that carry BOTH attributes
    (either attribute order), then per-tag regexp for the two values —
    the per-element transform stays inside the scan, nothing shuffles.
    Cluster formation downstream is the canonical_clusters pattern:
    group on the sorted alternate set or union-find over edges
    (graph.connected_components composes directly).
    """
    # un-lowered head, (?i) matching: alt_url casing must survive; only the
    # BCP-47 tag is normalized to lowercase below (tags are case-insensitive)
    head = F.decode(F.substring(F.col(body_col), 1, HEAD_SCAN_BYTES), "ISO-8859-1")
    tags = F.regexp_extract_all(
        head, F.lit(r'(?is)(<link[^>]*rel\s*=\s*["\']?alternate[^>]*>)'), F.lit(1)
    )
    pairs = F.filter(
        F.transform(
            tags,
            lambda t: F.struct(
                F.lower(
                    F.regexp_extract(t, r'(?i)hreflang\s*=\s*["\']?([A-Za-z0-9\-]+)', 1)
                ).alias("hreflang"),
                F.regexp_extract(t, r'(?i)href\s*=\s*["\']([^"\'>\s]+)', 1).alias("target"),
            ),
        ),
        lambda s: (s["hreflang"] != "") & (s["target"] != ""),
    )
    exploded = pages.select(
        F.col("url"), F.explode(pairs).alias("alt")
    )
    return exploded.select(
        "url",
        F.col("alt.hreflang").alias("hreflang"),
        _absolutize(F.col("alt.target"), F.col("url")).alias("alt_url"),
    ).filter(F.col("alt_url").isNotNull())


def alias_final_keys(
    frontier: DataFrame, redirects: DataFrame, canonical_map: DataFrame,
    max_rounds: int = 5,
) -> DataFrame:
    """The full URL-aliasing composition a dedup/index layer keys on:
    frontier url -> transitive redirect resolution (server 3xx + client
    meta-refresh edges, pointer-jumped) -> declared-canonical mapping of
    the LANDED url (a canonical is declared by the page that finally
    renders, so it applies after redirects — the order is load-bearing).

    Inputs: ``redirects`` (src, dst) raw hop map; ``canonical_map``
    (url, canonical_url) — canonical_links output rows that declared one.
    Output per frontier row: (url, final_key, via_redirect 0/1,
    via_canonical 0/1). Grouping by final_key is alias-aware dedup; the
    n_aliases-per-key rollup is one groupBy downstream.

    Scale shape: two left equi-joins against alias tables that are tiny
    relative to the corpus (only REDIRECTING and DECLARING rows appear),
    after a fixed number of self-joins inside resolve_redirects — every
    join keyed on the url, the partitioning the frontier already has.
    """
    from .recrawl import resolve_redirects

    resolved = resolve_redirects(redirects, max_rounds=max_rounds).select(
        F.col("src").alias("url"), F.col("final_url")
    )
    f1 = frontier.join(resolved, "url", "left").select(
        "url",
        F.coalesce(F.col("final_url"), F.col("url")).alias("_landed"),
        F.col("final_url").isNotNull().cast("int").alias("via_redirect"),
    )
    cm = canonical_map.select(
        F.col("url").alias("_landed"), F.col("canonical_url").alias("_canon")
    )
    return f1.join(cm, "_landed", "left").select(
        "url",
        F.coalesce(F.col("_canon"), F.col("_landed")).alias("final_key"),
        "via_redirect",
        F.col("_canon").isNotNull().cast("int").alias("via_canonical"),
    )
