"""Link-graph analysis over the crawled corpus: PageRank-style scoring and
connected components — the iterative DataFrame jobs a frontier scheduler
feeds on (priority from link authority, site clustering from components).

Determinism across engines (the DuckDB oracle gate hashes values): floats
summed in shuffle order are NOT reproducible, so both operators use
order-independent arithmetic only —

* ``pagerank_int``: ranks are scaled integers (ppm); per-edge contribution is
  integer division ``rank // out_degree`` and the damping step is integer
  ``(85 * s) // 100`` — sums of integers are exact in any order;
* ``connected_components``: min-label propagation — ``min`` is
  order-independent by definition.

Both are FIXED-ITERATION by spec (the iteration count is part of the
operator contract), which keeps them SQL-expressible as chained CTEs for the
oracle. At 10^10 edges each iteration is one shuffle on ``dst`` (the classic
Pregel-on-DataFrames layout); between iterations the rank/label frame is
locally checkpointed, which truncates the logical plan so per-iteration
plans stay constant-size (cache() alone would not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def doc_edges(children: DataFrame) -> DataFrame:
    """(src, dst) doc-id edges from extracted links
    (``children`` = extract_child_links output with parent_url, url).
    Only /page/N targets are edges (mailto/tel/missing links are not pages).
    """
    src = F.regexp_extract(F.col("parent_url"), r"/page/(\d+)$", 1)
    dst = F.regexp_extract(F.col("url"), r"^https?://[^/]+/page/(\d+)$", 1)
    return (
        children.select(src.alias("s"), dst.alias("d"))
        .filter((F.col("s") != "") & (F.col("d") != ""))
        .select(F.col("s").cast("long").alias("src"), F.col("d").cast("long").alias("dst"))
        .distinct()
    )


def pagerank_int(nodes: DataFrame, edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Integer-arithmetic PageRank (damping 0.85, ppm scale, dangling mass
    dropped — documented contract). Output (doc_id, rank_ppm).

    rank_0 = 10^6; rank_{i+1}(v) = 150000 + (85 * Σ_{u->v} rank_i(u)//deg(u)) // 100
    """
    ranks = nodes.select(F.col("doc_id"), F.lit(PPM).cast("bigint").alias("rank_ppm"))
    return _pagerank_rounds(nodes, edges, ranks, iterations)


def pagerank_incremental(
    nodes: DataFrame,
    edges: DataFrame,
    new_edges: DataFrame,
    prior_ranks: DataFrame,
    iterations: int = 2,
) -> DataFrame:
    """Warm-start delta PageRank — fold a new crawl wave's edges into an
    EXISTING rank table by re-iterating only ``iterations`` rounds over the
    union graph seeded from the prior scores, instead of restarting from
    uniform. An edge delta perturbs scores locally, so the warm start is
    within the same tolerance of the fixpoint in a fraction of the rounds a
    cold start needs — and each avoided round is a full edge-shuffle at
    10^10 edges (the per-round plan is identical to pagerank_int; rounds
    are the entire cost model). Exact identity pinned in tests: with an
    empty delta, k cold rounds + j seeded rounds == k + j cold rounds.

    ``nodes`` must cover new and old doc_ids; nodes with no prior score
    (newly discovered this wave) seed at 10^6 ppm, the same value a cold
    start gives every node. prior_ranks joins once on doc_id.

    Edge-SET precondition: edges/new_edges are treated as sets — the union
    is distinct'd so a delta re-reporting an existing edge can't double its
    contribution. pagerank_int does NOT distinct (doc_edges already does),
    so the empty-delta identity above holds for set-valued edge input
    (every producer in this repo); multi-edge input would diverge."""
    all_edges = edges.select("src", "dst").unionByName(
        new_edges.select("src", "dst")
    ).distinct()
    seed = (
        nodes.join(prior_ranks.select("doc_id", "rank_ppm"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("rank_ppm"), F.lit(PPM).cast("bigint")).alias("rank_ppm"),
        )
    )
    return _pagerank_rounds(nodes, all_edges, seed, iterations)


def salsa_int(nodes: DataFrame, edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Integer SALSA (Lempel & Moran 2001) — HITS's random-walk sibling:
    each propagation step divides the transferred mass by the DEGREE of the
    node it leaves (hub step by in-degree, authority step by out-degree),
    which is exactly what makes SALSA resistant to the tightly-knit-
    community effect that lets a small dense clique capture HITS's
    mutual-reinforcement scores. No normalization step needed — the walk is
    stochastic, so mass is conserved up to integer-floor loss:

        a_0(v)     = 10^6
        h_{i+1}(u) = Σ_{(u,v)∈E} a_i(v)   div indeg(v)
        a_{i+1}(v) = Σ_{(u,v)∈E} h_{i+1}(u) div outdeg(u)

    Output (doc_id, auth_ppm, hub_ppm); nodes touching no edge score 0.
    Order-independent integer math => chained-CTE oracle value-exact.
    Scale shape: two pagerank-shaped edge ⋈ score joins per round, degree
    tables built once, lineage cut per half-step — identical cost model to
    hits_int minus its max-broadcast normalization crossJoins."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # pin the edge list too (see _pagerank_rounds): each half-step joins
    # it, and unpinned lineage re-runs the upstream extraction per join
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = nodes.localCheckpoint()
    # materialize the degree tables ONCE: lazy frames would re-run the
    # corpus-scale edges groupBy inside every half-step's checkpoint job
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).localCheckpoint()
    indeg = edges.groupBy("dst").agg(F.count("*").alias("indeg")).localCheckpoint()
    zero = F.lit(0).cast("bigint")
    a = nodes.select("doc_id", F.lit(PPM).cast("bigint").alias("auth_ppm"))
    h = None
    for _ in range(iterations):
        hin = (
            edges.join(indeg, "dst")
            .join(a, edges["dst"] == a["doc_id"])
            .select(F.col("src"), F.expr("auth_ppm div indeg").alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("s"))
        )
        h = (
            nodes.join(hin, nodes["doc_id"] == hin["src"], "left")
            .select("doc_id", F.coalesce(F.col("s"), zero).alias("hub_ppm"))
            .localCheckpoint()  # truncate lineage per half-step
        )
        ain = (
            edges.join(outdeg, "src")
            .join(h, edges["src"] == h["doc_id"])
            .select(F.col("dst"), F.expr("hub_ppm div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        a = (
            nodes.join(ain, nodes["doc_id"] == ain["dst"], "left")
            .select("doc_id", F.coalesce(F.col("s"), zero).alias("auth_ppm"))
            .localCheckpoint()
        )
    return a.join(h, "doc_id").select("doc_id", "auth_ppm", "hub_ppm")


def host_link_graph(children: DataFrame, drop_self: bool = False) -> DataFrame:
    """Collapse the page-level link stream to the INTER-HOST graph:
    (src_host, dst_host, n_links, n_src_pages) — the graph domain policy,
    TrustRank seeding and spam-ring analysis actually run on at web scale
    (the host graph is orders of magnitude smaller than the page graph, and
    host-to-host link mass is the robust signal; per-page edges are what
    spam farms fake cheaply). ``drop_self`` removes intra-host edges (site
    navigation) to leave only the endorsement graph.

    Input: extract_child_links output (parent_url, url) — already
    page-level-deduped. Cost honesty: the EXACT countDistinct(parent_url)
    keys the partial aggregate on (src_host, dst_host, parent_url), so the
    shuffle carries one row per distinct (host pair, source page) — NOT per
    host pair; a site-wide footer linked from 10M pages shuffles ~10M rows.
    n_links alone would collapse map-side to pair granularity; at 100 TB
    swap countDistinct for approx_count_distinct (HLL sketches merge
    map-side, restoring pair-bounded shuffle) — exact here because the
    oracle gate demands value equality. Schemeless targets (mailto:/tel:)
    extract an empty dst host and drop."""
    src = F.lower(F.regexp_extract(F.col("parent_url"), r"^https?://([^/?#]+)", 1))
    dst = F.lower(F.regexp_extract(F.col("url"), r"^https?://([^/?#]+)", 1))
    g = children.select(
        src.alias("src_host"), dst.alias("dst_host"), F.col("parent_url")
    ).filter(F.col("dst_host") != "")
    if drop_self:
        g = g.filter(F.col("src_host") != F.col("dst_host"))
    return g.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("parent_url").alias("n_src_pages"),
    )


def trustrank_int(
    nodes: DataFrame, edges: DataFrame, seeds: DataFrame, iterations: int = 3
) -> DataFrame:
    """Integer TrustRank (Gyöngyi/Garcia-Molina/Pedersen 2004) — trust
    propagates FROM a hand-vetted seed set through out-links, so spam farms
    (rarely linked from trusted pages) score near zero however much they
    interlink: the standard spam-demotion complement to PageRank for crawl
    prioritization and corpus filtering. Same arithmetic as pagerank_int
    with one change — the teleport term lands ONLY on seeds:

        trust_0(v)     = 10^6 if v in seeds else 0
        trust_{i+1}(v) = (150000 if v in seeds else 0)
                         + (85 * Σ_{u->v} trust_i(u) div deg(u)) div 100

    Output (doc_id, trust_ppm). Order-independent integer math, so the
    chained-CTE oracle is value-exact. Scale shape identical to
    pagerank_int (edge ⋈ trust join per round, lineage cut per round);
    ``seeds`` is a (doc_id) frame, vetted-seed-set sized — broadcast into
    the teleport term, never shuffled with the graph."""
    is_seed = F.col("_seed").isNotNull()
    # pin iteration inputs once — see _pagerank_rounds: unpinned lineage
    # re-runs the upstream edge/node pipelines per consumer per round
    edges = edges.select("src", "dst").localCheckpoint()
    seed_marked = nodes.join(
        F.broadcast(seeds.select(F.col("doc_id"), F.lit(1).alias("_seed"))),
        "doc_id",
        "left",
    ).localCheckpoint()
    trust = seed_marked.select(
        "doc_id",
        F.when(is_seed, F.lit(PPM)).otherwise(F.lit(0)).cast("bigint").alias("rank_ppm"),
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            edges.join(deg, "src")
            .join(trust, edges["src"] == trust["doc_id"])
            .select(F.col("dst"), F.expr("rank_ppm div deg").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        trust = (
            seed_marked.join(inflow, seed_marked["doc_id"] == inflow["dst"], "left")
            .withColumn("s", F.coalesce(F.col("s"), F.lit(0).cast("bigint")))
            .select(
                "doc_id",
                (
                    F.when(is_seed, F.lit(150_000)).otherwise(F.lit(0)).cast("bigint")
                    + F.expr("(85 * s) div 100")
                ).alias("rank_ppm"),
            )
            .localCheckpoint()  # see _pagerank_rounds: truncate lineage per round
        )
    return trust.select("doc_id", F.col("rank_ppm").alias("trust_ppm"))


def _pagerank_rounds(
    nodes: DataFrame, edges: DataFrame, ranks: DataFrame, iterations: int
) -> DataFrame:
    """The shared per-round plan: edge ⋈ rank contribution join, dangling
    mass dropped, lineage cut per round (see the localCheckpoint note).

    Iteration inputs are PINNED once (localCheckpoint): edges/nodes/deg
    are lazy lineage consumed by every round's joins — when the edge list
    derives from HTML extraction, an unpinned loop re-parses the corpus
    once per consumer per round (measured ~7 full extraction passes for a
    3-round pagerank; graph engines materialize the edge table for this
    exact reason)."""
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = nodes.localCheckpoint()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges["src"] == ranks["doc_id"])
            # `div` = exact integer division on bigints (== DuckDB's `//`
            # for non-negative operands); a double `/` + cast can round the
            # wrong way on .999... binary artifacts
            .select(F.col("dst"), F.expr("rank_ppm div deg").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(inflow, nodes["doc_id"] == inflow["dst"], "left")
            .withColumn("s", F.coalesce(F.col("s"), F.lit(0).cast("bigint")))
            .select(
                "doc_id",
                (F.lit(150_000).cast("bigint") + F.expr("(85 * s) div 100")).alias("rank_ppm"),
            )
            # localCheckpoint actually TRUNCATES the logical plan (cache()
            # does not — plans still grow per iteration and the cache entries
            # leak); eager by default, so the previous iteration's RDD becomes
            # garbage-collectable immediately. On a real cluster swap for
            # checkpoint() to reliable storage if executor loss matters.
            .localCheckpoint()
        )
    return ranks


def _undirected(edges: DataFrame, drop_self: bool = False) -> DataFrame:
    """Symmetrized, deduped (src, dst) edge set. ``drop_self`` removes
    self-loops — degree-semantics operators (k-core, degree histogram)
    must not let a page's self-reference count toward its own degree;
    label/rank propagation keeps them (a self-edge is a deliberate vote).
    connected_components keeps its own non-deduped union: min-agg is
    duplicate-idempotent and the extra distinct would be a wasted shuffle."""
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    if drop_self:
        und = und.filter(F.col("src") != F.col("dst"))
    return und


def connected_components(nodes: DataFrame, edges: DataFrame, iterations: int = 5) -> DataFrame:
    """Min-label propagation over the UNDIRECTED link graph, fixed rounds.
    Output (doc_id, component) where component = min doc_id reachable within
    ``iterations`` hops (the full fixpoint for graphs whose diameter fits).
    """
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()  # pinned once — every round joins it (_pagerank_rounds note)
    labels = nodes.select("doc_id", F.col("doc_id").alias("component"))
    for _ in range(iterations):
        neigh = (
            und.join(labels, und["src"] == labels["doc_id"])
            .groupBy("dst")
            .agg(F.min("component").alias("n_min"))
        )
        labels = (
            labels.join(neigh, labels["doc_id"] == neigh["dst"], "left")
            .select(
                "doc_id",
                F.least(F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint()  # see pagerank_int: truncate lineage per round
        )
    return labels


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count of the undirected link graph, one row
    (n_triangles). Triangles measure local clustering — link-farm /
    spam-ring detection signal on a web graph (dense mutual-link cliques
    triangle-count far above organic linking).

    Plan: canonicalize each undirected edge to (lo, hi), then orient every
    edge from its lower-(degree, id) endpoint to its higher one and run the
    standard two-join wedge enumeration: O(a,b) ⋈ O(b,c) ⋈ O(a,c) — each
    triangle has exactly one source of two out-edges under a total order,
    so it is counted exactly once. Degree orientation (vs plain id order)
    is the 10^10-edge mitigation: a star hub of degree d gets ~0 out-edges
    instead of d, so per-vertex wedge work is bounded by O(sqrt(m)) out-
    degree instead of the hub degree — the self-join never explodes on a
    hot host. The count itself is orientation-invariant, so the id-ordered
    SQL oracle stays value-equal. Exact integer count => oracle-equal."""
    und = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()  # three consumers (degree unions + orientation join)
    )
    deg = (
        und.select(F.col("lo").alias("v"))
        .union(und.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("v", "lo").withColumnRenamed("deg", "deg_lo"), "lo")
        .join(deg.withColumnRenamed("v", "hi").withColumnRenamed("deg", "deg_hi"), "hi")
    )
    lo_first = F.struct(F.col("deg_lo").alias("d"), F.col("lo").alias("i")) < F.struct(
        F.col("deg_hi").alias("d"), F.col("hi").alias("i")
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("s"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("t"),
    ).localCheckpoint()  # three consumers (the e1/e2/e3 wedge joins)
    e1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    e3 = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return tri.agg(F.count("*").cast("bigint").alias("n_triangles"))


def hits_int(nodes: DataFrame, edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Integer-arithmetic HITS (Kleinberg's hubs & authorities — the
    complement of PageRank for crawl scheduling: authorities are pages worth
    fetching, hubs are pages worth re-parsing for links). Fixed iterations,
    ppm scale, L-infinity normalization each half-step (divide by the max —
    exact integer and order-independent, where the textbook L2 norm's sqrt
    has no cross-engine rounding contract). Output
    (doc_id, hub_ppm, auth_ppm); the normalized maxima are 10^6.

    Per round: auth(v) = Σ_{u→v} hub(u) then rescale to max=10^6;
    hub(u) = Σ_{u→v} auth(v) then rescale. No in(out)-links => 0.

    Scale shape: two edge ⋈ score joins + two partial-agg'd groupBys per
    round (the pagerank_int Pregel shape) plus a 1-row max broadcast
    crossJoin per normalization; localCheckpoint truncates lineage.
    Overflow headroom: Σ hub <= N·10^6 and the rescale multiplies by 10^6,
    so bigint holds to N ~ 9·10^6 edges-per-authority; beyond that drop the
    ppm scale a few digits (the contract pins ppm for the gate corpus).
    The headroom is ENFORCED at entry: one degree aggregation over the
    edges (the same shuffle shape as each half-step) raises loudly when any
    node's in/out-degree exceeds it, instead of letting the sum·PPM product
    wrap (non-ANSI) or die mid-iteration with a bare ArithmeticException
    (ANSI) after the expensive rounds already ran.
    """
    if iterations < 1:
        raise ValueError("hits_int needs iterations >= 1 (auth scores are undefined before the first half-step)")
    # pin iteration inputs once (see _pagerank_rounds) — the headroom scan
    # below and every half-step join then read the materialized edge list
    # instead of re-running the upstream extraction lineage
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = nodes.localCheckpoint()
    # ppm half-step bound: score_sum <= deg·10^6, rescale multiplies by 10^6,
    # so deg·10^12 must stay under 2^63-1 => deg <= 9.22·10^6
    _DEG_HEADROOM = (2**63 - 1) // (PPM * PPM)
    max_deg = (
        edges.select(F.col("src").alias("v"), F.lit("out").alias("side"))
        .unionAll(edges.select(F.col("dst").alias("v"), F.lit("in").alias("side")))
        .groupBy("side", "v")
        .agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("mx"))
        .first()["mx"]
    )
    if max_deg is not None and max_deg > _DEG_HEADROOM:
        raise ValueError(
            f"hits_int ppm scale overflows bigint: max in/out-degree {max_deg:,} "
            f"exceeds the {_DEG_HEADROOM:,} headroom (sum*10^6 rescale); shard "
            "the hot node's edges or lower the score scale"
        )
    hubs = nodes.select("doc_id", F.lit(PPM).cast("bigint").alias("hub_ppm"))
    auths = None
    for _ in range(iterations):
        a_in = (
            edges.join(hubs, edges["src"] == hubs["doc_id"])
            .groupBy("dst")
            .agg(F.sum("hub_ppm").alias("s"))
        )
        a_raw = (
            nodes.join(a_in, nodes["doc_id"] == a_in["dst"], "left")
            .select("doc_id", F.coalesce(F.col("s"), F.lit(0).cast("bigint")).alias("a"))
        )
        amax = a_raw.agg(F.greatest(F.max("a"), F.lit(1).cast("bigint")).alias("mx"))
        auths = (
            a_raw.crossJoin(F.broadcast(amax))
            .select("doc_id", F.expr(f"(a * {PPM}) div mx").alias("auth_ppm"))
            .localCheckpoint()
        )
        h_in = (
            edges.join(auths, edges["dst"] == auths["doc_id"])
            .groupBy("src")
            .agg(F.sum("auth_ppm").alias("s"))
        )
        h_raw = (
            nodes.join(h_in, nodes["doc_id"] == h_in["src"], "left")
            .select("doc_id", F.coalesce(F.col("s"), F.lit(0).cast("bigint")).alias("h"))
        )
        hmax = h_raw.agg(F.greatest(F.max("h"), F.lit(1).cast("bigint")).alias("mx"))
        hubs = (
            h_raw.crossJoin(F.broadcast(hmax))
            .select("doc_id", F.expr(f"(h * {PPM}) div mx").alias("hub_ppm"))
            .localCheckpoint()
        )
    return hubs.join(auths, "doc_id").select("doc_id", "hub_ppm", "auth_ppm")


def anchor_topk(links: DataFrame, k: int = 3) -> DataFrame:
    """Per-target anchor-text aggregation — the classic link-graph signal a
    web corpus contributes to its targets (anchor text describes the page it
    points AT; search engines and webtext pipelines attach it to the target
    document as auxiliary training text). The reference extracts (href, text)
    pairs per page (`/root/reference/src/extractor.rs` link walk); this is
    the corpus-wide aggregation of that output.

    Input ``links``: (src, dst, anchor). Output, for each dst, the top-k
    anchors: (dst, rank, anchor, n_mentions, n_inlinks) where n_inlinks is
    the dst's total inbound link count and rank orders by
    (n_mentions DESC, anchor ASC) — the full tiebreak keeps the cut
    deterministic under any shuffle order.

    Scale shape: one partial-agg'd groupBy(dst, anchor) (map-side combine
    collapses within-partition repeats, so shuffle rows = distinct
    (dst, anchor) pairs), then a window over dst for rank + inlink total —
    a second shuffle keyed by dst alone, bounded by the distinct-pair count.
    No joins, nothing driver-side; hot targets (nav boilerplate anchors)
    collapse in the partial agg before they can skew the shuffle."""
    from pyspark.sql import Window

    g = links.groupBy("dst", "anchor").agg(F.count("*").alias("n_mentions"))
    w = Window.partitionBy("dst")
    ranked = g.select(
        "dst",
        F.row_number()
        .over(w.orderBy(F.col("n_mentions").desc(), F.col("anchor").asc()))
        .alias("rank"),
        "anchor",
        "n_mentions",
        F.sum("n_mentions").over(w).alias("n_inlinks"),
    )
    return ranked.filter(F.col("rank") <= k)


def reciprocal_link_stats(edges: DataFrame) -> DataFrame:
    """Link-farm signal: per source node, how much of its out-linking is
    RECIPROCATED (a <-> b). Organic linking is mostly one-way; link-exchange
    schemes and spam rings reciprocate heavily, so recip_ppm is a standard
    feature in link-spam classifiers (TrustRank-era heuristics).

    Edges are de-duplicated and self-loops dropped first (a multi-edge is
    one relationship; a self-loop is trivially 'reciprocal' and would only
    flatter spam pages). Output per source: (node, n_out, n_recip,
    recip_ppm = n_recip * 10^6 div n_out).

    Scale shape: one distinct (the dedup_exact shape, map-side combine),
    one self-join keyed on (src, dst)=(dst, src) — corpus-sized both sides,
    SMJ is the honest plan (allowlisted) — and node-keyed aggs. No windows
    over the corpus."""
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        e.join(rev, ["src", "dst"])  # edge survives iff its reverse exists
        .groupBy("src")
        .agg(F.count("*").alias("n_recip"))
    )
    out = e.groupBy("src").agg(F.count("*").alias("n_out"))
    return (
        out.join(recip, "src", "left")
        .select(
            F.col("src").alias("node"),
            "n_out",
            F.coalesce("n_recip", F.lit(0)).alias("n_recip"),
            F.expr(f"(coalesce(n_recip, 0) * {PPM}) div n_out").alias("recip_ppm"),
        )
    )


def cocitation_topk(edges: DataFrame, per_target_cap: int = 5, k: int = 20) -> DataFrame:
    """Related-sources discovery by co-citation (Dean–Henzinger: two pages
    heavily cited BY THE SAME targets are related): count, for each source
    pair, how many targets link from both, and keep the global top-k.

    The quadratic term is capped per target: only each target's first
    ``per_target_cap`` sources (by src ASC — deterministic) form pairs, so
    a target fans out at most C(cap, 2) pairs no matter how popular it is —
    the same hub-taming move as degree-oriented triangle counting. The cap
    is part of the operator contract (oracle applies the identical cap).

    Output: (src_a, src_b, n_shared) with src_a < src_b, ordered top-k by
    (n_shared DESC, src_a ASC, src_b ASC) — full tiebreak, and the top-k is
    a TakeOrderedAndProject, never a global sort.

    Scale shape: one dst-keyed window to rank sources within each target
    (bounded by distinct edges), the capped pair self-join on dst (SMJ,
    both sides corpus-sized but cap-bounded fan-out), one partial-agg'd
    groupBy(pair)."""
    from pyspark.sql import Window

    e = edges.select("src", "dst").distinct()
    w = Window.partitionBy("dst").orderBy(F.col("src").asc())
    capped = (
        e.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_target_cap)
        .select("src", "dst")
    )
    a = capped.select(F.col("src").alias("src_a"), "dst")
    b = capped.select(F.col("src").alias("src_b"), "dst")
    pairs = a.join(b, "dst").filter(F.col("src_a") < F.col("src_b"))
    counts = pairs.groupBy("src_a", "src_b").agg(F.count("*").alias("n_shared"))
    return counts.orderBy(
        F.col("n_shared").desc(), F.col("src_a").asc(), F.col("src_b").asc()
    ).limit(k)


def host_pagerank_int(host_edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Link-mass-WEIGHTED PageRank over the inter-host graph
    (host_link_graph output): each host's rank flows out proportionally to
    n_links per edge, not split equally — 10,000 editorial links to one
    neighbor and 1 footer link to another are not the same endorsement.
    This is the domain-authority signal the frontier scorer
    (crawl_frontier_score) and TrustRank seeding consume: host-level, so
    the whole computation runs on a graph orders of magnitude smaller
    than the page graph.

    rank_0 = 10^6 ppm; rank_{i+1}(v) = 150000 +
    (85 * Σ_{u→v} (rank_i(u) * w(u,v)) div outw(u)) div 100 — all-integer
    (div before damping, same contract as pagerank_int; dangling hosts
    keep only the teleport term). Per round: one edge ⋈ outw ⋈ rank join
    chain + one groupBy(dst) — shuffle rows = host-edge count; lineage
    cut per round (localCheckpoint, the pagerank pattern). Output
    (host, rank_ppm).
    """
    # pinned once (see _pagerank_rounds) — host_edges often derives from
    # the corpus-scale host_link_graph aggregation, re-run per round if lazy
    edges = host_edges.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst"),
        F.col("n_links").cast("bigint").alias("w"),
    ).localCheckpoint()
    nodes = edges.select(F.col("src").alias("host")).union(
        edges.select(F.col("dst").alias("host"))
    ).distinct().localCheckpoint()
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow")).localCheckpoint()
    ranks = nodes.select("host", F.lit(PPM).cast("bigint").alias("rank_ppm"))
    for _ in range(iterations):
        contrib = (
            edges.join(outw, "src")
            .join(ranks, edges["src"] == ranks["host"])
            .select(F.col("dst"), F.expr("(rank_ppm * w) div ow").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(inflow, nodes["host"] == inflow["dst"], "left")
            .withColumn("s", F.coalesce(F.col("s"), F.lit(0).cast("bigint")))
            .select(
                "host",
                (F.lit(150_000).cast("bigint") + F.expr("(85 * s) div 100")).alias(
                    "rank_ppm"
                ),
            )
            .localCheckpoint()
        )
    return ranks


def label_propagation(nodes: DataFrame, edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Community detection by synchronous label propagation (LPA,
    Raghavan et al. 2007) over the UNDIRECTED graph: every node starts as
    its own label and repeatedly adopts the MODE label among its
    neighbors AND itself (the self-inclusive vote — without it,
    synchronous updates oscillate forever on bipartite structures: a
    single edge swaps two labels every round; tiebreak: smallest label —
    pinned, so rounds are deterministic); isolated nodes keep their
    label. Communities are what link-farm and
    mirror-cluster analysis runs on — connected_components merges
    everything reachable, LPA splits a component into its densely-linked
    cores, which is the granularity spam rings actually have.

    Output (doc_id, label) after ``iterations`` synchronous rounds.

    Per round: one edge ⋈ label join + one groupBy(node, label) count +
    one max_by per node — shuffle rows = edge count then node count;
    lineage cut per round (localCheckpoint, the pagerank pattern). The
    mode vote uses max_by over a (count, -label) struct rather than a
    window sort: one aggregate, no per-partition sort."""
    und = _undirected(edges).localCheckpoint()  # pinned once — joined per round
    labels = nodes.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(iterations):
        votes = (
            und.join(labels, und["src"] == labels["doc_id"])
            .select(F.col("dst").alias("node"), F.col("label"))
            # the self-vote: each node's own current label counts once
            .union(labels.select(F.col("doc_id").alias("node"), F.col("label")))
            .groupBy("node", "label")
            .agg(F.count("*").alias("cnt"))
        )
        # mode with min-label tiebreak: max_by over (cnt, -label) — the
        # struct comparison is lexicographic, so larger cnt wins, then
        # smaller label (negated) wins
        winners = votes.groupBy("node").agg(
            F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl")))
            .alias("new_label")
        )
        labels = (
            labels.join(winners, labels["doc_id"] == winners["node"], "left")
            .select(
                "doc_id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
    return labels


def kcore_nodes(edges: DataFrame, k: int = 3, max_rounds: int = 3) -> DataFrame:
    """Bounded k-core peeling over the UNDIRECTED graph: repeatedly drop
    nodes with degree < k (each removal lowers neighbors' degrees, hence
    the iteration). The k-core is the standard link-farm locator — a spam
    ring is a dense subgraph that SURVIVES peeling, while organically
    linked pages shed. ``max_rounds`` bounds the rounds: the result after
    r rounds is a SUPERSET of the true k-core that shrinks monotonically
    per round (exact once a round removes nothing — the common case by
    round 3 on web graphs; callers needing certainty raise max_rounds
    and compare successive counts).

    Output (doc_id, degree) for surviving nodes, degree = the INDUCED
    degree within the returned node set (self-loops excluded — a page's
    self-reference must not count toward its own core survival); on a
    non-converged run some survivors may report degree < k, consistent
    with the superset caveat.

    Per round: one groupBy(node) degree count + one semi-join restricting
    edges to survivors — shuffle rows = edge count; lineage cut per round.
    """
    # pinned once (two consumers per round: the degree count and the
    # restriction join); the loop re-pins the shrinking survivor set
    und = _undirected(edges, drop_self=True).localCheckpoint()
    for _ in range(max_rounds):
        deg = und.groupBy("src").agg(F.count("*").alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("src")
        und = (
            und.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .localCheckpoint()
        )
    # one more restriction so the REPORTED degree is the induced degree
    # within the returned node set (not a count toward just-dropped
    # neighbors); on non-converged runs some survivors may report < k —
    # the documented superset caveat, never an inconsistent count
    deg = und.groupBy("src").agg(F.count("*").alias("degree"))
    keep = deg.filter(F.col("degree") >= k).select("src")
    final = und.join(keep, "src").join(keep.select(F.col("src").alias("dst")), "dst")
    return (
        final.groupBy("src")
        .agg(F.count("*").cast("int").alias("degree"))
        .select(F.col("src").alias("doc_id"), "degree")
    )


def seed_expansion(host_edges: DataFrame, seeds: DataFrame, top_k: int = 50) -> DataFrame:
    """Crawl-frontier host discovery: rank the hosts the SEED set links to
    most heavily — the "where to crawl next" query a focused crawl runs
    after every wave (the seeds are the trusted/on-topic hosts; their
    aggregate outbound link mass is the endorsement signal, the same
    intuition TrustRank propagates transitively, computed here as the
    cheap one-hop form).

    Inputs: ``host_edges`` (src_host, dst_host, n_links) from
    host_link_graph; ``seeds`` (host). Candidates are non-seed dst hosts
    reached from seeds; output (host, seed_links — total link mass from
    seeds, n_seed_sources — distinct seeds linking, rank) for the top
    ``top_k`` by (mass desc, host asc — full tiebreak, deterministic).

    One semi-join (edges ⋈ broadcast seeds), one anti-join (drop seed
    targets), one candidate-bounded rollup + window rank. Seeds are
    policy-sized — broadcast both ways."""
    s = F.broadcast(seeds.select("host").distinct())
    cand = (
        host_edges.join(s.withColumnRenamed("host", "src_host"), "src_host")
        .join(
            s.withColumnRenamed("host", "dst_host"), "dst_host", "left_anti"
        )
        .groupBy("dst_host")
        .agg(
            F.sum("n_links").cast("bigint").alias("seed_links"),
            F.countDistinct("src_host").cast("int").alias("n_seed_sources"),
        )
    )
    w = Window.orderBy(F.col("seed_links").desc(), F.col("dst_host").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select(F.col("dst_host").alias("host"), "seed_links", "n_seed_sources", "rank")
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """log2-bucketed degree distribution over the UNDIRECTED graph — the
    one-glance health check of a crawl's link structure: web graphs are
    power laws (straight line in log-log), so a missing tail means the
    crawler never escaped its seeds' neighborhoods and a bulging head
    means trap subtrees inflated degree-1 leaves. Buckets by
    ilog2(degree) (= length(bin(degree)) - 1, the repo's integer-log
    idiom), with exact min/max inside each bucket.

    Output (bucket, n_nodes, min_degree, max_degree), bucket k covering
    degrees [2^k, 2^{k+1}). One degree count + one bucket-cardinality
    groupBy (<= 64 rows out)."""
    und = _undirected(edges, drop_self=True)
    deg = und.groupBy("src").agg(F.count("*").cast("bigint").alias("degree"))
    bucket = (F.length(F.bin(F.col("degree"))) - 1).cast("int")
    return (
        deg.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )
    )


def degree_mixing(edges: DataFrame) -> DataFrame:
    """Degree-mixing matrix over the undirected graph — the integer form
    of degree assortativity: counts of edges by the log2 degree buckets
    of BOTH endpoints ((bucket_lo, bucket_hi), unordered so the matrix is
    upper-triangular). The web is disassortative (hubs link to leaves —
    mass off the diagonal); a spam farm is assortative (dense same-degree
    cores — mass ON a high-bucket diagonal cell), so this ≤64²-row table
    is the one-glance farm check that a scalar correlation coefficient
    (floats, engine-divergent) would blur. Self-loops excluded with
    degree_histogram's semantics.

    One degree table (node-cardinality) joined to both edge endpoints,
    then a bucket-pair rollup — edge-cardinality shuffle, tiny output."""
    und = _undirected(edges, drop_self=True)
    deg = und.groupBy("src").agg(F.count("*").cast("bigint").alias("degree"))
    bucket = (F.length(F.bin(F.col("degree"))) - 1).cast("int")
    bk = deg.select(F.col("src").alias("node"), bucket.alias("bucket"))
    # each undirected edge appears twice in `und` (both directions);
    # keep one orientation so every edge is counted once
    one_dir = und.filter(F.col("src") < F.col("dst"))
    joined = (
        one_dir.join(bk.withColumnsRenamed({"node": "src", "bucket": "b_src"}), "src")
        .join(bk.withColumnsRenamed({"node": "dst", "bucket": "b_dst"}), "dst")
    )
    return (
        joined.select(
            F.least("b_src", "b_dst").alias("bucket_lo"),
            F.greatest("b_src", "b_dst").alias("bucket_hi"),
        )
        .groupBy("bucket_lo", "bucket_hi")
        .agg(F.count("*").cast("bigint").alias("n_edges"))
    )
