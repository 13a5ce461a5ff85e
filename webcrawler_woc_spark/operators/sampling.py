"""Training-mix operators: deterministic stratified sampling and sequence
packing — the two steps between a curated corpus and an actual pretraining
data loader (mix rates per language/source, then concat-and-chunk into
fixed token budgets).

Both are pure Catalyst and integer-exact, so the DuckDB oracle checks values.

Scale notes:
* sampling is a stateless per-row predicate (hash of doc_id) — no shuffle,
  fully parallel, reproducible across runs/engines (no RNG state, unlike
  ``df.sample`` whose split depends on partitioning);
* packing runs per shard when ``shard_col`` is given (window PARTITION BY
  shard — fully parallel, the 100 TB form); the ``shard_col=None`` global
  stream is the pinned single-shard contract and is a single task by
  construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1


def _sample_hash(doc_id):
    """Square-mod avalanche over doc_id (plain ``doc_id % 100`` would
    correlate with any id-derived stratum; squaring decorrelates). Identical
    integer math in the SQL oracle."""
    m = F.pmod(doc_id, F.lit(MERSENNE31))
    return F.pmod(m * m, F.lit(MERSENNE31))


def stratified_sample(
    documents: DataFrame,
    strata_col: str = "lang",
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 100,
) -> DataFrame:
    """Keep each row iff ``hash(doc_id) % 100 < pct(stratum)`` — the
    deterministic per-stratum downsampling a training mix is built from
    (e.g. keep 60% of en, 30% of de, all of everything else).

    Returns the sampled rows unchanged (plus no extra columns).
    """
    rates_pct = rates_pct or {}
    pct = F.lit(default_pct)
    for stratum, rate in sorted(rates_pct.items()):
        pct = F.when(F.col(strata_col) == stratum, F.lit(rate)).otherwise(pct)
    return documents.filter(F.pmod(_sample_hash(F.col("doc_id")), F.lit(100)) < pct)


def pack_sequences(
    documents: DataFrame,
    budget_tokens: int = 2048,
    order_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    ``order_col`` order as one token stream and cut every ``budget_tokens``
    — each doc gets the bin it STARTS in and its offset there (docs may
    straddle bins; that is the standard pretraining packing contract).

    ``shard_col`` is the scale switch: with a shard key the running sum is
    ``Window.partitionBy(shard_col)`` — one independent token stream per
    shard, fully parallel (this is how a 100 TB corpus packs: shard by
    source/date/hash first, pack within shards). With ``None`` (the pinned
    single-stream contract) the whole input is ONE stream and the window is
    global — a single task; only ever use that form on one shard's worth of
    data.

    Output ([shard_col,] doc_id, n_tokens, bin_id, offset_in_bin) — all
    integers; bin_id restarts at 0 within each shard.
    """
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    keys = [shard_col] if shard_col else []
    t = documents.select(*keys, "doc_id", F.size(toks).cast("bigint").alias("n_tokens"))
    w = Window.orderBy(F.asc(order_col)).rowsBetween(Window.unboundedPreceding, -1)
    if shard_col:
        w = Window.partitionBy(shard_col).orderBy(F.asc(order_col)).rowsBetween(
            Window.unboundedPreceding, -1
        )
    cum0 = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    return t.select(
        *keys,
        "doc_id",
        "n_tokens",
        cum0.alias("_cum0"),
    ).select(
        *keys,
        "doc_id",
        "n_tokens",
        F.expr(f"CAST(_cum0 div {budget_tokens} AS BIGINT)").alias("bin_id"),
        F.pmod(F.col("_cum0"), F.lit(budget_tokens)).cast("bigint").alias("offset_in_bin"),
    )


def exact_percentiles(
    df: "DataFrame", group: str, value, quantiles: list[int], tiebreak: str
) -> "DataFrame":
    """Exact per-group percentiles by RANK SELECTION, engine-deterministic:
    the q-th percentile is the element at 1-based rank floor((n-1)*q/100)+1
    of the group sorted by (value, tiebreak) — no interpolation, no
    approx sketch, identical arithmetic in any engine (quantile functions
    differ across engines in boundary/interpolation rules; rank selection
    does not). One window shuffle on the group key.

    Output: (group, n, p<q> for each q)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(F.col("v").asc(), F.col(tiebreak).asc())
    base = df.select(group, value.alias("v"), tiebreak).select(
        group,
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(group)).alias("n"),
    )
    aggs = [F.max("n").cast("bigint").alias("n")]
    for q in quantiles:
        # all-integer rank arithmetic (div, never float multiply)
        target = F.expr(f"((n - 1) * {q}) div 100 + 1")
        aggs.append(
            F.max(F.when(F.col("rn") == target, F.col("v"))).alias(f"p{q}")
        )
    return base.groupBy(group).agg(*aggs)


def mixture_weights(
    documents: DataFrame, group_col: str = "lang", total_target: int = 100_000
) -> DataFrame:
    """Alpha-temperature mixture re-weighting (alpha = 0.5) over a corpus
    facet — the multilingual-LM sampling rule (sample p_i ^ alpha, then
    renormalize) that up-weights tail languages/domains against the head,
    as used by the CCNet/mC4 lineage. weight = floor(sqrt(n_docs)): IEEE
    sqrt is correctly rounded, so floor(sqrt) over counts < 2^52 is
    bit-identical across engines; everything after is integer div.

    Output per group: (group, n_docs, weight_ppm, target_n) where
    weight_ppm = w * 10^6 div sum(w) and target_n = min(n_docs,
    total_target * w div sum(w)) — the actual per-group draw size, capped
    at availability (a tail group can't supply more than it has).

    Scale shape: one partial-agg'd groupBy to counts (rows = number of
    groups, tiny), then a 1-row sum broadcast crossJoin — the same shape
    as the LM-score normalizer. Nothing corpus-sized after the first agg."""
    counts = documents.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").alias("n_docs")
    )
    w = counts.withColumn("w", F.floor(F.sqrt(F.col("n_docs"))).cast("bigint"))
    tot = w.agg(F.sum("w").alias("w_total"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "group",
            "n_docs",
            F.expr("(w * 1000000) div w_total").alias("weight_ppm"),
            F.least(
                F.col("n_docs"), F.expr(f"({total_target} * w) div w_total")
            ).alias("target_n"),
        )
    )


def chunk_passages(documents: DataFrame, window: int = 64, stride: int = 48) -> DataFrame:
    """Overlapping passage chunking — the retrieval/packing prep step that
    slices each document's token stream into windows of ``window`` tokens
    every ``stride`` tokens (overlap = window - stride). Tokenization is the
    shared whitespace kernel (textstats._tokens) so chunk token counts tie
    out against token_counts budgets.

    Chunk count per doc: 1 + ceil(max(n_tokens - window, 0) / stride) for
    n_tokens >= 1; zero-token docs emit no chunks (there is no text to
    retrieve). The final chunk may be shorter than ``window``; when
    (n - window) % stride != 0 the last two chunks overlap more — standard
    sliding-window semantics, identical in the SQL oracle.

    Output: (doc_id, chunk_id, n_tokens, chunk_text), chunk_id 0-based.

    Scale shape: pure Catalyst per row — transform(sequence(...)) + slice +
    concat_ws inside one projection, then a single posexplode bounded by
    total chunk count (~corpus tokens / stride). No shuffle at all: chunking
    is embarrassingly parallel and stays in whole-stage codegen."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    from webcrawler_woc_spark.operators.textstats import _tokens

    n = F.size(F.col("_t"))
    # ceil div for non-negative ints: (x + stride - 1) div stride
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.expr(f"(greatest(size(_t) - {window}, 0) + {stride - 1}) div {stride}")
    )
    # sequence(0, -1) DESCENDS in Spark — gate the empty case with `when`
    chunks = F.when(
        F.col("_nc") > 0,
        F.expr(
            f"transform(sequence(0, CAST(_nc AS INT) - 1), "
            f"i -> struct(i AS chunk_id, slice(_t, i * {stride} + 1, {window}) AS ct))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<chunk_id:int,ct:array<string>>>"))
    return (
        # NULL text tokenizes to NULL, and NULL-propagating chunk arithmetic
        # would leak one phantom chunk (greatest() SKIPS nulls) — treat as ''
        documents.select("doc_id", _tokens(F.coalesce(F.col("text"), F.lit(""))).alias("_t"))
        .withColumn("_nc", n_chunks)
        .select("doc_id", F.explode(chunks).alias("_c"))
        .select(
            "doc_id",
            F.col("_c.chunk_id").alias("chunk_id"),
            F.size("_c.ct").alias("n_tokens"),
            F.concat_ws(" ", F.col("_c.ct")).alias("chunk_text"),
        )
    )


# rendezvous weight arithmetic: v stays < RV_P ~ 3e9, so v*v < 9.1e18 fits
# int64 exactly — the identical expression runs in DuckDB BIGINT
RV_P = 3_000_000_019  # prime
RV_K1 = 2_654_435_761 % RV_P  # Knuth multiplicative constant
RV_K2 = 40_503


def _rv_weight_sql(doc_expr: str, shard_expr: str) -> str:
    """Square-mod avalanche over (doc, shard) — engine-portable ANSI
    arithmetic (no xxhash in DuckDB). Shared verbatim by the Spark expr and
    the oracle twin."""
    # reduce the key mod RV_P BEFORE the multiply: raw_key * RV_K1 overflows
    # int64 for keys >= ~3.48e9 (below the 10^10 design point); after the
    # reduction the product is < RV_P * RV_K1 ~ 7.9e18, inside int64
    v = f"((({doc_expr}) % {RV_P}) * {RV_K1} + (({shard_expr}) + 1) * {RV_K2}) % {RV_P}"
    return f"(({v}) * ({v}) + 7) % {RV_P}"


def rendezvous_shards(df: DataFrame, n_shards: int, key_col: str = "doc_id") -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — stable routing
    of documents to processing shards such that growing the fleet from n to
    n+1 shards moves ONLY the documents the new shard wins (~1/(n+1) of the
    corpus), never reshuffles survivors between old shards. The property a
    long-lived incremental pipeline needs: mod-N assignment remaps ~all keys
    on every resize; rendezvous remaps the theoretical minimum.

    Output: (key, shard, weight) — shard = argmin-index-of-max weight over
    shard ids 0..n_shards-1 (first max wins: array_position returns the
    first occurrence, so ties break to the lowest shard id in both engines).

    Scale shape: zero shuffle, zero joins — a per-row O(n_shards) pure
    Catalyst transform over a sequence literal, entirely inside whole-stage
    codegen. The weight function is integer square-mod avalanche (see
    _rv_weight_sql) so the DuckDB oracle computes bit-identical weights."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    wsql = _rv_weight_sql(key_col, "s")
    weights = F.expr(f"transform(sequence(0, {n_shards - 1}), s -> {wsql})")
    return df.select(F.col(key_col), weights.alias("_w")).select(
        key_col,
        (F.expr("array_position(_w, array_max(_w))") - 1).cast("int").alias("shard"),
        F.expr("array_max(_w)").alias("weight"),
    )


def host_cap_sample(documents: DataFrame, host_col: str = "host", cap: int = 100) -> DataFrame:
    """Per-host document quota — the C4-style domain cap: without one, a
    handful of mega-hosts (wikis, forums, e-commerce catalogs) dominate
    the training mix and the model learns their template instead of the
    web. Keep at most ``cap`` docs per host, chosen DETERMINISTICALLY by
    the square-mod sample hash (not "first N seen" — arrival order is a
    crawl-schedule artifact and would bias toward each host's homepage
    neighborhood) with doc_id as the total tiebreak.

    Returns surviving rows with a ``host_rank`` column (1-based position
    in the host's keep order — downstream quota tightening filters on it
    WITHOUT re-ranking).

    One window rank per host partition. Hot hosts make hot partitions:
    at 100 TB pre-aggregate with a two-level trick — a first pass counts
    per (host, hash-bucket) so only buckets straddling the cap boundary
    need the exact sort; the gate form is the exact single-window plan.
    """
    w = Window.partitionBy(host_col).orderBy(
        _sample_hash(F.col("doc_id")).asc(), F.col("doc_id").asc()
    )
    return (
        documents.withColumn("host_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("host_rank") <= cap)
    )


EPOCH_P1 = 2_654_435_761  # Knuth multiplicative constants, mod M31
EPOCH_P2 = 40_503


def epoch_shuffle(documents: DataFrame, epoch: int) -> DataFrame:
    """Deterministic per-epoch global shuffle order — multi-epoch training
    must reshuffle between epochs (fixed order overfits batch composition)
    but REPRODUCIBLY (a resumed run must see the identical stream), so the
    order is a pure function of (doc_id, epoch): rank by
    square-mod(doc_id * P1 + epoch * P2) with doc_id as total tiebreak.

    Output (doc_id, position) — position is the 1-based stream index for
    the epoch.

    The gate form is one global sort (row_number over the hash): exact
    and fine at test scale. At 100 TB a global total order is an
    anti-pattern — the production form writes ``pmod(hash, n_shards)`` as
    a bucket column and sorts WITHIN shards (readers consume shards in
    round-robin), which this operator's hash makes a one-line swap; the
    contract (epoch-keyed determinism) is identical."""
    m = F.pmod(
        F.col("doc_id") * F.lit(EPOCH_P1) + F.lit(epoch) * F.lit(EPOCH_P2),
        F.lit(MERSENNE31),
    )
    h = F.pmod(m * m, F.lit(MERSENNE31))
    w = Window.orderBy(h.asc(), F.col("doc_id").asc())
    return documents.select("doc_id").withColumn(
        "position", F.row_number().over(w).cast("bigint")
    )


def shard_balance(df: DataFrame, n_shards: int, key_col: str = "doc_id") -> DataFrame:
    """Shard-balance audit over the rendezvous assignment: per shard
    (shard, n_keys) plus the fleet-level readout repeated on every row —
    min/max shard sizes and imbalance_ppm = (max - min) * 1e6 div
    max(min, 1). Hash sharding is balanced only in expectation;
    the pipeline that packs sequences per shard (pack_sequences_sharded)
    stalls on its largest shard, so the imbalance number IS the straggler
    forecast. Empty shards (possible at small corpora) appear with
    n_keys = 0 — an absent row would hide exactly the pathology this
    audit exists to catch.

    One groupBy(shard) over the zero-shuffle assignment + a 1-row
    min/max broadcast (the makespan pattern)."""
    assigned = rendezvous_shards(df, n_shards, key_col=key_col)
    counts = assigned.groupBy("shard").agg(F.count("*").cast("bigint").alias("n_keys"))
    spark = df.sparkSession
    all_shards = spark.range(n_shards).select(F.col("id").cast("int").alias("shard"))
    full = (
        all_shards.join(counts, "shard", "left")
        .withColumn("n_keys", F.coalesce(F.col("n_keys"), F.lit(0).cast("bigint")))
    )
    agg = full.agg(
        F.min("n_keys").alias("min_keys"), F.max("n_keys").alias("max_keys")
    )
    return (
        full.crossJoin(F.broadcast(agg))
        .withColumn(
            "imbalance_ppm",
            F.expr("((max_keys - min_keys) * 1000000) div greatest(min_keys, 1)").cast("bigint"),
        )
        .select("shard", "n_keys", "min_keys", "max_keys", "imbalance_ppm")
    )
