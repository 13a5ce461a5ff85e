"""Mergeable frequency sketches — count-min over token streams.

At 100 TB you cannot afford an exact (token -> count) table just to answer
"which terms/hosts are heavy hitters": the distinct-key set is itself
corpus-scale. A count-min sketch compresses the whole stream into a fixed
d x w integer matrix with one-sided error (estimates only OVER-count, by at
most eps*N with probability 1-delta), and — the property that matters on a
cluster — it merges by cell-wise ADDITION, so each partition sketches
locally and the combine is a tiny fixed-size reduce, never a shuffle of the
key space. Cormode & Muthukrishnan 2005 (public algorithm).

Determinism contract (the oracle gate hashes values): the d hash functions
are fixed Carter-Wegman permutations over Mersenne-31 of the same
square-mod rolling-poly string hash MinHash uses (dedup._sql_str_hash31) —
every cell index is reproducible in DuckDB BIGINT SQL, so both the sketch
MATRIX and the estimates are value-exact across engines, not just "close".

Spark shape: build = explode rows x d -> groupBy(row, cell) sum — one
bounded shuffle of at most d*w distinct keys per partition after map-side
combine (the matrix, not the stream, crosses the wire). Probe = broadcast
the tiny sketch into the probe tokens and take min over d cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_woc_spark.operators.dedup import MERSENNE31, _sql_str_hash31


def _cell(h31, row: int, width: int):
    """Cell index of hash h31 in sketch row ``row`` (Carter-Wegman perm over
    M31, then mod width) — same permutation family as dedup._minhash_perm."""
    a = 2 * row + 3
    b = ((row + 1) * 2654435761) % MERSENNE31
    return F.pmod(F.pmod(h31 * F.lit(a) + F.lit(b), F.lit(MERSENNE31)), F.lit(width))


def count_min_build(tokens: DataFrame, depth: int = 4, width: int = 256) -> DataFrame:
    """Build the sketch from a ``token`` column: (row, cell, cnt), one
    record per NON-EMPTY cell (zero cells are implicit — the dense matrix
    is d*w ints however large the stream was)."""
    h31 = _sql_str_hash31(F.col("token"))
    hashed = tokens.select(h31.alias("h"))
    rows = hashed.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("row"), _cell(F.col("h"), r, width).alias("cell"))
                for r in range(depth)
            ])
        ).alias("rc")
    ).select("rc.row", "rc.cell")
    return rows.groupBy("row", "cell").agg(F.count("*").cast("bigint").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame, probes: DataFrame, depth: int = 4, width: int = 256
) -> DataFrame:
    """Estimate stream frequency for each probe ``token``:
    est = min over rows of sketch[row][cell(token, row)] (missing cell = 0).
    The sketch is broadcast — it is at most d*w rows by construction."""
    h31 = _sql_str_hash31(F.col("token"))
    probe_cells = probes.select(
        "token",
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("row"), _cell(h31, r, width).alias("cell"))
                for r in range(depth)
            ])
        ).alias("rc"),
    ).select("token", "rc.row", "rc.cell")
    joined = probe_cells.join(F.broadcast(sketch), ["row", "cell"], "left").select(
        "token", F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")).alias("cnt")
    )
    return joined.groupBy("token").agg(F.min("cnt").alias("est_count"))


def heavy_hitter_check(
    documents: DataFrame, probes: list[str], depth: int = 4, width: int = 256
) -> DataFrame:
    """Sketch the corpus token stream, then report estimate vs exact truth
    for the probe tokens: (token, est_count, true_count, overcount).
    overcount >= 0 always (count-min never under-counts) — the invariant a
    test can pin without fixing the error magnitude."""
    from webcrawler_woc_spark.operators.textstats import _tokens

    toks = documents.select(F.explode(_tokens(F.col("text"))).alias("token"))
    sketch = count_min_build(toks, depth, width)
    spark = documents.sparkSession
    probe_df = spark.createDataFrame([(p,) for p in probes], "token string")
    est = count_min_estimate(sketch, probe_df, depth, width)
    truth = (
        toks.join(F.broadcast(probe_df), "token")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("true_count"))
    )
    return (
        # truth is <= len(probes) rows by construction — broadcast, don't
        # let the planner guess (it picked SMJ from unknown agg sizes)
        est.join(F.broadcast(truth), "token", "left")
        .select(
            "token",
            "est_count",
            F.coalesce(F.col("true_count"), F.lit(0).cast("bigint")).alias("true_count"),
        )
        .withColumn("overcount", F.col("est_count") - F.col("true_count"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007, public algorithm)
# ---------------------------------------------------------------------------

HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_SUFFIX_BITS = 31 - HLL_P   # the 31-bit poly hash: top p bits pick the
HLL_ALPHA_PPM = 709000         # register, the rest feed rho; alpha_64 = .709


def _rho(suffix) -> "F.Column":
    """Position of the first 1-bit (from the MSB) of the SUFFIX_BITS-wide
    value, 1-based; all-zero suffix => SUFFIX_BITS + 1. A generated when-
    chain — pure integer comparisons, identical in the SQL twin."""
    chain = None
    for k in range(1, HLL_SUFFIX_BITS + 1):
        cond = suffix >= (1 << (HLL_SUFFIX_BITS - k))
        chain = F.when(cond, k) if chain is None else chain.when(cond, k)
    return chain.otherwise(HLL_SUFFIX_BITS + 1)


def hll_registers(values: DataFrame) -> DataFrame:
    """Dense register table (reg, max_rho) for a ``value`` string column.
    Merge rule is MAX per register — order-independent and mergeable across
    partitions/sketches (union then max), the dual of count-min's addition.
    Registers never touched carry max_rho = 0."""
    h = _sql_str_hash31(F.col("value"))
    reg = F.expr(f"h div {1 << HLL_SUFFIX_BITS}")
    suffix = F.pmod(F.col("h"), F.lit(1 << HLL_SUFFIX_BITS))
    sparse = (
        values.select(h.alias("h"))
        .select(reg.alias("reg"), _rho(suffix).alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )
    spark = values.sparkSession
    dense = spark.range(HLL_M).select(F.col("id").cast("bigint").alias("reg"))
    return dense.join(sparse, "reg", "left").select(
        "reg", F.coalesce(F.col("max_rho"), F.lit(0)).cast("int").alias("max_rho")
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Raw HLL estimate from the dense register table, ALL-INTEGER: the
    harmonic sum is computed as S = sum(2^(SUFFIX_BITS+1 - max_rho)) (every
    term an exact int, order-independent), and the estimate as a fixed
    integer-division sequence — bit-identical in the oracle. Raw estimator
    only: the small/large-range corrections of the paper are documented
    non-goals (they change accuracy, not the sketch contract).
    Output one row: (hll_estimate, n_zero_registers)."""
    b = HLL_SUFFIX_BITS + 1
    # exact power of two via shift, never float pow
    term = F.expr(f"shiftleft(cast(1 as bigint), {b} - max_rho)")
    agg = registers.agg(
        F.sum(term).alias("s"),
        F.sum((F.col("max_rho") == 0).cast("int")).alias("n_zero_registers"),
    )
    num = HLL_ALPHA_PPM * HLL_M * HLL_M * (1 << b)
    return agg.select(
        F.expr(f"({num} div s) div 1000000").cast("bigint").alias("hll_estimate"),
        F.col("n_zero_registers").cast("int").alias("n_zero_registers"),
    )


def distinct_count_check(values: DataFrame) -> DataFrame:
    """HLL estimate vs exact distinct for a ``value`` column, one row:
    (exact_distinct, hll_estimate, n_zero_registers). The exact side is the
    expensive global distinct the sketch exists to avoid — here it is the
    oracle-checkable ground truth."""
    est = hll_estimate(hll_registers(values))
    exact = values.agg(F.countDistinct("value").cast("bigint").alias("exact_distinct"))
    return exact.crossJoin(est)


def log2_quantile_sketch(
    values: DataFrame, value_col: str = "v", quantiles: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """Mergeable QUANTILE sketch over positive integers — the third sketch
    family member (count-min: frequencies by addition; HLL: distinct by MAX;
    this: quantiles by bucket-count addition). DDSketch-class (Masson et al.
    2019) with the coarsest deterministic bucketing: bucket = floor(log2(v)),
    computed EXACTLY as length(bin(v)) - 1 — pure integer, no float log
    whose boundary rounding could differ across engines. Relative error is
    bounded by the bucket width (estimate = bucket lower bound 2^b, true
    value < 2^(b+1)); finer gamma needs only more buckets.

    Why a sketch when exact_percentiles exists: the exact rank-selection
    needs a full sort per group; the histogram is ~64 counts TOTAL however
    large the stream, merges by addition across partitions/days/shards, and
    answers any quantile after the fact. The (<= 64)-row cumulative window
    here is driver-scale by construction — the sketch, not the stream.

    Output one row: (n, p{q}_bucket, p{q}_lo for each q) — all integers;
    rank arithmetic matches exact_percentiles (target = (n-1)*q div 100 + 1).
    """
    from pyspark.sql import Window

    b = (F.length(F.bin(F.col(value_col).cast("bigint"))) - 1).cast("int")
    hist = (
        values.filter(F.col(value_col) > 0)
        .groupBy(b.alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = hist.select(
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    aggs = [F.max("n").alias("n")]
    for q in quantiles:
        target = F.expr(f"((n - 1) * {q}) div 100 + 1")
        aggs.append(
            F.min(F.when(F.col("cum") >= target, F.col("bucket"))).alias(f"p{q}_bucket")
        )
    out = c.agg(*aggs)
    cols = [F.col("n")]
    for q in quantiles:
        cols.append(F.col(f"p{q}_bucket"))
        cols.append(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), p{q}_bucket)").alias(f"p{q}_lo")
        )
    return out.select(*cols)


def kmv_distinct(values: DataFrame, group_col: str = "host",
                 value_col: str = "value", k: int = 64) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch per group —
    Bar-Yossef et al. 2002 (public algorithm): keep the k smallest DISTINCT
    hash values of a stream; if the kth-smallest is h_k over a hash space
    of size M, the stream held ~ (k-1) * M / h_k distinct values. The
    property that matters at 100 TB: the sketch is a bottom-k SET, so it
    merges by union+truncate — per-partition bottom-k then one tiny
    combine, the key space never shuffles (same story as count-min; HLL
    trades accuracy shape for even less state, KMV gives an unbiased
    estimator AND a uniform sample of the distinct values for free).

    Hash = the square-mod rolling-poly over the value string (the
    MinHash/count-min hash — DuckDB-reproducible, which is what makes the
    ESTIMATE value-exact across engines, not just close). Output per
    group: (group, n_seen_distinct_hashes capped at k, kth_min,
    est_distinct — exact count when the group holds < k distinct hashes,
    else the KMV formula in integer arithmetic).

    Plan: hash projection -> distinct -> per-group bottom-k via window
    row_number (partial: at scale swap for groupBy + sort_array(slice)
    partial-agg form; window form is the exact gate plan).
    """
    from pyspark.sql import Window

    h = _sql_str_hash31(F.col(value_col))
    hashes = values.select(
        F.col(group_col).alias("grp"), h.alias("h31")
    ).distinct()
    w = Window.partitionBy("grp").orderBy(F.col("h31").asc())
    topk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("grp")
        .agg(
            F.count("*").cast("int").alias("n_kept"),
            F.max("h31").alias("kth_min"),
        )
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("bigint")
    ).otherwise(
        F.expr(f"(CAST({k - 1} AS BIGINT) * {MERSENNE31}) div kth_min")
    )
    return topk.select(
        F.col("grp").alias(group_col),
        "n_kept",
        "kth_min",
        est.alias("est_distinct"),
    )
