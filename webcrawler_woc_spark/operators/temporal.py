"""Temporal joins Spark lacks as primitives: AS-OF join and range join.

Both are implemented as compositions of existing DataFrame ops (the
preferred custom-operator strategy) with the physical shape chosen for
100 TB, not the naive inequality join:

* **as-of join** — "probe row matches the most recent build row at or
  before its timestamp, per key". The naive plan (theta-join on
  ``b.t <= p.t`` + argmax) is a per-key cross product. The scalable plan is
  the UNION-WINDOW form: tag both streams, union them, and run one
  ``last(value, ignorenulls)`` window per key ordered by (time, side) — a
  single hash shuffle on the key and one sort, O(n log n) per partition,
  no pairwise blowup. Build rows sort before probe rows at equal
  timestamps, so the match is INCLUSIVE (build.t == probe.t matches),
  mirroring DuckDB's ``ASOF JOIN ... ON p.t >= b.t`` — which is exactly
  what the oracle runs as the independent twin.

* **range join** — "count/collect points inside [start, end) intervals per
  key". The naive plan is again a theta-join. The scalable plan buckets
  time: intervals explode into the fixed-width buckets they cover, points
  map to their single bucket, and an EQUI-join on (key, bucket) + residual
  range filter does the rest. Each (point, interval) pair meets exactly
  once (a point lives in one bucket), so no dedup; the join is broadcast
  when the interval side is small, shuffle-hash otherwise. Spark's own
  optimizer has no interval-bucketing rewrite — this is the standard
  hand-rolled one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    builds: DataFrame,
    key: str,
    time: str,
    build_cols: list[str],
) -> DataFrame:
    """Probe rows + the latest build row with build.time <= probe.time per
    key (inclusive). ``build_cols`` are carried from the matched build row
    as ``asof_<name>`` (null when no build precedes the probe).

    Builds MUST be unique per (key, time) — pre-aggregate duplicates first
    (an arbitrary-tie as-of is nondeterministic in any engine).

    The carried build columns travel as ONE struct, filled with a single
    last(ignorenulls) — filling each column independently would tear rows
    (a NULL field in the matched build row would fall through to an OLDER
    build's value, fabricating a row that never existed and diverging from
    ASOF semantics)."""
    b = builds.select(
        key,
        time,
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in build_cols]).alias("_b"),
    )
    p = probes.withColumn("_side", F.lit(1)).withColumn(
        "_b", F.lit(None).cast(b.schema["_b"].dataType)
    )
    for c in probes.columns:
        if c not in (key, time):
            b = b.withColumn(c, F.lit(None).cast(probes.schema[c].dataType))
    u = p.unionByName(b)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in probes.columns],
        "_side",
        F.last("_b", ignorenulls=True).over(w).alias("_b"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *[c for c in probes.columns],
        *[F.col(f"_b.{c}").alias(f"asof_{c}") for c in build_cols],
    )


def interval_count_join(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    bucket_sec: int = 3600,
    broadcast_counts: bool = True,
) -> DataFrame:
    """Count points with ``ep`` in [start_ep, end_ep) per interval row:
    (key, win_id, start_ep, end_ep, n_points) — zero-point intervals kept;
    EMPTY/inverted intervals (end <= start) are emitted with n_points = 0
    and never explode (an inverted interval would otherwise generate a huge
    DESCENDING bucket sequence).

    Plan: intervals explode to covered buckets (bounded by interval length /
    bucket_sec), equi-join on (key, bucket) with the residual range filter,
    partial-agg'd count, then intervals LEFT JOIN the per-interval counts to
    restore the zeros. ``broadcast_counts`` (default True) broadcasts that
    counts side — bounded by the interval count, so set it False when the
    interval side is itself huge and let the join shuffle."""
    b = bucket_sec
    exploded = intervals.filter(F.col("end_ep") > F.col("start_ep")).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"start_ep div {b}"), F.expr(f"(end_ep - 1) div {b}")
            )
        ),
    )
    pts = points.withColumn("bucket", F.expr(f"ep div {b}"))
    hits = (
        exploded.join(pts, [key, "bucket"])
        .filter((F.col("ep") >= F.col("start_ep")) & (F.col("ep") < F.col("end_ep")))
        .groupBy(key, "win_id")
        .agg(F.count("*").cast("bigint").alias("n_points"))
    )
    hits = F.broadcast(hits) if broadcast_counts else hits
    return intervals.join(hits, [key, "win_id"], "left").select(
        key,
        "win_id",
        "start_ep",
        "end_ep",
        F.coalesce(F.col("n_points"), F.lit(0).cast("bigint")).alias("n_points"),
    )
