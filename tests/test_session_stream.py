"""Streaming session-window tests: merge-across-batches and the inclusive
exact-gap boundary (a gap of exactly 30:00 still MERGES; > 30:00 splits)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_woc_spark.streaming.session_stream import GAP_US


def _run(spark, tmp_path, rows):
    """rows = [(user_id, epoch_us)] staged as 2 data files + 2 sentinels."""
    import os

    from webcrawler_woc_spark.streaming.session_stream import (
        session_result,
        stream_user_sessions,
    )

    d = str(tmp_path / "ev")
    df = spark.createDataFrame(rows, "user_id bigint, us bigint").select(
        "user_id", F.timestamp_micros("us").alias("ts")
    )
    df.repartition(2).write.parquet(d)
    base = 1_000_000_000
    seen = set()
    for p in os.listdir(d):
        if p.startswith("part-"):
            os.utime(f"{d}/{p}", (base, base))
            seen.add(p)
    for i, uid in enumerate((-1, -2)):
        spark.createDataFrame([(uid,)], "user_id bigint").select(
            "user_id", F.lit(f"2100-01-0{i + 1} 00:00:00").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(d)
        # track staged parts so sentinel 1 is not re-stamped with sentinel
        # 2's mtime (a getmtime>base check would re-touch it and lose the
        # strict ordering)
        for p in os.listdir(d):
            if p.startswith("part-") and p not in seen:
                os.utime(f"{d}/{p}", (base + 3600 * (i + 1), base + 3600 * (i + 1)))
                seen.add(p)
    q = stream_user_sessions(spark, d, "sess_test")
    q.awaitTermination(300)
    return {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in session_result(spark, "sess_test").collect()
    }


def test_exact_gap_merges_and_over_gap_splits(spark, tmp_path):
    t0 = 1_700_000_000_000_000
    rows = [
        (1, t0),
        (1, t0 + GAP_US),             # exactly 30:00 later -> still SAME session
        (1, t0 + 2 * GAP_US + 1),     # 30:00.000001 after previous -> NEW session
        (2, t0),                      # other user: independent state key
    ]
    got = _run(spark, tmp_path, rows)
    assert got == {
        (1, t0): (t0 + 2 * GAP_US, 2),
        (1, t0 + 2 * GAP_US + 1): (t0 + 3 * GAP_US + 1, 1),
        (2, t0): (t0 + GAP_US, 1),
    }
