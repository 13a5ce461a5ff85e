"""Temporal join tests: as-of semantics (inclusive boundary, latest-prior,
per-key isolation, null when none) and bucketed range-join boundaries."""

from __future__ import annotations


def test_asof_join_semantics(spark):
    from webcrawler_woc_spark.operators.temporal import asof_join

    probes = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 250), (3, 10, 300), (4, 20, 500)],
        "event_id bigint, user_id bigint, us bigint",
    )
    builds = spark.createDataFrame(
        [(10, 250, 7), (10, 90, 5), (20, 600, 9)],
        "user_id bigint, us bigint, purchase_id bigint",
    )
    out = {
        r.event_id: r.asof_purchase_id
        for r in asof_join(
            probes, builds, key="user_id", time="us", build_cols=["purchase_id"]
        ).collect()
    }
    assert out == {
        1: 5,     # only the us=90 build precedes us=100
        2: 7,     # build at EXACTLY probe time matches (inclusive)
        3: 7,     # latest prior wins over the earlier one
        4: None,  # user 20's only build is later -> no match
    }


def test_range_join_boundaries_and_bucket_spans(spark):
    from webcrawler_woc_spark.operators.temporal import interval_count_join

    # interval [3500, 7300) spans buckets 0 and 1 and 2 (3600s buckets)
    intervals = spark.createDataFrame(
        [(1, 0, 3500, 7300), (1, 1, 100, 200), (2, 0, 0, 3600)],
        "user_id bigint, win_id int, start_ep bigint, end_ep bigint",
    )
    points = spark.createDataFrame(
        [(1, 3499), (1, 3500), (1, 7299), (1, 7300), (1, 5000), (2, 0), (2, 3599), (2, 3600)],
        "user_id bigint, ep bigint",
    )
    got = {(r.user_id, r.win_id): r.n_points for r in
           interval_count_join(intervals, points, key="user_id").collect()}
    assert got == {
        (1, 0): 3,  # 3500 (inclusive start), 5000, 7299; 3499 and 7300 out
        (1, 1): 0,  # zero-hit interval preserved
        (2, 0): 2,  # 0 and 3599; 3600 excluded (exclusive end)
    }


def test_asof_join_null_field_does_not_tear_rows(spark):
    """A NULL field in the MATCHED build row must stay NULL — filling
    columns independently would fall through to an older build's value,
    fabricating a row that never existed (DuckDB ASOF returns the t=100
    row with its NULL intact)."""
    from webcrawler_woc_spark.operators.temporal import asof_join

    probes = spark.createDataFrame([(1, 10, 150)], "event_id bigint, user_id bigint, us bigint")
    builds = spark.createDataFrame(
        [(10, 100, None, 111), (10, 50, 7, 222)],
        "user_id bigint, us bigint, val bigint, other bigint",
    )
    r = asof_join(probes, builds, key="user_id", time="us", build_cols=["val", "other"]).head()
    assert (r.asof_val, r.asof_other) == (None, 111)  # t=100 row verbatim, no mixing
