"""CDX range-partitioned URL capture index: write layout, pruned prefix
lookup, within-file sort order."""

from __future__ import annotations

import datetime
import glob
import json
import os
import re

import pytest
from pyspark.sql import functions as F

from webcrawler_woc_spark.operators.cdx import (
    CDX_META,
    _select_ranges,
    build_cdx,
    lookup_cdx,
    write_cdx,
)

N_RANGES = 4


def _captures(spark, n=120):
    rows = [
        (
            f"http://host{i % 6}.example/page/{i}",
            datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=i * 37),
        )
        for i in range(n)
    ] + [("mailto:a@b.example", datetime.datetime(2026, 1, 1))]
    return spark.createDataFrame(rows, "url string, capture_ts timestamp")


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cdx") / "idx")
    cdx = build_cdx(_captures(spark))
    write_cdx(cdx, path, n_ranges=N_RANGES)
    return path, cdx


class TestWriteLayout:
    def test_range_dirs_and_meta(self, layout):
        path, _ = layout
        dirs = {d for d in os.listdir(path) if d.startswith("range_id=")}
        assert 1 <= len(dirs) <= N_RANGES
        meta = json.load(open(os.path.join(path, CDX_META)))
        assert meta["n_ranges"] == N_RANGES
        # bounds are disjoint and ordered (range partitioner guarantees)
        bounds = meta["bounds"]
        for (_, _, hi_prev), (_, lo_next, _) in zip(bounds, bounds[1:]):
            assert hi_prev <= lo_next

    def test_non_hierarchical_urls_dropped(self, layout):
        _, cdx = layout
        assert cdx.filter(F.col("url").startswith("mailto:")).count() == 0

    def test_files_sorted_within_range(self, layout):
        """The at-rest contract: each range file is sorted by (surt, epoch)
        — FileFormatWriter must not have re-sorted by partition col only."""
        import pyarrow.parquet as pq

        path, _ = layout
        checked = 0
        for f in glob.glob(os.path.join(path, "range_id=*", "*.parquet")):
            t = pq.read_table(f, columns=["surt", "epoch"]).to_pylist()
            keys = [(r["surt"], r["epoch"]) for r in t]
            assert keys == sorted(keys), f
            checked += 1
        assert checked >= 1


class TestLookup:
    def test_prefix_lookup_matches_filter(self, spark, layout):
        path, cdx = layout
        got = {
            (r.surt, r.epoch, r.url)
            for r in lookup_cdx(spark, path, "example,host3)").collect()
        }
        want = {
            (r.surt, r.epoch, r.url)
            for r in cdx.filter(F.col("surt").startswith("example,host3)")).collect()
        }
        assert got == want and len(want) == 20

    def test_epoch_window(self, spark, layout):
        path, cdx = layout
        lo = int(datetime.datetime(2026, 1, 1).timestamp()) + 1000
        got = lookup_cdx(spark, path, "example,host3)", epoch_min=lo).collect()
        assert all(r.epoch >= lo for r in got)
        assert len(got) < 20

    def test_unmatched_prefix_empty(self, spark, layout):
        path, _ = layout
        assert lookup_cdx(spark, path, "zzz,nohost)").count() == 0

    def test_select_ranges_prunes(self, layout):
        path, _ = layout
        meta = json.load(open(os.path.join(path, CDX_META)))
        all_ids = [rid for rid, _, _ in meta["bounds"]]
        picked = _select_ranges(meta, "example,host3)/page/7")
        assert set(picked) <= set(all_ids)
        # a narrow prefix must not need every range
        assert len(picked) < len(all_ids)

    def test_static_partition_filter_in_plan(self, spark, layout):
        path, _ = layout
        df = lookup_cdx(spark, path, "example,host3)")
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "range_id" in m.group(1), plan
