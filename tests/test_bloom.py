"""Property tests for the partitioned Bloom seen-set (SURVEY.md §5.2-4)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webcrawler_woc_spark.operators.bloom import PartitionedBloom


class TestBloomProperties:
    @given(
        st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=500),
        st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=100),
    )
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives(self, added, probed):
        """A Bloom filter NEVER misses an added hash (a false negative would
        silently re-crawl or drop a URL)."""
        bloom = PartitionedBloom(n_buckets=4, m_bits=1 << 12, k=4)
        bloom.add_hashes(np.array(added, dtype=np.int64))
        result = bloom.might_contain(np.array(added, dtype=np.int64))
        assert result.all() or len(added) == 0

    @given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=200, unique=True))
    @settings(max_examples=30, deadline=None)
    def test_empty_filter_rejects_everything(self, hashes):
        bloom = PartitionedBloom(n_buckets=4, m_bits=1 << 12, k=4)
        assert not bloom.might_contain(np.array(hashes, dtype=np.int64)).any()

    def test_false_positive_rate_sane(self):
        rng = np.random.default_rng(42)
        bloom = PartitionedBloom(n_buckets=8, m_bits=1 << 16, k=4)
        added = rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64)
        bloom.add_hashes(added)
        fresh = rng.integers(-(2**63), 2**63 - 1, size=10000, dtype=np.int64)
        fresh = np.setdiff1d(fresh, added)
        fp = bloom.might_contain(fresh).mean()
        # 2000 keys over 8 x 65536 bits, k=4 => theoretical fp ~1e-5
        assert fp < 0.01

    def test_save_load_roundtrip(self, tmp_path):
        bloom = PartitionedBloom(n_buckets=4, m_bits=1 << 12, k=3)
        h = np.array([1, -5, 2**40, -(2**60)], dtype=np.int64)
        bloom.add_hashes(h)
        path = str(tmp_path / "bloom.npz")
        bloom.save(path)
        loaded = PartitionedBloom.load(path)
        assert loaded.n_buckets == 4 and loaded.m_bits == 1 << 12 and loaded.k == 3
        assert loaded.might_contain(h).all()
        for b in range(4):
            assert (loaded.bitmaps[b] == bloom.bitmaps[b]).all()

    def test_bucket_matches_spark_pmod(self):
        """np.mod on int64 == Spark pmod semantics (non-negative result)."""
        h = np.array([-7, -1, 0, 5, -(2**63)], dtype=np.int64)
        assert list(np.mod(h, 4)) == [1, 3, 0, 1, 0]


class TestDistributedBuild:
    def test_spark_bitmap_merge_equals_local(self, spark):
        from pyspark.sql import functions as F

        from webcrawler_woc_spark.operators.bloom import build_bucket_bitmaps

        df = spark.range(1000).select(F.xxhash64("id").alias("url_hash"))
        hashes = np.array([r["url_hash"] for r in df.collect()], dtype=np.int64)

        local = PartitionedBloom(n_buckets=4, m_bits=1 << 14, k=4)
        local.add_hashes(hashes)

        dist = PartitionedBloom(n_buckets=4, m_bits=1 << 14, k=4)
        rows = build_bucket_bitmaps(df, 4, 1 << 14, 4)
        dist.merge_spark_bitmaps(rows)

        for b in range(4):
            assert (dist.bitmaps[b] == local.bitmaps[b]).all()
