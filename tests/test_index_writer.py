"""Bucketed-at-rest inverted index writer (VERDICT r4 item 8).

Contract: write_inverted_index lays the positional index out as one
term_bucket=N partition directory per crc32(term) % n_buckets, and
read_postings answers a term query touching ONLY the queried terms'
bucket directories (file pruning) while returning exactly the rows a
full-scan filter would.
"""

from __future__ import annotations

import json
import os
import re
import zlib

import pytest
from pyspark.sql import functions as F

from webcrawler_woc_spark.operators.textstats import (
    INDEX_META,
    _term_bucket_py,
    inverted_index,
    read_postings,
    write_inverted_index,
)

N_BUCKETS = 16


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "merge vector merge stream"),
        (2, "vector stream stream crawl"),
        (3, "crawl merge index"),
        (4, "solo unique tokens here"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def layout(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("invidx") / "index")
    idx = inverted_index(docs)
    write_inverted_index(idx, path, n_buckets=N_BUCKETS)
    return path, idx


def test_layout_shape_and_meta(layout):
    path, _ = layout
    meta = json.load(open(os.path.join(path, INDEX_META)))
    assert meta["n_buckets"] == N_BUCKETS
    dirs = {d for d in os.listdir(path) if d.startswith("term_bucket=")}
    assert dirs  # partitioned at rest
    assert all(0 <= int(d.split("=")[1]) < N_BUCKETS for d in dirs)


def test_bucket_hash_parity_python_vs_spark(spark):
    """zlib.crc32 % n must equal the Spark-side pmod(crc32(term), n) the
    writer used — the reader's static pruning depends on it."""
    terms = ["merge", "vector", "stream", "crawl", "index", "solo", "ünïcode"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select(
            "term",
            F.pmod(F.crc32(F.encode(F.col("term"), "utf-8")), F.lit(N_BUCKETS))
            .cast("int")
            .alias("b"),
        ).collect()
    }
    want = {t: zlib.crc32(t.encode()) % N_BUCKETS for t in terms}
    assert got == want


def test_read_postings_matches_full_scan(spark, layout):
    path, idx = layout
    terms = ["merge", "stream"]
    got = sorted(
        (r["term"], r["doc_id"], r["positions"], r["tf"])
        for r in read_postings(spark, path, terms).collect()
    )
    want = sorted(
        (r["term"], r["doc_id"], r["positions"], r["tf"])
        for r in idx.filter(F.col("term").isin(terms)).collect()
    )
    assert got == want and len(got) == 4  # merge in 3 docs, stream in 2... (1,2),(3)+(1),(2)


def _partition_filter_of(df) -> str:
    """The FileScan node's PartitionFilters clause from the physical plan.
    (inputFiles() reflects the UNPRUNED file index, so the plan text is the
    pruning evidence — PartitionFilters are applied at file listing time.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan
    return m.group(1)


def test_query_prunes_to_queried_buckets_only(spark, layout):
    """The pruning pin: the scan plans a static term_bucket partition filter
    for exactly the queried terms' buckets, plus a pushed term filter."""
    path, _ = layout
    terms = ["merge"]
    (want_bucket,) = {_term_bucket_py(t, N_BUCKETS) for t in terms}
    df = read_postings(spark, path, terms)
    pf = _partition_filter_of(df)
    assert f"term_bucket#" in pf and f"= {want_bucket})" in pf
    # all other buckets exist on disk — the filter is what skips them
    all_buckets = {
        int(d.split("=")[1]) for d in os.listdir(path) if d.startswith("term_bucket=")
    }
    assert len(all_buckets) > 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(term), EqualTo(term,merge)]" in plan


def test_multi_term_query_plans_bucket_in_list(spark, layout):
    path, _ = layout
    terms = ["merge", "solo", "stream"]
    want = {_term_bucket_py(t, N_BUCKETS) for t in terms}
    pf = _partition_filter_of(read_postings(spark, path, terms))
    got = {int(b) for b in re.findall(r"(\d+)", pf.split("IN")[-1])} if "IN" in pf else {
        int(b) for b in re.findall(r"= (\d+)\)", pf)
    }
    assert got == want


class TestMergeInvertedIndex:
    def _docs(self, spark, lo, hi):
        return spark.createDataFrame(
            [(i, f"term{i % 7} shared merge{i % 3}") for i in range(lo, hi)],
            "doc_id bigint, text string",
        )

    def test_merge_equals_full_rebuild(self, spark, tmp_path):
        from webcrawler_woc_spark.operators.textstats import (
            inverted_index,
            merge_inverted_index,
            read_postings,
            write_inverted_index,
        )

        path = str(tmp_path / "idx")
        write_inverted_index(inverted_index(self._docs(spark, 0, 40)), path, n_buckets=8)
        touched = merge_inverted_index(
            spark, path, inverted_index(self._docs(spark, 40, 60))
        )
        assert touched  # something was rewritten
        terms = ["shared", "term3", "merge1"]
        got = {
            (r.term, r.doc_id, tuple(r.positions), r.tf)
            for r in read_postings(spark, path, terms).collect()
        }
        rebuilt = str(tmp_path / "idx_full")
        write_inverted_index(
            inverted_index(self._docs(spark, 0, 60)), rebuilt, n_buckets=8
        )
        want = {
            (r.term, r.doc_id, tuple(r.positions), r.tf)
            for r in read_postings(spark, rebuilt, terms).collect()
        }
        assert got == want and len(want) > 0

    def test_untouched_buckets_not_rewritten(self, spark, tmp_path):
        import glob
        import os

        from webcrawler_woc_spark.operators.textstats import (
            _term_bucket_py,
            inverted_index,
            merge_inverted_index,
            write_inverted_index,
        )

        path = str(tmp_path / "idx")
        write_inverted_index(inverted_index(self._docs(spark, 0, 40)), path, n_buckets=32)
        before = {
            f: os.stat(f).st_mtime_ns
            for f in glob.glob(os.path.join(path, "term_bucket=*", "*.parquet"))
        }
        # new batch introduces ONE new term -> at most a few touched buckets
        new = spark.createDataFrame([(100, "zzznewterm")], "doc_id bigint, text string")
        touched = merge_inverted_index(spark, path, inverted_index(new))
        assert touched == [_term_bucket_py("zzznewterm", 32)]
        after = {
            f: os.stat(f).st_mtime_ns
            for f in glob.glob(os.path.join(path, "term_bucket=*", "*.parquet"))
        }
        untouched_dirs = {
            f for f in before if f"term_bucket={touched[0]}/" not in f
        }
        for f in untouched_dirs:
            assert after[f] == before[f], f  # byte-for-byte left alone

    def test_overlapping_doc_ids_rejected(self, spark, tmp_path):
        import pytest

        from webcrawler_woc_spark.operators.textstats import (
            inverted_index,
            merge_inverted_index,
            write_inverted_index,
        )

        path = str(tmp_path / "idx")
        write_inverted_index(inverted_index(self._docs(spark, 0, 10)), path, n_buckets=8)
        with pytest.raises(ValueError, match="already indexed"):
            merge_inverted_index(spark, path, inverted_index(self._docs(spark, 5, 8)))

    def test_reindexed_doc_with_disjoint_buckets_rejected(self, spark, tmp_path):
        """The overlap check must scan the WHOLE index, not just touched
        buckets: a recrawled doc whose old terms all hash to untouched
        buckets would otherwise merge silently and stay indexed under both
        its stale and new terms."""
        import pytest

        from webcrawler_woc_spark.operators.textstats import (
            _term_bucket_py,
            inverted_index,
            merge_inverted_index,
            write_inverted_index,
        )

        n = 8
        old_terms = ["alpha", "beta"]
        old_buckets = {_term_bucket_py(t, n) for t in old_terms}
        # find a replacement term whose bucket is DISJOINT from the old ones
        new_term = next(
            t
            for t in (f"zrecrawl{i}" for i in range(200))
            if _term_bucket_py(t, n) not in old_buckets
        )
        path = str(tmp_path / "idx")
        doc = spark.createDataFrame(
            [(7, " ".join(old_terms))], "doc_id bigint, text string"
        )
        write_inverted_index(inverted_index(doc), path, n_buckets=n)
        recrawled = spark.createDataFrame(
            [(7, new_term)], "doc_id bigint, text string"
        )
        with pytest.raises(ValueError, match="already indexed"):
            merge_inverted_index(spark, path, inverted_index(recrawled))


def test_within_file_postings_sorted_even_with_bucket_collisions(spark, tmp_path):
    """The writer's sortWithinPartitions must LEAD with the partition column:
    repartition hash-partitions bucket ids, so one task can hold 2+ buckets —
    without the leading column Spark replaces the sort with its own on
    term_bucket alone and the promised within-file (term, doc_id) order (the
    row-group pruning contract) silently breaks for collided buckets."""
    import glob

    n = 8
    # prove the scenario is live: at least two bucket ids must share a
    # repartition partition (pmod(murmur3, n) over 0..n-1 is not injective)
    part_of = {
        r.b: r.p
        for r in spark.createDataFrame([(b,) for b in range(n)], "b int")
        .select("b", F.pmod(F.hash(F.col("b")), F.lit(n)).alias("p"))
        .collect()
    }
    assert len(set(part_of.values())) < n, part_of  # a collision exists
    docs = spark.createDataFrame(
        [(i, f"w{i % 50} w{(i * 7) % 50} shared") for i in range(120)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    write_inverted_index(inverted_index(docs), path, n_buckets=n)
    for f in glob.glob(os.path.join(path, "term_bucket=*", "*.parquet")):
        rows = [
            (r.term, r.doc_id)
            for r in spark.read.parquet(f).select("term", "doc_id").collect()
        ]
        assert rows == sorted(rows), f
