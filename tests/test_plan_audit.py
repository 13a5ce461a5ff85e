"""Repo-wide physical-plan audit over every contract query.

Pins the 100 TB-critical properties across the WHOLE query surface at once:
* no row-at-a-time Python (BatchEvalPython) anywhere — Python only as
  Arrow-batched stages (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas);
* no cartesian products;
* sort-merge joins only where both sides are genuinely same-scale self-joins
  (allowlisted); broadcast-nested-loop only for the intentional exact-ANN
  baseline crossJoin.
"""

from __future__ import annotations

import pytest

# SMJ allowlist: shingle inverted-index / band self-joins and iterative
# graph joins (edges ⋈ ranks/labels) — both sides are the same corpus-sized
# frame, broadcast is impossible at scale, SMJ is correct.
SMJ_OK = {
    "dedup_minhash_lsh",
    "dedup_cluster_keepmin",  # minhash pair graph + iterative label joins
    "crawl_snapshot_diff",  # full outer over two corpus-sized snapshots: SMJ is the right plan
    "crawl_merge_upsert",  # MERGE INTO full outer: same two-snapshot shape as snapshot_diff
    "crawl_adaptive_recrawl",  # consumes the snapshot-diff full outer
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "graph_pagerank",
    "graph_components",
    "ann_ivf_topk",  # probes ⋈ inverted-file: the file is corpus-sized
    "cluster_kmeans",  # assignment ⋈ vectors per iteration: both corpus-sized
    "dedup_semantic",  # within-cluster self-join: both sides cluster-partitioned
    # semi-join on whash (report side is an unbounded aggregate) + span
    # positions ⋈ documents on doc_id: both sides corpus-scale, SMJ correct
    "dedup_substrings_verified",
    "graph_hits",  # edges ⋈ scores per half-step: both corpus-sized (pagerank shape)
    "graph_salsa",  # same edges ⋈ scores half-steps as graph_hits, plus degree tables
    # line explode ⋈ boilerplate table: boilerplate size is data-dependent
    # (AQE may broadcast when small; SMJ is the safe general plan)
    "dedup_lines",
    # docs ⋈ fingerprint-counts on fp + ⋈ quality on doc_id: all sides
    # corpus-sized (the dedup_exact shape); domain-keyed aggs after are tiny
    "crawl_domain_quality",
    # FULL OUTER over the two per-snapshot term-count tables: full outer
    # cannot broadcast-hash, and both sides are vocabulary-sized aggregates
    # (never the corpora) — SMJ is the right plan
    "text_term_drift",
    # frontier ⋈ redirect-map ⋈ canonical-map: the alias tables' sizes are
    # data-dependent (10^9-row redirect maps exist at the design point —
    # not broadcastable), every join is keyed on the url the frontier is
    # already partitioned by; AQE may downgrade to broadcast when small
    "crawl_alias_resolve",
    # FULL OUTER of declared-vs-crawled URL sets: full outer cannot
    # broadcast-hash and both sides are URL-cardinality (snapshot-diff shape)
    "crawl_sitemap_coverage",
}
# BNLJ allowlist: the exact cosine baseline broadcasts the tiny query set
# into a crossJoin by design; IVF broadcasts the tiny centroid table into
# the assignment crossJoin.
BNLJ_OK = {
    "ann_cosine_topk",
    "ann_ivf_topk",
    "sketch_hll_distinct",  # 1-row exact x 1-row estimate crossJoin
    "crawl_adaptive_recrawl",  # per-host aggregate x 1-row total crossJoin
    "cluster_kmeans",  # corpus x broadcast(k centroids): the textbook k-means scan
    "dedup_semantic",  # inherits the k-means assignment scan
    "graph_hits",  # per-normalization 1-row max broadcast crossJoin
    "pipeline_domain_mixture",  # group-counts x 1-row weight-total crossJoin
    "text_pmi_pairs",  # pair-counts x 1-row corpus-total crossJoin
    "crawl_schedule_makespan",  # host table x 1-row makespan-max crossJoin
    "pipeline_shard_balance",  # shard counts x 1-row min/max crossJoin
}
# streaming queries execute a StreamingQuery, not a single batch plan
SKIP = {
    "stream_dedup_exactly_once",
    "stream_host_rate",
    "stream_sessionize",
    "stream_extract_links",
}


def _formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _queries():
    import __spark_entry__ as entrymod

    return [(k, v) for k, v in entrymod.queries().items() if k not in SKIP]


@pytest.mark.parametrize("name,fn", _queries(), ids=[k for k, _ in _queries()])
def test_plan_has_no_antipatterns(spark, sf_dir, name, fn):
    plan = _formatted_plan(spark, fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in SMJ_OK:
        assert "SortMergeJoin" not in plan, f"{name}: unexpected sort-merge join"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: unexpected BNLJ"
