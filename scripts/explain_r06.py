"""Dump .explain("formatted") for the bench queries (plus named extras) to
plans/r06/<query>_<tag>.txt — the optimization round's before/after evidence.

Usage: python scripts/explain_r06.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

BENCH_QUERIES = [
    "crawl_extracted_text",
    "dedup_exact",
    "dedup_simhash",
    "dedup_substrings",
    "cluster_kmeans",
    "crawl_domain_quality",
    "pipeline_chunk_passages",
    "text_token_counts",
    "text_fingerprint",
    "ann_cosine_topk",
    "rel_agg_pricing",
    "rel_topk_per_group",
    "text_vocab_growth",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from webcrawler_woc_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=32)
    qs = entrymod.queries()
    outdir = "/root/repo/plans/r06"
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"{outdir}/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
