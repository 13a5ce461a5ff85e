"""One-off timing probe for round-5 session-6 gate queries at a given SF.

Usage: python scripts/time_new_ops.py [sf_dir] [key ...]
Runs each key's queries() callable once warm-up-free, prints JSON lines of
{key, rows, sec}. Not part of bench.py (which owns the pinned headline set);
this exists so a pathologically slow new gate query is caught before the
driver's correctness run pays for it.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_KEYS = [
    "dedup_cdc_chunks",
    "dedup_cdc_pairs",
    "text_template_fp",
    "text_char_entropy",
    "graph_label_prop",
    "text_blocklist",
    "text_content_density",
    "crawl_soft404",
    "graph_host_pagerank",
    "crawl_canonical_cluster",
    "crawl_http_headers",
    "pipeline_host_cap",
    "text_readability",
    "graph_kcore",
    "graph_seed_expansion",
    "text_lang_agreement",
    "graph_degree_hist",
    "sketch_kmv_distinct",
    "pipeline_epoch_shuffle",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    keys = sys.argv[2:] or DEFAULT_KEYS

    import __spark_entry__ as entry
    from webcrawler_woc_spark.session import get_spark

    spark = get_spark(app_name="time-new-ops", master="local[32]",
                      shuffle_partitions=32)
    qs = entry.queries()
    for key in keys:
        t0 = time.monotonic()
        n = qs[key](spark, sf_dir).count()
        print(json.dumps({"key": key, "rows": n, "sec": round(time.monotonic() - t0, 3)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
