"""webcrawler_woc_spark — a from-scratch PySpark-native distributed URL-frontier engine.

Re-expresses the dataflow of the reference crawler ``Ayush1325/webcrawler-woc``
(single-process Rust/tokio BFS crawler, /root/reference) as an idiomatic Spark
DataFrame pipeline:

* fetch is simulated as an equi-join of the URL frontier against a
  Common-Crawl-style ``pages`` corpus table (``url, warc_ts, html, text, lang``);
* link / text extraction and URL canonicalization run as vectorized
  pandas/Arrow UDFs (no per-row Python UDFs);
* the URL-seen set is a bucket-partitioned parquet table with per-partition
  Bloom-filter prefilters ahead of the exact left-anti join;
* a per-host politeness scheduler (robots cache, crawl-delay budget, salted
  priority top-k) defines a deterministic crawl order;
* every BFS wave commits frontier/seen/metrics state atomically through a
  snapshot manifest, so crawls resume from any completed wave.

Nothing in this package is ported from the reference's Rust code; semantics
were extracted into SURVEY.md and re-implemented Spark-first.
"""

__version__ = "0.1.0"
