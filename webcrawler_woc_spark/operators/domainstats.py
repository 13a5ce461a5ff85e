"""Domain-level quality rollup — the site-granularity filtering signal every
production webtext pipeline computes before per-document filtering (C4's
blocklists, RefinedWeb/FineWeb domain pruning): a domain whose pages are
mostly duplicates or mostly low-quality is dropped wholesale, which is far
cheaper than scoring and discarding its documents one by one forever.

The reference crawler has no notion of site quality (its policy is a host
whitelist, `/root/reference/src/crawler.rs` should_crawl); this is the
corpus-side aggregation a crawl at scale feeds back into that policy.

All arithmetic is integer ppm (sums and integer division only — order
independent), so the DuckDB oracle twin is value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webcrawler_woc_spark.functions.domains import registrable_domain
from webcrawler_woc_spark.operators.textstats import quality_scores, rolling_fingerprint

PPM = 1_000_000


def domain_quality(pages: DataFrame) -> DataFrame:
    """Per-registrable-domain quality composite over (doc_id, url, text, lang).

    Signals, each integer ppm of the domain's document count:
    * ``dup_ratio_ppm``  — share of docs whose exact text fingerprint occurs
      more than once ANYWHERE in the corpus (cross-domain boilerplate counts
      against the domain serving it);
    * ``mean_quality_ppm`` — integer mean (sum div n) of the per-doc
      heuristic quality score (textstats.quality_scores);
    * ``top_lang`` / ``top_lang_share_ppm`` — majority language and its
      share (ties broken by lang ASC);
    * ``spam_score_ppm`` — the pinned composite
      (dup_ratio_ppm + (10^6 - mean_quality_ppm)) div 2: high = mostly
      duplicated and/or low quality. Callers threshold it.

    Scale shape: one corpus-sized groupBy(fingerprint) with map-side combine
    (the dedup_exact shape), one doc_id equi-join to attach quality, then
    domain-keyed aggs whose shuffle rows are bounded by distinct
    (domain, lang) pairs. No window over the corpus — the majority-lang
    window runs on the (domain, lang) count table, already tiny. Hot
    boilerplate fingerprints collapse in the partial agg."""
    host = F.lower(F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1))
    # NULL text would null-propagate through rolling_fingerprint and the
    # inner equi-join on _fp would silently DROP the doc from its domain's
    # counts — treat NULL as '' so every served page is counted
    pages = pages.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    base = pages.select(
        "doc_id",
        registrable_domain(host).alias("domain"),
        "lang",
        rolling_fingerprint(F.col("text")).alias("_fp"),
    )
    fp_counts = base.groupBy("_fp").agg(F.count("*").alias("_n_fp"))
    docs = (
        base.join(fp_counts, "_fp")
        .join(quality_scores(pages).select("doc_id", "quality_ppm"), "doc_id")
        .select(
            "domain",
            "lang",
            "quality_ppm",
            (F.col("_n_fp") > 1).cast("int").alias("is_dup"),
        )
    )
    per_lang = docs.groupBy("domain", "lang").agg(F.count("*").alias("n_lang"))
    w = Window.partitionBy("domain").orderBy(F.col("n_lang").desc(), F.col("lang").asc())
    top_lang = (
        per_lang.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("domain", F.col("lang").alias("top_lang"), F.col("n_lang").alias("_top_n"))
    )
    agg = docs.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.sum("is_dup").alias("_n_dup"),
        F.sum("quality_ppm").alias("_sum_q"),
    )
    return (
        agg.join(top_lang, "domain")
        .select(
            "domain",
            "n_docs",
            F.expr(f"(_n_dup * {PPM}) div n_docs").alias("dup_ratio_ppm"),
            F.expr("_sum_q div n_docs").alias("mean_quality_ppm"),
            "top_lang",
            F.expr(f"(_top_n * {PPM}) div n_docs").alias("top_lang_share_ppm"),
        )
        .withColumn(
            "spam_score_ppm",
            F.expr(f"(dup_ratio_ppm + ({PPM} - mean_quality_ppm)) div 2"),
        )
    )
