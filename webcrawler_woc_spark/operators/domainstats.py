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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_woc_spark.functions.domains import registrable_domain
from webcrawler_woc_spark.operators.textstats import quality_ppm_col, rolling_fingerprint

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

    Scale shape: ONE corpus projection computes domain, fingerprint AND the
    quality score in the same scan (the previous doc_id equi-join back to a
    second quality scan is gone — guide §2.4), one corpus-sized
    groupBy(fingerprint) with map-side combine (the dedup_exact shape)
    joined back on _fp, then a single two-level aggregation tree:
    (domain, lang) partial rollup -> per-domain rollup where the majority
    language is min(struct(-n_lang, lang)) — the same (n_lang DESC, lang
    ASC) pick as the previous row_number window WITHOUT materializing the
    corpus subtree twice (Spark has no cross-branch CSE: the old
    agg ⋈ top_lang join recomputed the whole scan+fp-join pipeline for
    each side — measured as two full duplicated subtrees in the plan).
    Hot boilerplate fingerprints collapse in the partial agg."""
    host = F.lower(F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1))
    # NULL text would null-propagate through rolling_fingerprint and the
    # inner equi-join on _fp would silently DROP the doc from its domain's
    # counts — treat NULL as '' so every served page is counted
    text = F.coalesce(F.col("text"), F.lit(""))
    base = pages.select(
        registrable_domain(host).alias("domain"),
        "lang",
        rolling_fingerprint(text).alias("_fp"),
        quality_ppm_col(text).alias("quality_ppm"),
    ).localCheckpoint()
    # ^ the guide-§8 'decide on small rows' pin: base is the corpus reduced
    # to ~50 narrow bytes/row, consumed by BOTH the fingerprint count and
    # the join probe side — without the pin Spark recomputes the scan +
    # per-char fold + quality tokenization once per consumer (and a third
    # time in the join's pushed isnotnull filter); with it the heavy
    # projection runs exactly once per row
    fp_counts = base.groupBy("_fp").agg(F.count("*").alias("_n_fp"))
    docs = base.join(fp_counts, "_fp").select(
        "domain",
        "lang",
        "quality_ppm",
        (F.col("_n_fp") > 1).cast("int").alias("is_dup"),
    )
    per_lang = docs.groupBy("domain", "lang").agg(
        F.count("*").alias("n_lang"),
        F.sum("is_dup").alias("_n_dup_l"),
        F.sum("quality_ppm").alias("_sum_q_l"),
    )
    agg = per_lang.groupBy("domain").agg(
        F.sum("n_lang").alias("n_docs"),
        F.sum("_n_dup_l").alias("_n_dup"),
        F.sum("_sum_q_l").alias("_sum_q"),
        F.min(
            F.struct((-F.col("n_lang")).alias("_neg"), F.col("lang").alias("lang"))
        ).alias("_top"),
    )
    return agg.select(
        "domain",
        "n_docs",
        F.expr(f"(_n_dup * {PPM}) div n_docs").alias("dup_ratio_ppm"),
        F.expr("_sum_q div n_docs").alias("mean_quality_ppm"),
        F.col("_top.lang").alias("top_lang"),
        F.expr(f"((-`_top`.`_neg`) * {PPM}) div n_docs").alias("top_lang_share_ppm"),
    ).withColumn(
        "spam_score_ppm",
        F.expr(f"(dup_ratio_ppm + ({PPM} - mean_quality_ppm)) div 2"),
    )
