"""Train/eval decontamination over ``documents`` — the n-gram-overlap check a
training-data pipeline runs before any benchmark evaluation (public recipe:
GPT-3 appendix C / The Pile / Dolma decontamination: flag a training doc if
it shares any long character n-gram with an eval-set doc).

The reference crawler has no analogue (its only dedup is URL identity,
src/crawler.rs:82-99); this is part of the engine's 100 TB pipeline surface
alongside operators/dedup.py.

Scale shape: eval sets are small (10^4-10^6 docs) next to the 100 TB training
corpus — so the eval shingle set is the BROADCAST side of a single semi-join
probe of the training shingle explode. The corpus is scanned once, nothing
but matches shuffles. For eval sets too big to broadcast, the same join runs
shuffle-side on the shingle hash (the explode is already key-partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import char_shingles


def decontaminate(
    documents: DataFrame,
    eval_docs: DataFrame,
    n: int = 16,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag training docs sharing >= 1 character ``n``-gram with an eval doc.

    ``documents``: the training corpus (doc_id, text).
    ``eval_docs``: the benchmark/eval corpus (doc_id, text) — typically tiny.

    Output: (doc_id, n_hit_shingles, contaminated) one row per TRAINING doc;
    ``n_hit_shingles`` = how many of its distinct shingles appear anywhere in
    the eval set (0 => clean). Deterministic, integer-only, SQL-expressible.
    """
    train_sh = char_shingles(documents, n)
    # SAME shingling rule on both sides (short-text fallback included) — an
    # inline re-implementation here could silently diverge from the train side
    eval_sh = char_shingles(eval_docs, n).select("shingle").distinct()
    if broadcast_eval:
        eval_sh = F.broadcast(eval_sh)
    hits = (
        train_sh.join(eval_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_shingles"))
    )
    return (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_shingles"), F.lit(0)).alias("n_hit_shingles"),
            (F.coalesce(F.col("n_hit_shingles"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def url_decontaminate(corpus: DataFrame, evalset: DataFrame) -> DataFrame:
    """URL-level decontamination — the FIRST decon pass, before any n-gram
    overlap runs: if an eval benchmark was scraped from known URLs (most
    web-derived benchmarks publish their source URLs), any corpus row from
    those URLs is contaminated BY PROVENANCE, no text comparison needed —
    and the text pass alone misses paraphrased/truncated re-crawls of the
    same page. Matching is on the tracking-stripped form of BOTH sides
    (the same canonicalization the frontier dedups on: an eval URL logged
    with utm_* noise must still hit the clean corpus capture and vice
    versa).

    Inputs: ``corpus`` (doc_id, url), ``evalset`` (url). Output: the
    contaminated (doc_id, url, matched_key) rows — feed the doc_ids to an
    anti-join upstream exactly like decontaminate()'s n-gram hits.

    One semi-shaped inner join on the canonical key; the eval URL set is
    benchmark-sized — broadcast. At 100 TB this is a scan + broadcast
    probe, by far the cheapest decon stage, which is why it runs first."""
    from ..functions.urlnorm import strip_tracking_params_col

    key = strip_tracking_params_col(F.col("url"))
    ev = F.broadcast(
        evalset.select(strip_tracking_params_col(F.col("url")).alias("matched_key")).distinct()
    )
    return (
        corpus.withColumn("matched_key", key)
        .join(ev, "matched_key")
        .select("doc_id", "url", "matched_key")
    )
