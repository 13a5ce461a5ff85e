"""Text-analysis operators for web-text pipelines over ``documents``.

All pure Catalyst expressions (regexp/split/filter/aggregate) — zero Python
in the hot path (the one exception: normalize_nfc, whose Unicode tables
Spark SQL lacks, runs as an Arrow-batched kernel) — and each has an exact
DuckDB-SQL twin in ``__spark_entry__.oracle_sql`` for the correctness gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "不", "了", "在"],
}

FINGERPRINT_MOD = 10**15 - 11  # keeps acc*31+255 inside int64


def _tokens(text):
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_measured, total_token_chars) — whitespace
    tokenization, the unit for training-data budget accounting. Integer
    outputs only (hash-stable across engines)."""
    toks = _tokens(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).alias("total_token_chars"),
    )


def quality_ppm_col(text) -> F.Column:
    """THE composite quality score expression (floor-ppm) over a text
    column — one definition shared by quality_scores and domain_quality so
    the FIXED IEEE op sequence (((a + b) + c) * 1e6, replicated verbatim in
    the SQL oracles) cannot drift between callers."""
    toks = _tokens(text)
    n_tokens = F.size(toks)
    text_len = F.length(text)
    ntok1 = F.greatest(n_tokens, F.lit(1))
    len1 = F.greatest(text_len, F.lit(1))
    punct = text_len - F.length(F.regexp_replace(text, r"[.!?,;:]", ""))
    stop_list = STOPWORDS["en"]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*stop_list)))

    a = F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
    b = (F.lit(1.0) - F.least(punct * F.lit(10.0) / len1, F.lit(1.0))) * F.lit(0.25)
    c = F.least(stop_hits * F.lit(5.0) / ntok1, F.lit(1.0)) * F.lit(0.25)
    return F.floor(((a + b) + c) * F.lit(1000000.0)).cast("bigint")


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality signals per doc: integer components + composite
    score as floor-ppm (quality_ppm_col — hash-stable across engines)."""
    text = F.col("text")
    toks = _tokens(text)
    n_tokens = F.size(toks)
    text_len = F.length(text)
    punct = text_len - F.length(F.regexp_replace(text, r"[.!?,;:]", ""))
    stop_list = STOPWORDS["en"]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*stop_list)))

    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        text_len.alias("text_len"),
        punct.alias("punct_chars"),
        stop_hits.alias("stop_hits"),
        quality_ppm_col(text).alias("quality_ppm"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-vote language ID (n-gram-free heuristic): argmax of per-lang
    stopword hit counts; deterministic tiebreak by lang code ASC; no hits at
    all => 'und'. Output (doc_id, lang_pred, best_hits)."""
    toks = _tokens(F.col("text"))

    def hits(sw: list[str]):
        # one-arg lambda only: a second (defaulted) param makes F.filter pass
        # the element INDEX into it
        return F.size(F.filter(toks, lambda t: t.isin(*sw)))

    hit_cols = {lang: hits(sw) for lang, sw in STOPWORDS.items()}
    df = documents.select("doc_id", *[c.alias(f"hits_{l}") for l, c in hit_cols.items()])
    langs = sorted(STOPWORDS)  # ASC order = tiebreak priority
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)).otherwise(pred)
    return df.select("doc_id", pred.alias("lang_pred"), best.alias("best_hits"))


# GPT-2-style pre-tokenizer, RE2-safe subset (no lookahead/unicode classes:
# the corpus is ASCII and the DuckDB twin runs RE2): a word with optional
# leading space, a number run, a punctuation run, or a whitespace run.
BPE_ISH_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+| +"


def bpe_token_counts(documents: DataFrame) -> DataFrame:
    """Token counting under a BPE-ish pre-tokenizer regex (the unit LLM
    training budgets are actually measured in, vs whitespace words). Pure
    Catalyst regexp_extract_all; identical RE2-compatible pattern in the
    DuckDB oracle. Output (doc_id, n_bpe_tokens, n_ws_tokens, ratio_ppm)."""
    bpe = F.expr(f"regexp_extract_all(text, '{BPE_ISH_RE}', 0)")
    ws = _tokens(F.col("text"))
    n_bpe = F.size(bpe)
    n_ws = F.size(ws)
    return documents.select(
        "doc_id",
        n_bpe.cast("int").alias("n_bpe_tokens"),
        n_ws.cast("int").alias("n_ws_tokens"),
        # bpe-per-word ratio in ppm — integer-exact via div
        F.expr(
            f"CAST(size(regexp_extract_all(text, '{BPE_ISH_RE}', 0)) * 1000000 "
            "div greatest(size(filter(split(trim(text), '\\\\s+'), t -> t != '')), 1)"
            " AS BIGINT)"
        ).alias("bpe_per_word_ppm"),
    )


def repetition(documents: DataFrame) -> DataFrame:
    """Intra-document repetition (the Gopher/Dolma 'repetitious text' class
    of quality signal): fraction of duplicate token 2-grams per doc. Boiler-
    plate and spam pages repeat phrases; the signal is the standard pre-
    training filter alongside quality_scores. Pure Catalyst; integer-exact
    ppm via `div`, SQL-twin exact.

    Output (doc_id, n_bigrams, n_distinct_bigrams, dup_bigram_ppm)."""
    toks = _tokens(F.col("text"))
    df = documents.select("doc_id", toks.alias("toks"))
    bgs = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    df = df.select("doc_id", bgs.alias("bgs"))
    return df.select(
        "doc_id",
        F.size("bgs").cast("int").alias("n_bigrams"),
        F.size(F.array_distinct("bgs")).cast("int").alias("n_distinct_bigrams"),
        F.expr(
            "CAST((size(bgs) - size(array_distinct(bgs))) * 1000000"
            " div greatest(size(bgs), 1) AS BIGINT)"
        ).alias("dup_bigram_ppm"),
    )


def gopher_rules(documents: DataFrame) -> DataFrame:
    """The Gopher/Dolma document-level quality rules as one scan-only
    projection — the standard pretraining keep/drop gate (Rae et al. 2021
    §A1.1, re-expressed with all-integer ppm arithmetic so the DuckDB twin
    is value-exact):

    * word count within [50, 100000];
    * mean word length within [3, 10] chars;
    * symbol-to-word ratio ('#' chars + '...' runs) < 0.1;
    * < 90% of lines start with a bullet ('- ' / '* ');
    * < 30% of lines end with an ellipsis ('...').

    Output (doc_id, n_tokens, mean_word_len_ppm, symbol_word_ppm,
    bullet_line_ppm, ellipsis_line_ppm, passes) — integers + one boolean.
    Scale shape: pure Catalyst, no shuffle, whole-stage codegen; at 100 TB
    this is a pushed-down projection over the corpus scan."""
    # integer `div` everywhere (never double-divide + cast: Spark truncates,
    # DuckDB rounds); the token sub-expressions mirror _tokens verbatim
    n_tokens = F.size(_tokens(F.col("text")))
    mean_len_ppm = F.expr(
        "CAST(aggregate(filter(split(trim(text), '\\\\s+'), t -> t != ''), 0,"
        " (acc, t) -> acc + length(t)) * 1000000"
        " div greatest(size(filter(split(trim(text), '\\\\s+'), t -> t != '')), 1)"
        " AS BIGINT)"
    )
    symbol_ppm = F.expr(
        "CAST((length(text) - length(regexp_replace(text, '#', '')) +"
        " size(regexp_extract_all(text, '\\\\.\\\\.\\\\.', 0))) * 1000000"
        " div greatest(size(filter(split(trim(text), '\\\\s+'), t -> t != '')), 1)"
        " AS BIGINT)"
    )
    out = documents.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        mean_len_ppm.alias("mean_word_len_ppm"),
        symbol_ppm.alias("symbol_word_ppm"),
        F.expr(
            "CAST(size(filter(split(text, '\\n'), l -> l LIKE '- %' OR l LIKE '* %'))"
            " * 1000000 div greatest(size(split(text, '\\n')), 1) AS BIGINT)"
        ).alias("bullet_line_ppm"),
        F.expr(
            "CAST(size(filter(split(text, '\\n'), l -> l LIKE '%...'))"
            " * 1000000 div greatest(size(split(text, '\\n')), 1) AS BIGINT)"
        ).alias("ellipsis_line_ppm"),
    )
    passes = (
        F.col("n_tokens").between(50, 100_000)
        & F.col("mean_word_len_ppm").between(3_000_000, 10_000_000)
        & (F.col("symbol_word_ppm") < 100_000)
        & (F.col("bullet_line_ppm") < 900_000)
        & (F.col("ellipsis_line_ppm") < 300_000)
    )
    return out.withColumn("passes", passes)


def url_quality(urls: DataFrame) -> DataFrame:
    """URL-shape quality features (the C4/RefinedWeb URL-filter class): a
    crawler drops spammy/trap URLs BEFORE fetching, purely from the string —
    the cheapest filter in the whole pipeline, so it runs first.

    Input: a frame with a ``url`` column. Output (url, url_len, path_depth,
    path_digit_ppm, query_len, has_tracking, passes):

    * path_depth — '/' count in the path (deep auto-generated trees);
    * path_digit_ppm — digit density of the path (session-id/hash URLs);
    * query_len + has_tracking — long query strings and utm_* params;
    * passes — depth <= 6, digit density < 50%, query < 64 chars, no
      tracking params.

    Pure Catalyst, no shuffle; at 10^10 URLs this is a frontier-side
    projection ahead of the politeness scheduler."""
    path = F.regexp_extract(F.col("url"), r"^[a-z]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(F.col("url"), r"\?([^#]*)", 1)
    staged = urls.select("url", path.alias("_path"), query.alias("_query"))
    depth = F.length("_path") - F.length(F.regexp_replace(F.col("_path"), "/", ""))
    out = staged.select(
        "url",
        F.length("url").cast("int").alias("url_len"),
        depth.cast("int").alias("path_depth"),
        F.expr(
            "CAST((length(_path) - length(regexp_replace(_path, '[0-9]', '')))"
            " * 1000000 div greatest(length(_path), 1) AS BIGINT)"
        ).alias("path_digit_ppm"),
        F.length("_query").cast("int").alias("query_len"),
        F.col("_query").contains("utm_").alias("has_tracking"),
    )
    passes = (
        (F.col("path_depth") <= 6)
        & (F.col("path_digit_ppm") < 500_000)
        & (F.col("query_len") < 64)
        & ~F.col("has_tracking")
    )
    return out.withColumn("passes", passes)


def rolling_fingerprint(col) -> F.Column:
    """THE contract fingerprint expression: acc = (acc*31 + ascii(char))
    mod FINGERPRINT_MOD over the char array. One definition shared by
    fingerprints() and pii.pii_scrub so the cross-engine recipe cannot
    drift between callers."""
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FINGERPRINT_MOD,
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (order-sensitive, unlike
    a bag-of-words hash), computed as a Catalyst aggregate over the char
    array (see rolling_fingerprint). SQL-twin exact."""
    return documents.select("doc_id", rolling_fingerprint(F.col("text")).alias("fingerprint"))


def doc_frequency(documents: DataFrame) -> DataFrame:
    """Per-language document frequency: (lang, token, df) where df counts
    DOCUMENTS containing the token (array_distinct before explode — the
    inverted-index build step of tf-idf and of stopword discovery).

    Scale shape: explode then one partial-agg'd groupBy on (lang, token) —
    map-side combine collapses each partition's duplicates before the
    shuffle, so shuffle volume is bounded by distinct (lang, token) pairs
    per partition, not token occurrences."""
    toks = F.explode(F.array_distinct(_tokens(F.col("text")))).alias("token")
    return (
        documents.select("lang", toks)
        .groupBy("lang", "token")
        .agg(F.count("*").cast("bigint").alias("df"))
    )


def top_terms_per_lang(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-k tokens by document frequency within each language — the
    "commonest terms" report layered on doc_frequency. Deterministic total
    order (df DESC, token ASC) so rank values are engine-stable.
    Output (lang, token, df, rnk)."""
    from pyspark.sql import Window

    df = doc_frequency(documents)
    w = Window.partitionBy("lang").orderBy(F.col("df").desc(), F.col("token").asc())
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("lang", "token", "df", "rnk")
    )


def ranked_search(documents: DataFrame, terms: list[str], k: int = 10) -> DataFrame:
    """Ranked retrieval over the crawl corpus: integer tf-idf, global top-k.

    score(d) = sum over matched query terms of tf(t,d) * idf_ppm(t), with
    idf_ppm(t) = (10^6 * N) div df(t) — all-integer arithmetic so the score
    is exact under any shuffle order and the DuckDB twin reproduces it
    bit-for-bit (real BM25 adds float log/length-norm; the integer variant
    keeps the same plan shape and an exact oracle).

    Scale shape: the broadcast term list filters the token explode AT THE
    SCAN, so only query-term postings exist downstream (a 5-term query over
    10^10 docs shuffles 5 posting lists, not the corpus); tf and df are
    partial-agg'd; the final top-k is a TakeOrdered (per-partition k then
    driver merge), never a global sort. Output (doc_id, score,
    n_terms_matched), ties broken by doc_id ASC."""
    spark = documents.sparkSession
    n_docs = documents.count()
    probe = F.broadcast(spark.createDataFrame([(t,) for t in terms], "token string"))
    toks = documents.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("token")
    )
    tf = toks.join(probe, "token").groupBy("doc_id", "token").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dfs = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    # BIGINT literal: the int32 product 10^6 * N overflows under ANSI mode
    # once the corpus passes ~2147 docs (latent until sf0.1 — the small-SF
    # oracle gates never reached it); DuckDB's INTEGER is 64-bit-promoted,
    # so the bigint cast only un-crashes Spark, values are unchanged
    idf = dfs.withColumn(
        "idf_ppm", F.expr(f"(CAST({10**6} AS BIGINT) * {n_docs}) div df")
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("idf_ppm")).alias("score"),
            F.count("*").cast("int").alias("n_terms_matched"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def normalize_nfc(documents: DataFrame) -> DataFrame:
    """Unicode NFC normalization (the first step of every text-cleaning
    pipeline: compose decomposed diacritics/Hangul jamo so equal-looking
    strings hash equal before any dedup/fingerprint pass).

    Output (doc_id, norm_text, changed, n_chars_raw, n_chars_norm).

    Shape: scan-only, no shuffle. Spark SQL has no normalization builtin,
    so the kernel is an Arrow-batched pandas UDF over python unicodedata
    (C-implemented; the one-string-column Arrow round trip is the cost — at
    100 TB prefer a JVM java.text.Normalizer UDF shipped as a jar, same
    semantics). The DuckDB oracle twin is its native nfc_normalize();
    python unicodedata and DuckDB track the same Unicode normalization
    tables, and the contract pins composition cases stable since Unicode
    3.0 (combining diacritics, Hangul jamo)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(texts: pd.Series) -> pd.Series:
        import unicodedata

        return texts.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    norm = documents.select("doc_id", F.col("text"), nfc(F.col("text")).alias("norm_text"))
    return norm.select(
        "doc_id",
        "norm_text",
        (F.col("text") != F.col("norm_text")).alias("changed"),
        F.length("text").cast("int").alias("n_chars_raw"),
        F.length("norm_text").cast("int").alias("n_chars_norm"),
    )


def inverted_index(documents: DataFrame) -> DataFrame:
    """Positional inverted index — the build step for phrase search and
    proximity ranking that doc_frequency/ranked_search (bag-of-words) skip.

    Output (term, doc_id, positions array<int> 1-based sorted, tf) — the
    flat posting-row form (one row per (term, doc); readers regroup by term
    at query time). Tokenization shares _tokens with every other text op.

    Scale shape: one posexplode (bounded by corpus token count) + one
    partial-agg'd groupBy(term, doc_id) — map-side combine collapses
    repeated terms within a doc before the shuffle, so shuffle rows =
    distinct (term, doc) pairs, the index's own cardinality. At rest the
    index wants bucketing BY TERM so query-time term lookups prune files;
    array_sort makes the position list deterministic under any shuffle
    order."""
    return (
        documents.select("doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "term"))
        .groupBy("term", "doc_id")
        .agg(
            F.array_sort(F.collect_list(F.col("pos") + 1)).alias("positions"),
            F.count("*").cast("int").alias("tf"),
        )
    )


INDEX_META = "_index_meta.json"


def _term_bucket_col(term_col, n_buckets: int):
    """crc32-based term bucket — crc32 is the one hash Spark (F.crc32) and
    plain Python (zlib.crc32) compute identically, so the READER can turn a
    term list into bucket ids driver-side with no Spark job and push them
    as static partition filters."""
    return F.pmod(F.crc32(F.encode(term_col, "utf-8")), F.lit(n_buckets)).cast("int")


def _term_bucket_py(term: str, n_buckets: int) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def write_inverted_index(index: DataFrame, path: str, n_buckets: int = 64) -> None:
    """Persist the positional index bucketed BY TERM at rest (the layout
    inverted_index's docstring promises): one ``term_bucket=N`` partition
    directory per crc32(term) % n_buckets, postings sorted by (term, doc_id)
    within each file so a term's rows are contiguous (row-group stats then
    prune within the file too). A query for k terms opens at most k bucket
    directories out of n_buckets — file pruning, not a full scan.

    Scale shape: one repartition on the bucket key (the write's natural
    shuffle; n_buckets tasks each sort-write their own directory). Size
    n_buckets to the cluster at 100 TB (e.g. 4096) so bucket files stay
    executor-memory-sized. A tiny meta JSON records n_buckets for readers;
    it is written last, as the commit marker."""
    import json
    import os

    (
        index.withColumn("term_bucket", _term_bucket_col(F.col("term"), n_buckets))
        .repartition(n_buckets, "term_bucket")
        # lead with the partition column: repartition hash-partitions bucket
        # ids, so one task can hold 2+ buckets — without term_bucket first,
        # FileFormatWriter's required ordering fails and Spark inserts its
        # own sort on term_bucket ALONE, losing the (term, doc_id) order
        .sortWithinPartitions("term_bucket", "term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(path)
    )
    with open(os.path.join(path, INDEX_META), "w") as fh:
        json.dump({"n_buckets": n_buckets, "bucket_hash": "crc32"}, fh)


def read_postings(spark, path: str, terms: list[str]) -> DataFrame:
    """Posting rows for ``terms`` from a write_inverted_index layout.

    Bucket ids are computed driver-side from the meta (zlib.crc32 == Spark
    F.crc32), so the ``term_bucket IN (...)`` predicate is a STATIC
    partition filter — Catalyst prunes every other bucket's directory at
    planning time (pinned by the file-pruning test), and the residual
    ``term IN (...)`` filter is pushed into the scan."""
    import json
    import os

    with open(os.path.join(path, INDEX_META)) as fh:
        meta = json.load(fh)
    buckets = sorted({_term_bucket_py(t, int(meta["n_buckets"])) for t in terms})
    return (
        spark.read.parquet(path)
        .filter(F.col("term_bucket").isin(buckets) & F.col("term").isin(list(terms)))
        .drop("term_bucket")
    )


def char_lm_scores(documents: DataFrame) -> DataFrame:
    """CCNet-class language-model quality signal without an external LM: a
    character-BIGRAM model is fit on the corpus itself and every document is
    scored by its total surprisal under it — spammy/garbled text (rare
    character transitions) scores high, fluent text low. CCNet buckets on
    exactly this kind of score; the real pipeline swaps in a KenLM, the
    operator shape (count table -> broadcast -> scan-side scoring) is
    identical.

    All-integer surprisal so the oracle is value-exact: cost(ab) =
    ilog2(C(a)) - ilog2(C(ab)) where ilog2(x) = length(bin(x)) - 1 =
    floor(log2 x) (the sketch_quantile_log2 trick — no float log anywhere)
    and C(a) = sum_b C(ab) is derived FROM the bigram table so the two
    counts can never disagree. Output (doc_id, n_bigrams, bits_total,
    centibits_per_bigram), rate = bits_total * 100 div n_bigrams.

    Scale shape: one bigram explode feeds a partial-agg'd groupBy whose
    result is bounded by the CHARSET squared (~10k for ASCII web text, still
    broadcastable for unicode), then the scoring pass joins the explode
    against the broadcast cost table and aggregates per doc — the corpus
    shuffles nothing but its own doc_id grouping. At 100 TB the count table
    is fit once (or on a sample) and persisted, not re-derived per query."""
    bigrams = F.when(
        F.length("text") >= 2,
        F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    bg = documents.select("doc_id", F.explode(bigrams).alias("bg"))
    counts = bg.groupBy("bg").agg(F.count("*").alias("c_ab"))
    lead = counts.groupBy(F.substring("bg", 1, 1).alias("a")).agg(
        F.sum("c_ab").alias("c_a")
    )
    ilog2 = lambda c: F.length(F.bin(c)) - 1  # noqa: E731 — floor(log2 x), integer-exact
    cost = (
        counts.join(lead, F.substring(counts["bg"], 1, 1) == lead["a"])
        .select("bg", (ilog2(F.col("c_a")) - ilog2(F.col("c_ab"))).cast("bigint").alias("bits"))
    )
    scored = bg.join(F.broadcast(cost), "bg")
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.sum("bits").alias("bits_total"),
    )
    # left join restores bigram-less docs (empty/NULL/1-char text) as zeros
    return documents.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("bits_total"), F.lit(0).cast("bigint")).alias("bits_total"),
        F.expr(
            "CAST(coalesce(bits_total, 0) * 100 div greatest(coalesce(n_bigrams, 0), 1) AS BIGINT)"
        ).alias("centibits_per_bigram"),
    )


def word_ngrams(documents: DataFrame, n: int = 3, top_k: int | None = None) -> DataFrame:
    """Corpus word n-gram counts — the collection pass behind contamination
    screens (n-gram overlap vs eval sets), memorization probes and n-gram
    LM fitting. Tokenization shares _tokens with every other text op.

    Output (ngram, n_occurrences); with top_k, the top-k by
    (count desc, ngram asc) — the full tiebreak keeps the cut
    deterministic under any shuffle order.

    Scale shape: n-gram assembly is pure Catalyst higher-order transforms
    (no Python), the explode is bounded by corpus token count, and the
    count is one partial-agg'd groupBy(ngram) — map-side combine collapses
    within-partition repeats so shuffle rows = distinct n-grams per
    partition. The top-k is a TakeOrderedAndProject, never a full sort."""
    toks = _tokens(F.col("text"))
    # element_at is 1-based; sequence() is arithmetic (no boundary guard:
    # sequence(1,0) DESCENDS in Spark), so gate short docs with `when`
    parts = " , ".join(f"element_at(_t, i + {j})" for j in range(n))
    grams = F.when(
        F.size(F.col("_t")) >= n,
        F.expr(f"transform(sequence(1, size(_t) - {n - 1}), i -> concat_ws(' ', {parts}))"),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        documents.select(toks.alias("_t"))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
    )
    if top_k is not None:
        counts = counts.orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc()).limit(top_k)
    return counts


def term_drift(old: DataFrame, new: DataFrame, top_k: int = 100) -> DataFrame:
    """Term-distribution drift between two corpus snapshots over the
    combined top-k vocabulary — the canary length_band_drift can't be: a
    spam burst, language-mix shift or template rollout changes WHICH words
    dominate long before it moves document lengths. Per-term integer
    chi-square, same arithmetic as the length bands: drift_ppm =
    (n_old - n_new)^2 * 10^6 div (n_old + n_new).

    Output (term, n_old, n_new, drift_ppm) for the top_k terms by
    (n_old + n_new DESC, term ASC) — the full tiebreak keeps the cut
    deterministic under any shuffle order; a term absent from one snapshot
    counts 0 there (the strongest drift signal).

    Scale shape: each snapshot reduces to a partial-agg'd groupBy(term)
    (map-side combine collapses repeats; shuffle rows = distinct terms),
    the FULL OUTER join runs on the two count tables — already vocabulary-
    sized, not corpus-sized — and the cut is a TakeOrderedAndProject, never
    a full sort. Tokenization shares _tokens with every other text op."""

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(F.explode(_tokens(F.col("text"))).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias(out))
        )

    both = (
        counts(old, "n_old")
        .join(counts(new, "n_new"), "term", "full_outer")
        .select(
            "term",
            F.coalesce("n_old", F.lit(0).cast("bigint")).alias("n_old"),
            F.coalesce("n_new", F.lit(0).cast("bigint")).alias("n_new"),
        )
    )
    return (
        both.orderBy((F.col("n_old") + F.col("n_new")).desc(), F.col("term").asc())
        .limit(top_k)
        .withColumn(
            "drift_ppm",
            F.expr("((n_old - n_new) * (n_old - n_new) * 1000000) div (n_old + n_new)"),
        )
    )


def length_band_drift(old: DataFrame, new: DataFrame, band: int = 500, n_bins: int = 10) -> DataFrame:
    """Distribution drift between two corpus snapshots, binned by text
    length — the cheap canary a recurring-crawl pipeline watches to catch
    template rollouts, truncation bugs or boilerplate shifts before they
    poison a training mix. Integer chi-square-per-bin: drift_ppm =
    (n_old - n_new)^2 * 10^6 div (n_old + n_new) (0 for an empty bin) —
    all-integer, hash-stable across engines; callers threshold the sum.

    Output one row per bin 0..n_bins-1: (bin, n_old, n_new, drift_ppm).

    Scale shape: each snapshot reduces to n_bins partial-agg'd counts (a
    scan + a tiny shuffle); the join is n_bins rows a side. Nothing here
    grows with corpus size except the scans."""
    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.least(F.floor(F.length(F.coalesce(F.col("text"), F.lit(""))) / band), F.lit(n_bins - 1))
        return df.groupBy(b.cast("int").alias("bin")).agg(F.count("*").alias(out))

    from pyspark.sql import SparkSession

    spark = old.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    out = (
        bins.join(binned(old, "n_old"), "bin", "left")
        .join(binned(new, "n_new"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    return out.withColumn(
        "drift_ppm",
        F.when(
            F.col("n_old") + F.col("n_new") > 0,
            F.expr("((n_old - n_new) * (n_old - n_new) * 1000000) div (n_old + n_new)"),
        ).otherwise(F.lit(0).cast("bigint")),
    )


def merge_inverted_index(
    spark, path: str, new_postings: DataFrame, assert_new_docs: bool = True
) -> list[int]:
    """Incremental index maintenance: fold a new crawl batch's posting rows
    into a write_inverted_index layout, REWRITING ONLY THE TOUCHED BUCKET
    DIRECTORIES — the at-scale alternative to a full rebuild (an incremental
    batch touches a bounded set of term buckets; the other n_buckets - k
    directories are never read or written, pinned by the untouched-bytes
    test).

    Contract: the batch's doc_ids must be NEW to the index (positional
    lists of one (term, doc) can't be merged after the fact) — enforced by
    a semi-join over the WHOLE index when ``assert_new_docs``: a re-indexed
    doc's old terms can hash entirely to untouched buckets, so a
    touched-only check would pass and leave the doc indexed under both its
    stale and new terms. The check is column-pruned to doc_id (a one-column
    scan, new ids broadcast); at 100 TB keep a doc-id bloom sidecar or
    prove disjointness upstream (e.g. ids from a fresh wave) and opt out.

    Returns the rewritten bucket ids. Scale shape: distinct-bucket collect
    is <= n_buckets rows; old rows are read with a static partition filter;
    the union is localCheckpoint'd BEFORE the dynamic-partition overwrite
    (the write would otherwise race its own input files); the rewrite
    shuffles only touched-bucket rows."""
    import json
    import os

    with open(os.path.join(path, INDEX_META)) as fh:
        meta = json.load(fh)
    n_buckets = int(meta["n_buckets"])

    new_b = new_postings.withColumn(
        "term_bucket", _term_bucket_col(F.col("term"), n_buckets)
    )
    touched = sorted(
        r.term_bucket for r in new_b.select("term_bucket").distinct().collect()
    )
    if not touched:
        return []
    old = spark.read.parquet(path).filter(F.col("term_bucket").isin(touched))
    if assert_new_docs:
        overlap = (
            spark.read.parquet(path)
            .select("doc_id")
            .join(F.broadcast(new_b.select("doc_id").distinct()), "doc_id")
            .select("doc_id")
            .distinct()
            .count()
        )
        if overlap:
            raise ValueError(
                f"merge_inverted_index: {overlap} doc_ids already indexed — "
                "positional postings cannot be merged per-doc; rebuild or "
                "delete first"
            )
    merged = (
        old.unionByName(new_b)
        .repartition(len(touched), "term_bucket")
        .sortWithinPartitions("term_bucket", "term", "doc_id")
        .localCheckpoint()  # materialize BEFORE overwriting the source files
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("term_bucket")
        .parquet(path)
    )
    return touched


def template_fingerprints(pages: DataFrame, min_cluster: int = 3) -> DataFrame:
    """Structure-hash template clustering: pages rendered from one CMS
    template share their TAG SEQUENCE even when every word differs, so
    hashing the sequence of opening-tag names clusters a host's pages by
    layout. The boilerplate/line-dedup operators catch repeated TEXT; this
    catches repeated STRUCTURE — the signal used to find index/listing/
    pagination template families whose text dedup never converges (every
    calendar page is "unique" text on one template).

    Input (host, doc_id, html string). Per page: extract lowercase opening
    tag names in document order (regexp over the markup — void/self-closing
    tags count, closing tags don't add information), fingerprint with
    md5(comma-join) — md5 because the oracle engine must reproduce it
    byte-for-byte (no xxhash64 in DuckDB).

    Returns one row per (host, template) cluster:
    (host, structure_fp, n_pages, rep_doc, is_template 0/1 by
    ``min_cluster``). One partial-agg'd groupBy(host, fp) — shuffle rows =
    page count collapsing to cluster count; at 100 TB the fp projection
    rides the extraction scan and the rollup is host-template-bounded.
    """
    tags = F.expr(r"regexp_extract_all(lower(html), '<([a-z][a-z0-9]*)', 1)")
    fp = F.md5(F.concat_ws(",", tags))
    return (
        pages.select("host", "doc_id", fp.alias("structure_fp"))
        .groupBy("host", "structure_fp")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.min("doc_id").cast("bigint").alias("rep_doc"),
        )
        .withColumn("is_template", (F.col("n_pages") >= min_cluster).cast("int"))
    )


# content-density segmentation thresholds (pinned)
DENSITY_MIN_TEXT_CHARS = 20
DENSITY_MIN_RATIO_PPM = 500_000  # text chars >= 50% of the line


def content_density(pages: DataFrame) -> DataFrame:
    """Line-wise content-density segmentation (the Readability/boilerpipe
    heuristic, aggregate form): markup lines are mostly tags, main-content
    lines are mostly text, so per line the ratio
    text_chars / line_chars separates chrome from content without a DOM.
    The line-boilerplate dedup (dedup.line_boilerplate_dedup) removes text
    REPEATED across pages; this scores markup density WITHIN one page —
    the two compose into the standard main-content extraction stack.

    Input (doc_id, html string). Per page, over newline-split lines with
    tags stripped per line (global regexp_replace of <...>):

    * ``n_lines`` / ``n_content_lines`` — a content line has stripped
      length >= 20 chars AND stripped length >= 50% of the raw line;
    * ``content_chars`` — total stripped chars over content lines;
    * ``text_chars``    — total stripped chars over ALL lines;
    * ``density_ppm``   — (content_chars * 1e6) div max(text_chars, 1):
      how much of the page's text lives in dense lines — the page-level
      quality signal (index pages and nav shells score near 0).

    Pure Catalyst array math (split -> transform -> aggregate) — no
    explode, no shuffle: each page folds to one row inside the scan, the
    shape that matters when the input is 100 TB of raw HTML."""
    # bigint line lengths: the ppm comparison multiplies by 1e6/5e5 — int32
    # lengths overflow (ANSI crash) on any line past ~4 KB (minified HTML)
    stripped = F.transform(
        F.split(F.col("html"), "\n"),
        lambda ln: F.struct(
            F.length(ln).cast("bigint").alias("raw"),
            F.length(F.regexp_replace(ln, "<[^>]*>", "")).cast("bigint").alias("txt"),
        ),
    )
    is_content = (
        lambda s: (s["txt"] >= DENSITY_MIN_TEXT_CHARS)
        & (s["txt"] * PPM_DENSITY >= DENSITY_MIN_RATIO_PPM * s["raw"])
    )
    agg0 = F.lit(0).cast("bigint")
    out = pages.withColumn("_ls", stripped)
    out = (
        out.withColumn("n_lines", F.size("_ls").cast("int"))
        .withColumn(
            "n_content_lines",
            F.size(F.filter(F.col("_ls"), is_content)).cast("int"),
        )
        .withColumn(
            "content_chars",
            F.aggregate(
                F.filter(F.col("_ls"), is_content), agg0, lambda a, s: a + s["txt"]
            ),
        )
        .withColumn(
            "text_chars",
            F.aggregate(F.col("_ls"), agg0, lambda a, s: a + s["txt"]),
        )
        .withColumn(
            "density_ppm",
            F.expr(f"(content_chars * {PPM_DENSITY}) div greatest(text_chars, 1)").cast(
                "bigint"
            ),
        )
    )
    return out.select(
        "doc_id", "n_lines", "n_content_lines", "content_chars", "text_chars",
        "density_ppm",
    )


PPM_DENSITY = 1_000_000

# spam-category blocklists (pinned, lowercased exact-token match). These are
# the C4/CCNet-style quality blocklists in miniature: production swaps in
# the full lists (same shape, a broadcast set per category); token match —
# not substring — so 'scrabble' never fires on 'crab'.
BLOCKLISTS = {
    "gambling": ("casino", "poker", "betting", "jackpot", "roulette"),
    "pharma": ("viagra", "cialis", "pharmacy-discount", "pills-online"),
    "piracy": ("warez", "keygen", "serialz", "cracked-download"),
}
BLOCKLIST_MAX_HITS = 0  # any hit past this count flags the doc


def blocklist_filter(documents: DataFrame, max_hits: int = BLOCKLIST_MAX_HITS) -> DataFrame:
    """Category blocklist scoring — the safety/spam gate every webtext
    pipeline runs between language-ID and quality scoring (C4 dropped any
    page with one "bad word" hit; CCNet buckets instead). Exact
    lowercased TOKEN membership per category (substring matching is the
    classic false-positive bug), all inside the scan:

    (doc_id, gambling_hits, pharma_hits, piracy_hits, blocked) — blocked
    = 1 when ANY category exceeds ``max_hits`` (default: one hit blocks,
    the C4 rule). Per-category counts rather than one flag so policy can
    re-threshold per category WITHOUT rescanning the corpus — the counts
    table is the expensive artifact at 100 TB, the policy is a cheap
    projection over it. Pure Catalyst: size(filter(tokens IN set)); the
    sets are literal arrays (production: broadcast)."""
    toks = F.transform(_tokens(F.col("text")), lambda t: F.lower(t))
    out = documents.withColumn("_lt", toks)
    hit_cols = []
    for cat, words in BLOCKLISTS.items():
        wset = F.array(*[F.lit(w) for w in words])
        col = f"{cat}_hits"
        out = out.withColumn(
            col,
            F.size(F.filter(F.col("_lt"), lambda t: F.array_contains(wset, t))).cast(
                "int"
            ),
        )
        hit_cols.append(col)
    blocked = None
    for col in hit_cols:
        c = F.col(col) > max_hits
        blocked = c if blocked is None else (blocked | c)
    return out.withColumn("blocked", blocked.cast("int")).select(
        "doc_id", *hit_cols, "blocked"
    )


def char_entropy(documents: DataFrame) -> DataFrame:
    """Character-distribution surprisal — the gibberish/low-diversity gate
    (base64 blobs, keyboard mash, 'aaaa...' padding all have degenerate
    char distributions; natural language sits in a stable band). Exact
    INTEGER form of Shannon entropy, the same ilog2 trick as
    lm_quality_scores: per distinct char c with count k in a doc of n
    chars, surprisal_bits += k * (ilog2(n) - ilog2(k)), where
    ilog2(x) = length(bin(x)) - 1 = floor(log2 x). No floats anywhere, so
    the fold is commutative-exact and NO cross-engine ordering or IEEE
    concerns exist (why there is no sort before the fold).

    Output (doc_id, n_chars, n_distinct_chars, surprisal_bits,
    centibits_per_char = 100 * bits div max(n, 1)).

    Pure Catalyst per-doc array math (distinct chars x count-scan — the
    char alphabet is small so the quadratic term is bounded); scan-only,
    no shuffle. At 100 TB the same fold runs as-is; if alphabets blow up
    (CJK) swap the inner count-scan for one explode + groupBy(doc_id,
    char), the lm-score shape."""
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != "")
    docs = documents.withColumn("_chars", chars).withColumn(
        "_n", F.size("_chars").cast("bigint")
    )
    ilog2 = lambda c: (F.length(F.bin(c)) - 1).cast("bigint")  # noqa: E731
    counts = F.transform(
        F.array_distinct(F.col("_chars")),
        lambda ch: F.size(F.filter(F.col("_chars"), lambda x: x == ch)).cast("bigint"),
    )
    bits = F.aggregate(
        counts,
        F.lit(0).cast("bigint"),
        lambda a, k: a + k * (ilog2(F.col("_n")) - ilog2(k)),
    )
    return docs.select(
        "doc_id",
        F.col("_n").cast("int").alias("n_chars"),
        F.size(F.array_distinct(F.col("_chars"))).cast("int").alias("n_distinct_chars"),
        bits.alias("surprisal_bits"),
        F.expr("(surprisal_bits * 100) div greatest(_n, 1)")
        .cast("bigint")
        .alias("centibits_per_char"),
    )


def readability_stats(documents: DataFrame) -> DataFrame:
    """Sentence/word-shape readability profile — the Flesch-Kincaid-class
    signal without the pseudo-science constants: the raw ratios the
    formulas combine, in exact integer ppm, so policy can threshold them
    directly (very long sentences + very long words = legalese/SEO sludge;
    very short everything = listicles/nav dumps; both are curriculum
    signals, not just filters).

    Per doc: sentences split on [.!?]+ runs (empties dropped — a trailing
    '.' adds no sentence), words by the whitespace tokenizer shared with
    every text op. Output (doc_id, n_sents, n_words,
    words_per_sent_ppm = n_words * 1e6 div max(n_sents, 1),
    chars_per_word_ppm — over word chars, not raw text (whitespace and
    punctuation-only tokens count as their literal chars — pinned),
    long_word_ratio_ppm — words > 6 chars, the LIX measure's term).
    Scan-only array math, no shuffle."""
    toks = _tokens(F.col("text"))
    sents = F.filter(F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x) != "")
    n_words = F.size(toks).cast("bigint")
    n_sents = F.size(sents).cast("bigint")
    word_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
    )
    long_words = F.size(F.filter(toks, lambda t: F.length(t) > 6)).cast("bigint")
    ppm = lambda num, den: F.expr(  # noqa: E731 — exact integer div, repo-wide ppm style
        f"({num} * 1000000) div greatest({den}, 1)"
    ).cast("bigint")
    return (
        documents.withColumn("_nw", n_words)
        .withColumn("_ns", n_sents)
        .withColumn("_wc", word_chars)
        .withColumn("_lw", long_words)
        .select(
            "doc_id",
            F.col("_ns").cast("int").alias("n_sents"),
            F.col("_nw").cast("int").alias("n_words"),
            ppm("_nw", "_ns").alias("words_per_sent_ppm"),
            ppm("_wc", "_nw").alias("chars_per_word_ppm"),
            ppm("_lw", "_nw").alias("long_word_ratio_ppm"),
        )
    )


def lang_agreement(documents: DataFrame, declared_col: str = "lang") -> DataFrame:
    """Declared-vs-detected language confusion rollup — the check
    page_metadata's html_lang exists to feed: a host whose declared lang
    disagrees with the statistical lang-id at scale is machine-translated,
    scraped-and-rebadged, or keyword-stuffed (all spam classes), and a
    multilingual sampler trusting EITHER signal alone inherits its
    failure mode. Composes lang_id (stopword-vote, deterministic
    tiebreak) with the declared column and rolls up:

    (declared, lang_pred, n_docs, agree 0/1) — one row per observed
    (declared, predicted) pair; ``agree`` marks the diagonal. NULL
    declared rolls up as 'und' (undeclared is a real population, not a
    dropped row). One corpus-scan lang-id + one pair-cardinality groupBy."""
    pred = lang_id(documents).select("doc_id", "lang_pred")
    declared = documents.select(
        "doc_id", F.coalesce(F.col(declared_col), F.lit("und")).alias("declared")
    )
    return (
        declared.join(pred, "doc_id")
        .groupBy("declared", "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .withColumn("agree", (F.col("declared") == F.col("lang_pred")).cast("int"))
    )


def pmi_pairs(
    documents: DataFrame, window: int = 3, min_count: int = 3
) -> DataFrame:
    """Windowed co-occurrence with integer PMI — the collocation signal
    ("new york", "click here") used for phrase mining AND for boilerplate
    spotting (navigation collocations have freakish PMI at corpus scale).
    A pair is one token co-occurring with another at distance 1..window
    AHEAD (forward window — each unordered pair is counted once per
    occurrence, keyed with the two tokens sorted so (a,b) == (b,a)).

    pmi_bits = ilog2(c_ab * n_tokens) - ilog2(c_a * c_b) — the lm-score
    integer-surprisal idiom: exact, engine-independent, and monotone in
    the real PMI (floor-log loses < 1 bit, irrelevant for thresholding).
    Output (tok_a, tok_b, c_ab, pmi_bits) for pairs with c_ab >=
    ``min_count``; tok_a < tok_b.

    Plan: pair generation is a per-doc array expression (flattened
    transform over positions x offsets — no self-join on positions, the
    naive shape), then ONE corpus-sized explode + partial-agg'd groupBy
    on the pair; the two count joins after are vocab-sized. Shuffle rows
    = token count x window — the window factor is the honest cost, same
    as any n-gram pass."""
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    # one zip_with per offset k over sliced arrays — vectorized array ops,
    # NOT a per-position lambda over element_at (the naive nested-transform
    # form was ~30x slower at 10x gate scale: per-position struct lambdas
    # defeat codegen the same way the substring pass's first kernel did)
    parts = []
    for k in range(1, window + 1):
        length = F.greatest(n - k, F.lit(0))
        a = F.slice(toks, 1, length)
        b = F.slice(toks, k + 1, length)
        parts.append(
            F.zip_with(
                a,
                b,
                lambda x, y: F.struct(
                    F.least(x, y).alias("tok_a"), F.greatest(x, y).alias("tok_b")
                ),
            )
        )
    pairs = F.concat(*parts)
    exploded = documents.select(F.explode(pairs).alias("p")).select(
        F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b")
    )
    pair_counts = exploded.groupBy("tok_a", "tok_b").agg(
        F.count("*").cast("bigint").alias("c_ab")
    ).filter(F.col("c_ab") >= min_count)
    tok_counts = (
        documents.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    total = documents.select(F.sum(F.size(_tokens(F.col("text")))).cast("bigint").alias("n_total"))
    ilog2 = lambda c: (F.length(F.bin(c)) - 1).cast("bigint")  # noqa: E731
    ca = tok_counts.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    cb = tok_counts.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    return (
        pair_counts.join(ca, "tok_a")
        .join(cb, "tok_b")
        .crossJoin(F.broadcast(total))
        .select(
            "tok_a", "tok_b",
            F.col("c_ab").cast("int").alias("c_ab"),
            (ilog2(F.col("c_ab") * F.col("n_total"))
             - ilog2(F.col("c_a") * F.col("c_b"))).alias("pmi_bits"),
        )
    )


def hash_embedding(documents: DataFrame, dims: int = 64) -> DataFrame:
    """Feature-hashing bag-of-words embedding (Weinberger et al. 2009):
    each token hashes to one of ``dims`` buckets and the document's
    vector is the bucket-count histogram — the embedding you get WITHOUT
    a model, dimensionality fixed by construction, exactly mergeable
    (vectors of doc halves sum), and the standard cheap input to the ANN/
    clustering stack when no learned embeddings exist yet. Sign-hash
    variants reduce bias; the unsigned count form is pinned here because
    the oracle must be value-exact and counts are the interpretable form
    for corpus diagnostics.

    Output EXPLODED as (doc_id, dim, cnt) with zero buckets absent — the
    sparse form: at 100 TB the dense array column wastes storage on
    zeros and the sparse rows feed groupBy-style aggregation directly
    (pivot to dense is one groupBy when a consumer wants vectors).
    Hash = the DuckDB-reproducible square-mod poly (the MinHash hash)
    mod dims. One explode + partial-agg'd groupBy(doc_id, dim)."""
    from ..operators.dedup import _sql_str_hash31

    toks = documents.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    dim = F.pmod(_sql_str_hash31(F.col("tok")), F.lit(dims)).cast("int")
    return (
        toks.select("doc_id", dim.alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def vocab_growth(documents: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Heaps-law vocabulary growth — distinct terms seen as the corpus
    grows, in ``n_buckets`` equal doc_id-order slices: natural corpora
    add vocabulary sublinearly (V ~ k·N^b, b≈0.5); a FLAT tail means the
    crawl is re-reading one template universe, a LINEAR tail means
    id/hash junk is leaking through tokenization — both one-glance
    diagnoses from this 10-row table.

    Bucket of a doc = its doc_id RANK (dense, order by doc_id) sliced
    into equal parts — rank, not raw id, so deletions/sparse ids don't
    skew slice sizes. Per term the FIRST bucket it appears in wins; the
    output row per bucket carries n_new_terms and the running
    cum_terms.

    Scale shape: the global dense_rank runs over a ``doc_id``-ONLY
    projection (8 bytes/row through the unavoidable single-partition
    sort — the epoch-shuffle shape, operators/sampling.py), and the
    (doc_id -> bucket) map joins back to the corpus BEFORE the token
    explode (guide §3.3: join on the un-exploded key, explode after);
    per-doc array_distinct shrinks the explode without changing the
    per-term min. The corpus text NEVER crosses a partitionless window
    (pinned by tests/test_round6_opt.py). Then one explode + per-term
    min agg (vocab-sized) + a bucket-cardinality rollup with a
    running-sum window over ``n_buckets`` rows."""
    from pyspark.sql import Window

    bucket_map = documents.select("doc_id").select(
        "doc_id",
        F.dense_rank().over(Window.orderBy("doc_id")).alias("_rk"),
    )
    total = documents.count()
    per_bucket = max(1, -(-total // n_buckets))  # ceil
    bucket_map = bucket_map.select(
        "doc_id", ((F.col("_rk") - 1) / per_bucket).cast("int").alias("bucket")
    )
    terms = (
        documents.select(
            "doc_id", F.array_distinct(_tokens(F.col("text"))).alias("_toks")
        )
        .join(bucket_map, "doc_id")
        .select("bucket", F.explode("_toks").alias("term"))
    )
    first_seen = terms.groupBy("term").agg(F.min("bucket").alias("bucket"))
    counts = first_seen.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_new_terms")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return counts.withColumn(
        "cum_terms", F.sum("n_new_terms").over(w).cast("bigint")
    ).select("bucket", "n_new_terms", "cum_terms")
