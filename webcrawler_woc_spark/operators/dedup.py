"""Deduplication operators for training-data pipelines over ``documents``.

The reference crawler's only dedup is URL-identity (HashSet membership,
src/crawler.rs:82-99); a 100 TB web-text pipeline additionally needs
*content* dedup. All hot-path math here stays JVM-side (shingles, hashing,
joins as Catalyst expressions); only SimHash uses an Arrow-batched numpy UDF.

Scale notes:
* exact dedup: hash-groupBy on the full text — one shuffle on xxhash64(text)
  (group on the 8-byte hash, verify text equality inside the group).
* n-gram Jaccard: exact pairwise via shingle inverted index (explode + self
  join). Quadratic in the worst case — at 100 TB this is the VERIFY stage
  applied after MinHash-LSH candidate generation, never standalone.
* MinHash+LSH: signatures via per-permutation min over JVM-hashed shingles;
  banding => candidate pairs meet only inside LSH buckets (the classic
  shuffle-bounded near-dup path); candidates verified with exact Jaccard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1
POLY_MOD = 10**15 - 11  # same field as textstats.FINGERPRINT_MOD / fetch.FETCH_MS_MOD

# Java regex \s is ASCII-only; Python str.split() splits on every Unicode
# whitespace codepoint. This class is their union, so JVM-side tokenization
# stays position-parallel with the Python window-hash kernel on text carrying
# U+00A0 / U+2000-200A etc. Built with chr() (not literals): editors/NFC
# passes can silently normalize raw codepoints in source.
PY_WS_REGEX = (
    "[\\s"
    + "".join(chr(c) for c in (0x1C, 0x1D, 0x1E, 0x1F, 0x85, 0xA0, 0x1680))
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "".join(chr(c) for c in (0x2028, 0x2029, 0x202F, 0x205F, 0x3000))
    + "]+"
)


def _sql_str_hash31(col, mult: int = 31):
    """SQL-expressible string hash into the Mersenne-31 field: rolling
    polynomial (mod a 10^15 prime, all intermediates < 2^63) followed by a
    square-and-mod mix — the raw rolling hash has no avalanche (strings
    sharing a prefix land in one contiguous block), squaring scatters them.
    Exactly reproducible in DuckDB via list_reduce over ascii codes, which is
    what makes MinHash/SimHash oracle-checkable (xxhash64 is not in DuckDB).
    """
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * mult + F.ascii(c)) % POLY_MOD,
    )
    m = F.pmod(fp, F.lit(MERSENNE31))
    return F.pmod(m * m, F.lit(MERSENNE31))


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact-duplicate clusters by full text.

    Returns (rep_id, n_dups, text_len) for every text with >= 1 row, where
    rep_id = min doc_id of the cluster. Group key is the full text (the
    xxhash64 pre-bucketing optimization is applied transparently by grouping
    on the hash first — collisions are resolved because text is also a key).
    """
    return (
        documents.groupBy(F.xxhash64("text").alias("text_hash"), F.col("text"))
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.count("*").alias("n_dups"),
            F.length(F.min("text")).alias("text_len"),
        )
        .select("rep_id", "n_dups", "text_len")
    )


def _np_poly_squares(uniq: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """Vectorized dual rolling-poly hash over CODEPOINTS for an array of
    distinct tokens: returns (m1, m2), the square-mod-Mersenne31 mixes of
    the mult-31 and mult-131 Horner folds — the numpy twin of
    _sql_str_hash31 (m1) and the second simhash component (m2).

    Horner runs column-parallel over a ragged codepoint array: the
    concatenated vocab decodes to one utf-32 buffer (one C-level pass, no
    per-char Python), then max_token_len vectorized rounds fold position p
    into every token long enough to have one. All intermediates stay < 2^63
    (POLY_MOD*131 + cp ~ 1.3e17). Codepoints, not utf-8 bytes: the DuckDB
    twin hashes via ascii(char) == ord(char) — bytes would silently diverge
    on the first non-ASCII token."""
    lengths = np.fromiter((len(t) for t in uniq), dtype=np.int64, count=len(uniq))
    codes = np.frombuffer("".join(uniq.tolist()).encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    offsets = np.zeros(len(uniq), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    p1 = np.zeros(len(uniq), dtype=np.int64)
    p2 = np.zeros(len(uniq), dtype=np.int64)
    max_len = int(lengths.max()) if len(lengths) else 0
    for pos in range(max_len):
        active = lengths > pos
        c = codes[offsets[active] + pos]
        p1[active] = (p1[active] * 31 + c) % POLY_MOD
        p2[active] = (p2[active] * 131 + c) % POLY_MOD
    m1 = (p1 % MERSENNE31) ** 2 % MERSENNE31
    m2 = (p2 % MERSENNE31) ** 2 % MERSENNE31
    return m1, m2


def _np_token_hash31(uniq: "np.ndarray") -> "np.ndarray":
    """The mult-31 square-mod token hash (== _sql_str_hash31), vectorized."""
    return _np_poly_squares(uniq)[0]


def exact_substring_dups(documents: DataFrame, k: int = 8) -> DataFrame:
    """Cross-document EXACT SUBSTRING detection (the Lee et al. 2022
    'Deduplicating Training Data' pass, window-hash form): every k-token
    window of every document is hashed, and windows whose hash occurs in
    two or more distinct documents are reported — the memorization-prone
    repeated spans that full-document and paragraph dedup both miss
    (boilerplate, licenses, quoted chains shorter than a paragraph).

    Output (whash, n_docs, n_occurrences, first_doc) for windows with
    n_docs >= 2, ordered nowhere (aggregate).

    Plan shape: the window hashes come from ONE Arrow-batched numpy kernel
    (the same vectorization pattern as simhash62: distinct-token memoization
    per batch, utf-32 codepoint Horner for the square-mod token hash — the
    IDENTICAL math _sql_str_hash31 expresses in SQL, so the DuckDB twin is
    still value-exact — then a batch-wide sliding-window fold with cross-doc
    windows masked out). The previous pure-Catalyst form (per-token
    aggregate over split chars × per-window aggregate over slices) was the
    repo's slowest kernel at 10× gate scale (~45 s vs ~1 s for this one);
    the explode + partial-agg'd groupBy on the 8-byte hash is unchanged and
    remains the shuffle cost driver at 100 TB. Hash collisions can merge
    distinct windows — ``verify_substring_dups`` is the composable
    content-verify stage that joins reported groups back to the corpus and
    compares the actual window text; at this gate the hash IS the contract
    (both engines compute the identical fold)."""
    w = documents.select(
        "doc_id", F.explode(_window_hash_udf(k)(F.col("text"))).alias("whash")
    )
    return (
        w.groupBy("whash")
        .agg(
            F.countDistinct("doc_id").cast("int").alias("n_docs"),
            F.count("*").cast("int").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def _window_hash_udf(k: int):
    """The Arrow-batched k-token window-hash kernel shared by
    exact_substring_dups (hash report) and verify_substring_dups (content
    verify): text -> [whash per window position], position order preserved
    so posexplode yields (pos, whash)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def window_hashes(texts: pd.Series) -> pd.Series:
        n_docs = len(texts)
        empty: list[int] = []
        if n_docs == 0:
            return pd.Series([], dtype=object)
        toks_per_doc = [(t or "").split() for t in texts]
        counts = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=n_docs)
        all_toks = [tok for toks in toks_per_doc for tok in toks]
        total = len(all_toks)
        if total < k:
            return pd.Series([empty] * n_docs)
        uniq, inverse = np.unique(np.array(all_toks, dtype=object), return_inverse=True)
        hs = _np_token_hash31(uniq)[inverse]
        # batch-wide sliding fold: w_i = fold over hs[i:i+k]; windows that
        # straddle a document boundary are simply never sliced out below
        sw = np.lib.stride_tricks.sliding_window_view(hs, k)
        w = np.zeros(len(sw), dtype=np.int64)
        for j in range(k):
            w = (w * 31 + sw[:, j]) % POLY_MOD
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        out = []
        for d in range(n_docs):
            nw = counts[d] - k + 1
            if nw <= 0:
                out.append(empty)
            else:
                out.append(w[offsets[d] : offsets[d] + nw].tolist())
        return pd.Series(out)

    return window_hashes


def verify_substring_dups(
    documents: DataFrame, dups: DataFrame | None = None, k: int = 8
) -> DataFrame:
    """Content-verify stage for exact_substring_dups: re-derive the k-token
    windows of the REPORTED hash groups and regroup them by the actual
    window text, so 31-bit-mixed hash collisions can never merge distinct
    spans (a colliding whash splits into one row per distinct text, and
    splinters with < 2 distinct docs drop out).

    Output (whash, wtext, n_docs, n_occurrences, first_doc) — the verified
    twin of the hash report: equal text implies equal hash, so the verified
    rows are exactly the true duplicated spans, independent of collisions.

    Plan shape (the Lee et al. production step): one left-semi join of the
    exploded (doc_id, pos, whash) stream against the (small, aggregate)
    report keyed on whash prunes the corpus to reported spans only; the
    surviving positions join back to the documents table on doc_id (one
    hash shuffle co-partitioned with the corpus) and slice the window text
    JVM-side (split + slice + concat_ws, no second Python pass). Window
    text is materialized ONLY for reported spans — never for the full
    explode. Tokenization parity: the Catalyst split pattern is the FULL
    Unicode-whitespace class Python's ``str.split()`` uses (Java ``\\s`` is
    ASCII-only; NFC-normalized corpora carry U+00A0/U+2000-200A, which would
    shift token positions relative to the kernel and slice the wrong window).
    """
    positions = documents.select(
        "doc_id", F.posexplode(_window_hash_udf(k)(F.col("text"))).alias("pos", "whash")
    )
    if dups is None:
        # derive the hash report from a PINNED positions frame so the Arrow
        # window-hash kernel (the corpus's dominant Python cost) runs ONCE —
        # calling exact_substring_dups here would run it a second time. At
        # 100 TB the pin trades explode-sized storage for a kernel re-run;
        # pass a precomputed ``dups`` report to skip the pin entirely.
        positions = positions.localCheckpoint()
        dups = (
            positions.groupBy("whash")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
        )
    positions = positions.join(dups.select("whash"), "whash", "left_semi")
    toks = F.filter(F.split(F.col("text"), PY_WS_REGEX), lambda x: x != "")
    spans = positions.join(documents.select("doc_id", toks.alias("toks")), "doc_id").select(
        "whash",
        "doc_id",
        F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos") + 1, F.lit(k))).alias("wtext"),
    )
    return (
        spans.groupBy("whash", "wtext")
        .agg(
            F.countDistinct("doc_id").cast("int").alias("n_docs"),
            F.count("*").cast("int").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def char_shingles(documents: DataFrame, n: int = 16) -> DataFrame:
    """(doc_id, shingle) distinct character n-grams — pure Catalyst
    (sequence + transform + substring), no Python."""
    # F.substring needs a literal pos, so the dynamic slice uses expr()
    return documents.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(f"transform(sequence(1, greatest(length(text) - {n - 1}, 1)), i -> substr(text, i, {n}))")
            )
        ).alias("shingle"),
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 16, threshold: float = 0.5, shingles: DataFrame | None = None
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (doc_a < doc_b, jaccard >= t).

    inverted-index self-join: |A ∩ B| from the shingle join, |A ∪ B| from the
    per-doc set sizes. Output (doc_a, doc_b, n_common, n_union) — integers,
    hash-stable across engines; the threshold predicate is the exact integer
    inequality n_common >= t * n_union (no float rounding anywhere).

    ``shingles`` lets the caller pass an already-cached char_shingles(n) frame
    so the (dominant) shingle explode is computed once per pipeline.
    """
    sh = shingles if shingles is not None else char_shingles(documents, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    # threshold t as exact rational: n_common * denom >= numer * n_union
    numer, denom = int(round(threshold * 1000)), 1000
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_union", F.col("size_a") + F.col("size_b") - F.col("n_common"))
        .filter(F.col("n_common") * denom >= numer * F.col("n_union"))
        .select("doc_a", "doc_b", "n_common", "n_union")
    )


def containment_pairs(
    documents: DataFrame, n: int = 16, threshold: float = 0.9, shingles: DataFrame | None = None
) -> DataFrame:
    """ASYMMETRIC shingle-containment near-dup pairs — the wrapper-page
    catch symmetric Jaccard structurally misses: a short doc quoted whole
    inside a much larger page has J = |A|/|B| ~ 0 but containment
    C(A -> B) = |S(A) ∩ S(B)| / |S(A)| = 1 (the Broder resemblance/
    containment split; RefinedWeb-class pipelines drop the contained copy
    and keep the container).

    Output one DIRECTED row per passing direction: (inner_doc, outer_doc,
    n_common, size_inner, size_outer) where the exact integer predicate
    n_common * 1000 >= t*1000 * size_inner holds — near-identical docs emit
    both directions. Integers only, hash-stable across engines.

    Scale shape: same contract as ngram_jaccard_pairs — the VERIFY stage
    behind LSH/MinHash candidate generation at 100 TB, never standalone
    (the shingle inverted-index self-join is corpus-quadratic in the worst
    case; candidates bound it). The undirected candidate join runs ONCE
    (doc_a < doc_b) and both directions are evaluated from the same joined
    row, so containment costs exactly what Jaccard costs. The shingle
    frame is cached (as in ngram_jaccard_pairs) — its three consumers
    (both join sides + the size agg) would otherwise each re-run the
    explode + per-doc distinct over the corpus."""
    sh = shingles if shingles is not None else char_shingles(documents, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    joined = common.join(sa, "doc_a").join(sb, "doc_b")
    numer, denom = int(round(threshold * 1000)), 1000
    fwd_ok = F.col("n_common") * denom >= numer * F.col("size_a")
    rev_ok = F.col("n_common") * denom >= numer * F.col("size_b")
    # ONE plan, not a union of two (a union would re-run the quadratic
    # shingle join + aggs per branch): filter to rows passing either
    # direction, then explode the passing direction structs row-side
    dirs = F.array(
        F.struct(
            F.col("doc_a").alias("inner_doc"),
            F.col("doc_b").alias("outer_doc"),
            F.col("n_common").alias("n_common"),
            F.col("size_a").alias("size_inner"),
            F.col("size_b").alias("size_outer"),
            fwd_ok.alias("ok"),
        ),
        F.struct(
            F.col("doc_b").alias("inner_doc"),
            F.col("doc_a").alias("outer_doc"),
            F.col("n_common").alias("n_common"),
            F.col("size_b").alias("size_inner"),
            F.col("size_a").alias("size_outer"),
            rev_ok.alias("ok"),
        ),
    )
    return (
        joined.filter(fwd_ok | rev_ok)
        .select(F.explode(F.filter(dirs, lambda s: s["ok"])).alias("_d"))
        .select("_d.inner_doc", "_d.outer_doc", "_d.n_common", "_d.size_inner", "_d.size_outer")
    )


def _minhash_perm(hash_col, i: int):
    """i-th permutation of a shingle hash: Carter-Wegman over the Mersenne-31
    field. The 64-bit xxhash is first reduced mod M31 so every intermediate
    product stays far inside int64 (Spark 4 ANSI mode throws on overflow)."""
    a = 2 * i + 3  # odd multiplier, coprime with M31
    b = (i + 1) * 2654435761 % MERSENNE31
    h31 = F.pmod(hash_col, F.lit(MERSENNE31))
    return F.pmod(h31 * F.lit(a) + F.lit(b), F.lit(MERSENNE31))


def minhash_signatures(
    documents: DataFrame, n: int = 16, n_perms: int = 16, shingles: DataFrame | None = None
) -> DataFrame:
    """(doc_id, sig array<bigint>) MinHash signatures, all JVM-side:
    shingle -> square-mod poly hash (SQL-expressible, see _sql_str_hash31)
    -> per-permutation min aggregation. At production scale xxhash64 would
    be a cheaper drop-in; the poly hash keeps the DuckDB oracle exact."""
    sh = shingles if shingles is not None else char_shingles(documents, n)
    hashed = sh.select("doc_id", _sql_str_hash31(F.col("shingle")).alias("h"))
    aggs = [F.min(_minhash_perm(F.col("h"), i)).alias(f"m{i}") for i in range(n_perms)]
    sigs = hashed.groupBy("doc_id").agg(*aggs)
    return sigs.select("doc_id", F.array(*[F.col(f"m{i}") for i in range(n_perms)]).alias("sig"))


def minhash_lsh_candidates(
    documents: DataFrame,
    n: int = 16,
    n_perms: int = 16,
    bands: int = 8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding (doc_a < doc_b, distinct).

    rows_per_band = n_perms // bands; band key = hash of the band's slice of
    the signature; pairs meet only within a band bucket => the join never
    goes quadratic globally.
    """
    rows_per_band = n_perms // bands
    sigs = minhash_signatures(documents, n, n_perms, shingles=shingles)
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    # pin the (docs x bands)-sized band table: both self-join sides read it,
    # and unpinned lineage would build the signature aggregation twice
    band_rows = band_rows.localCheckpoint()
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup(
    documents: DataFrame, n: int = 16, n_perms: int = 16, bands: int = 8, threshold: float = 0.5
) -> DataFrame:
    """LSH candidates verified by exact Jaccard (the standard two-stage
    near-dup pipeline). Output (doc_a, doc_b, jaccard).

    The shingle explode (the dominant cost: |corpus| * text_len rows) is
    computed ONCE and cached; both the signature build and the exact verify
    read the cache."""
    sh = char_shingles(documents, n).cache()
    cand = minhash_lsh_candidates(documents, n, n_perms, bands, shingles=sh)
    exact = ngram_jaccard_pairs(documents, n, threshold, shingles=sh)
    return cand.join(exact, ["doc_a", "doc_b"], "inner").select(
        "doc_a", "doc_b", "n_common", "n_union"
    )


def simhash62(documents: DataFrame) -> DataFrame:
    """62-bit SimHash over whitespace tokens (Arrow-batched numpy kernel).

    Token hash = two independent square-mod rolling-poly hashes (multipliers
    31 and 131 over the 10^15 field, mixed into Mersenne-31) packed as
    ``h = m1 * 2^31 + m2`` — 62 bits, every intermediate < 2^63, so the
    identical integer math runs in DuckDB BIGINT and the oracle can check
    values exactly (the previous FNV-64 needed uint64 wraparound, which SQL
    lacks). Bits 62/63 are always 0; hamming semantics are unchanged.
    The bit-vote accumulation stays a vectorized numpy kernel per Arrow batch
    (north-rule pattern: no per-row Python inside Spark's hot path)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        n_docs = len(texts)
        out = np.zeros(n_docs, dtype=np.int64)
        if n_docs == 0:
            return pd.Series(out)
        toks_per_doc = [(t or "").split() for t in texts]
        counts = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=n_docs)
        all_toks = [tok for toks in toks_per_doc for tok in toks]
        if not all_toks:
            return pd.Series(out)
        # hash each DISTINCT token once (vocab << token stream), then scatter
        uniq, inverse = np.unique(np.array(all_toks, dtype=object), return_inverse=True)
        uniq_hashes = _hash_tokens_vec(uniq)
        tok_hashes = uniq_hashes[inverse]
        doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        # bit votes per doc without the (n_tokens, 64) matrix: per bit,
        # votes = 2*count(bit set) - n_tokens (all-integer)
        sim = np.zeros(n_docs, dtype=np.int64)
        for b in range(62):  # bits 62/63 of the 62-bit hash are always 0
            bit_set = ((tok_hashes >> np.int64(b)) & np.int64(1)).astype(bool)
            ones = np.bincount(doc_ids[bit_set], minlength=n_docs)
            votes = 2 * ones - counts
            sim |= (votes > 0).astype(np.int64) << np.int64(b)
        out[counts > 0] = sim[counts > 0]
        return pd.Series(out)

    def _hash_tokens_vec(uniq: np.ndarray) -> np.ndarray:
        """62-bit dual hash m1 * 2^31 + m2 from the shared vectorized
        codepoint-Horner kernel (_np_poly_squares)."""
        m1, m2 = _np_poly_squares(uniq)
        return m1 * (1 << 31) + m2

    return documents.select("doc_id", simhash_udf(F.col("text")).alias("simhash"))


# back-compat alias (the signature is still a single BIGINT column)
simhash64 = simhash62


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded on 4x16-bit chunks
    (two equal chunks guaranteed when distance <= 8 in <= 2 differing
    chunks; standard probing compromise). Output (doc_a, doc_b, hamming)."""
    sh = simhash64(documents).cache()
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ck"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.ck").alias("ck"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        # hamming filter BEFORE the distinct: a pair matches in <= 2 chunk
        # bands, so the raw join emits each pair up to twice — filtering
        # first shrinks the distinct's exchange to the (rare) near pairs
        # instead of every banded candidate (guide §2.3); bit_count is a
        # scan-cheap scalar, the dedup shuffle is not
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def dedup_clusters(pairs: DataFrame, iterations: int = 5) -> DataFrame:
    """Canonicalize verified near-dup PAIRS into clusters and pick a keeper.

    A pair list alone can't drive deletion: {A,B}, {B,C} must collapse to one
    surviving document, not two independent keeps. This runs min-label
    propagation (graph.connected_components) over the pair graph restricted
    to pair-touched vertices — at 100 TB that vertex set is tiny relative to
    the corpus (only near-dups enter it), so each round is one bounded
    shuffle. Fixed ``iterations`` rounds is part of the contract (near-dup
    cluster diameters are short chains; 5 hops covers them at our
    thresholds and keeps the DuckDB oracle a chained CTE).

    Output (doc_id, cluster_id, is_kept): cluster_id = min doc_id within
    ``iterations`` hops; keeper = the min itself (deterministic keep-first
    rule, matching exact_dedup's keep-min semantics).
    """
    from webcrawler_woc_spark.operators.graph import connected_components

    # pin the pair list ONCE: every propagation round joins the edge list,
    # and nodes/edges both derive from ``pairs`` — without the pin the
    # whole upstream pair pipeline (LSH banding + verify, corpus-scale)
    # re-executes once per consumer per round (measured 81s -> 12s on the
    # minhash keepmin query at sf0.1). The pinned frame is pair-graph
    # sized: only near-dups enter it, tiny relative to the corpus.
    pairs = pairs.select("doc_a", "doc_b").localCheckpoint()
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = connected_components(nodes, edges, iterations=iterations)
    return labels.select(
        "doc_id",
        F.col("component").alias("cluster_id"),
        (F.col("doc_id") == F.col("component")).alias("is_kept"),
    )


def paragraph_dedup(documents: DataFrame, chunk_tokens: int = 3) -> DataFrame:
    """Sub-document (paragraph-level) dedup, the CCNet/Dolma shape: chunk
    each document into fixed-token "paragraphs", keep only the globally
    FIRST occurrence of every distinct chunk (order: doc_id, then position),
    and reassemble each document from its surviving chunks in original
    order. Boilerplate repeated across pages (headers, footers, navigation)
    disappears from every copy but the first.

    Output (doc_id, n_chunks, n_kept, cleaned_text) — cleaned_text is ''
    when every chunk was seen earlier (the doc drops entirely).

    Scale shape: one explode (bounded: n_tokens/chunk_tokens rows per doc),
    one window shuffle on the chunk hash for first-occurrence, one groupBy
    doc_id for reassembly; array_sort on (idx, chunk) structs makes the
    rebuild order deterministic whatever order collect_list saw."""
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    k = chunk_tokens
    n_chunks = F.ceil(F.size("t") / F.lit(k)).cast("int")
    chunks = (
        documents.select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            F.when(
                F.size("t") > 0,
                F.expr(
                    f"transform(sequence(0, int(ceil(size(t) / {k})) - 1),"
                    f" i -> struct(i AS idx, array_join(slice(t, i * {k} + 1, {k}), ' ') AS chunk))"
                ),
            ).otherwise(F.expr("CAST(array() AS array<struct<idx:int,chunk:string>>)"))
            .alias("cs"),
            n_chunks.alias("n_chunks"),
        )
        .select("doc_id", "n_chunks", F.explode_outer("cs").alias("c"))
        .select("doc_id", "n_chunks", F.col("c.idx").alias("idx"), F.col("c.chunk").alias("chunk"))
    )
    w = Window.partitionBy("chunk").orderBy(F.col("doc_id").asc(), F.col("idx").asc())
    kept = chunks.withColumn("rn", F.row_number().over(w)).filter(
        F.col("chunk").isNull() | (F.col("rn") == 1)
    )
    assembled = kept.groupBy("doc_id").agg(
        F.max("n_chunks").alias("n_chunks"),
        F.count("chunk").cast("bigint").alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("chunk").isNotNull(),
                                F.struct(F.col("idx"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
    )
    # a doc whose EVERY chunk was first seen elsewhere has no surviving rows
    # at all — restore it as fully-deduped (0 kept, empty text) with its
    # TRUE chunk count from the pre-dedup chunk frame
    totals = chunks.groupBy("doc_id").agg(F.max("n_chunks").alias("n_chunks"))
    return totals.join(assembled.drop("n_chunks"), "doc_id", "left").select(
        "doc_id",
        F.col("n_chunks").cast("int").alias("n_chunks"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
        F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
    )


def line_boilerplate_dedup(documents: DataFrame, min_docs: int = 5) -> DataFrame:
    """Cross-document LINE-level boilerplate removal (the CCNet/RefinedWeb
    line-dedup pass, distinct from paragraph_dedup's first-occurrence rule):
    a line occurring in >= min_docs DISTINCT documents is boilerplate
    (cookie banners, nav bars, copyright footers) and is dropped from EVERY
    document — including the first; unique and low-frequency lines survive
    everywhere.

    Output (doc_id, clean_text, n_lines, n_removed) — clean_text rebuilt
    from surviving lines in original order ('' when everything was
    boilerplate).

    Scale shape: one posexplode (bounded by line count), one partial-agg'd
    groupBy(line) for the distinct-doc counts (the only corpus-sized
    shuffle, keyed on the line itself — the same key the rebuild join
    uses), a left join marking boilerplate rows, and one groupBy(doc_id)
    reassembly via the deterministic struct array_sort used by
    paragraph_dedup. The boilerplate table is NOT broadcast by hint: its
    size is data-dependent (could be millions of lines at 100 TB), so AQE
    picks broadcast only when it measures small."""
    # posexplode_OUTER: a NULL-text doc keeps one (null, null) row so it
    # survives to the output as (doc_id, '', 0, 0) — an inner explode would
    # silently drop the document from the cleaned corpus
    lines = documents.select(
        "doc_id", F.posexplode_outer(F.split(F.col("text"), "\n")).alias("idx", "line")
    )
    boiler = (
        lines.filter(F.col("line").isNotNull())
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("line", F.lit(True).alias("_b"))
    )
    marked = lines.join(boiler, "line", "left")
    return marked.groupBy("doc_id").agg(
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_b").isNull() & F.col("line").isNotNull(),
                                F.struct(F.col("idx"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ),
            F.lit(""),
        ).alias("clean_text"),
        F.count("line").cast("int").alias("n_lines"),
        F.coalesce(F.sum(F.col("_b").cast("int")), F.lit(0)).cast("int").alias("n_removed"),
    )


def editdistance_pairs(
    left: DataFrame,
    right: DataFrame,
    prefix_len: int = 16,
    max_dist: int = 6,
) -> DataFrame:
    """Edit-distance-verified near-duplicate pairs WITHOUT all-pairs: the
    trailing verify stage of a fuzzy-dedup pass (OCR noise, template fills,
    truncated mirrors — byte-level edits that shingle/minhash families
    blur over but Levenshtein measures exactly).

    Inputs are (doc_id, text); output one row per cross pair within
    Levenshtein <= max_dist: (doc_id_a, doc_id_b, dist).

    Scale shape: candidate generation is a PREFIX-BUCKETED equi-join —
    both sides shuffle once on substring(text, 1, prefix_len) and the
    quadratic Levenshtein DP runs only inside a bucket, never across the
    corpus (the plan is a plain shuffled hash/sort-merge join, no
    cartesian; pinned by the plan audit). The prefix bucket is the classic
    blocking key for edit distance: any pair differing in the first
    prefix_len bytes already has distance > 0 there, and near-dup families
    in web data overwhelmingly share long prefixes (mirrors, template
    fills mutate tails). Pairs whose edits fall INSIDE the prefix are
    missed by construction — callers widen recall by unioning a
    suffix-bucketed pass, exactly like LSH adds bands. levenshtein() runs
    JVM-side (whole-stage codegen), no Python in the loop."""
    a = left.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("text").alias("text_a"),
        F.substring("text", 1, prefix_len).alias("_pfx"),
    )
    b = right.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("text").alias("text_b"),
        F.substring("text", 1, prefix_len).alias("_pfx"),
    )
    return (
        a.join(b, "_pfx")
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= max_dist)
        .select("doc_id_a", "doc_id_b", F.col("dist").cast("int").alias("dist"))
    )


def _cdc_chunk_frame(documents: DataFrame, divisor: int) -> DataFrame:
    """The shared CDC kernel: (doc_id, chunk_hash, chunk_len) rows, one
    Arrow-batched mapInPandas pass (see cdc_chunk_dups for the boundary
    rule and scale notes); consumed by cdc_chunk_dups and cdc_version_pairs."""
    from pyspark.sql.types import LongType, IntegerType, StructField, StructType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("chunk_hash", LongType()),
            StructField("chunk_len", IntegerType()),
        ]
    )
    D = divisor

    def chunk_batches(frames):
        for pdf in frames:
            rows_doc: list[int] = []
            texts = pdf["text"].tolist()
            ids = pdf["doc_id"].tolist()
            toks_per_doc = [(t or "").split() for t in texts]
            all_toks = [tok for toks in toks_per_doc for tok in toks]
            if all_toks:
                uniq, inverse = np.unique(
                    np.array(all_toks, dtype=object), return_inverse=True
                )
                hs_all = _np_token_hash31(uniq)[inverse]
            else:
                hs_all = np.zeros(0, dtype=np.int64)
            off = 0
            starts_all: list[np.ndarray] = []
            lens_all: list[np.ndarray] = []
            for did, toks in zip(ids, toks_per_doc):
                n = len(toks)
                if n == 0:
                    off += n
                    continue
                hs = hs_all[off : off + n]
                off += n
                # 0-based indices AFTER which a boundary falls, + forced end
                cuts = np.flatnonzero(hs % D == 0) + 1
                if len(cuts) == 0 or cuts[-1] != n:
                    cuts = np.append(cuts, n)
                starts = np.concatenate(([0], cuts[:-1]))
                lens = cuts - starts
                starts_all.append(starts + (off - n))
                lens_all.append(lens)
                rows_doc.extend([did] * len(cuts))
            if rows_doc:
                starts_cat = np.concatenate(starts_all)
                lens_cat = np.concatenate(lens_all)
                acc = np.zeros(len(starts_cat), dtype=np.int64)
                for pos in range(int(lens_cat.max())):
                    active = lens_cat > pos
                    c = hs_all[starts_cat[active] + pos]
                    acc[active] = (acc[active] * 31 + c) % POLY_MOD
                yield pd.DataFrame(
                    {
                        "doc_id": np.asarray(rows_doc, dtype=np.int64),
                        "chunk_hash": acc,
                        "chunk_len": lens_cat.astype(np.int32),
                    }
                )

    return documents.select("doc_id", "text").mapInPandas(chunk_batches, out_schema)


def cdc_chunk_dups(documents: DataFrame, divisor: int = 16, min_docs: int = 2) -> DataFrame:
    """Content-defined-chunking dedup (the rsync/LBFS/FastCDC idea applied
    at token granularity): chunk boundaries are declared wherever a TOKEN's
    content hash satisfies ``hash % divisor == 0``, so boundaries move WITH
    the content — an insertion near the head of a page re-aligns after the
    next boundary and every later chunk hashes identically. Fixed k-token
    windows (exact_substring_dups) catch shared spans but emit n windows
    per doc; CDC emits ~n/divisor chunks and is the standard shape for
    near-identical page VERSIONS (CMS edits, mirrored articles with
    injected headers) where the shared suffix is the whole story.

    Boundary rule (pinned): a boundary falls AFTER 1-based token position
    i when token_hash(i) % divisor == 0; the final chunk always ends at
    n_tokens. Chunk hash = the same mult-31 fold over the chunk's token
    hashes (mod POLY_MOD) the substring pass uses; expected chunk length =
    ``divisor`` tokens (production adds min/max clamps — FastCDC's
    normalized chunking — which this gate omits so the DuckDB twin stays a
    pure list expression; the clamp is a one-line mask in this kernel).

    Output (chunk_hash, chunk_len, n_docs, n_occurrences, first_doc) for
    chunks seen in >= ``min_docs`` distinct docs.

    Plan shape: ONE Arrow-batched kernel (mapInPandas — the memoized
    token-hash vectorization of exact_substring_dups, then a rounds-over-
    max-chunk-len Horner identical in spirit to _np_poly_squares) emits
    (doc_id, chunk_hash, chunk_len) already exploded, then one
    partial-agg'd groupBy on the 8-byte hash — shuffle rows ~ corpus
    tokens / divisor, an order of magnitude lighter than the substring
    pass. At 100 TB the groupBy is the only exchange.
    """
    chunks = _cdc_chunk_frame(documents, divisor)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.min("chunk_len").cast("int").alias("chunk_len"),
            F.countDistinct("doc_id").cast("int").alias("n_docs"),
            F.count("*").cast("int").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def cdc_version_pairs(
    documents: DataFrame,
    divisor: int = 16,
    threshold_ppm: int = 500_000,
    hub_cap: int = 32,
) -> DataFrame:
    """Versioned-page pair detection over the CDC chunk sets: two captures
    of one evolving page (a CMS edit, a mirrored article with an injected
    header) share most of their content-defined chunks even though no
    full-document hash and few fixed windows survive the edit. Pair score
    = |shared distinct chunks| / min(|chunks_a|, |chunks_b|) in ppm — the
    containment form, so a small doc embedded in a rework still scores
    high.

    The pair join goes through the chunk inverted index with a HUB CAP:
    chunks appearing in more than ``hub_cap`` docs (site boilerplate —
    the same nav paragraph chunks on every page of a host) are excluded
    from PAIRING (they would emit O(df^2) pairs each and assert nothing
    about versionhood); they still count in each doc's denominator.
    Same discipline as cocitation_topk's per-target cap — the quadratic
    term is bounded by hub_cap x chunk count, never by corpus size.

    Output (doc_a, doc_b, n_shared, n_a, n_b, sim_ppm) for pairs at or
    above ``threshold_ppm``, doc_a < doc_b.
    """
    # localCheckpoint: chunks feed sizes, freq AND both sides of the pair
    # self-join — without materialization the Arrow kernel re-chunks the
    # whole corpus four times per action
    chunks = (
        _cdc_chunk_frame(documents, divisor)
        .select("doc_id", "chunk_hash")
        .distinct()
        .localCheckpoint()
    )
    sizes = chunks.groupBy("doc_id").agg(F.count("*").cast("int").alias("n_chunks"))
    freq = chunks.groupBy("chunk_hash").agg(F.count("*").alias("df"))
    rare = chunks.join(freq.filter(F.col("df") <= hub_cap), "chunk_hash")
    a = rare.select("chunk_hash", F.col("doc_id").alias("doc_a"))
    b = rare.select("chunk_hash", F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, "chunk_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("int").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_chunks").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_chunks").alias("n_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "sim_ppm",
            F.expr("(n_shared * 1000000) div least(n_a, n_b)").cast("bigint"),
        )
        .filter(F.col("sim_ppm") >= threshold_ppm)
        .select("doc_a", "doc_b", "n_shared", "n_a", "n_b", "sim_ppm")
    )
