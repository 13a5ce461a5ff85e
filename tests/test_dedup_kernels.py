"""SimHash Arrow-batch kernel: the vectorized numpy path (codepoint Horner
over a ragged utf-32 buffer + per-bit bincount votes) must be value-identical
to a straightforward per-token Python reference — the corpus-scale parity is
additionally pinned by the dedup_simhash DuckDB oracle."""

from __future__ import annotations

from webcrawler_woc_spark.operators.dedup import MERSENNE31, POLY_MOD


def _ref_simhash(text: str) -> int:
    """Independent per-token reference implementation (the pre-vectorization
    semantics, kept here as the truth table)."""
    toks = (text or "").split()
    if not toks:
        return 0
    hashes = []
    for tok in toks:
        p1 = p2 = 0
        for ch in tok:
            p1 = (p1 * 31 + ord(ch)) % POLY_MOD
            p2 = (p2 * 131 + ord(ch)) % POLY_MOD
        m1 = (p1 % MERSENNE31) ** 2 % MERSENNE31
        m2 = (p2 % MERSENNE31) ** 2 % MERSENNE31
        hashes.append(m1 * (1 << 31) + m2)
    sim = 0
    for b in range(64):
        votes = sum(1 if (h >> b) & 1 else -1 for h in hashes)
        if votes > 0:
            sim |= 1 << b
    return sim


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the the the repeated repeated tokens tokens",  # duplicate-token weights
    "café naïve 中文  emoji\U0001f600",  # non-ASCII codepoints
    "single",
    "",
    "   ",  # whitespace only -> no tokens -> 0
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "x" * 500,  # one long token exercises the Horner tail
]


def test_vectorized_kernel_matches_reference(spark):
    from pyspark.sql import functions as F

    from webcrawler_woc_spark.operators.dedup import simhash62

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    ).withColumn("text", F.col("text"))
    got = {r.doc_id: r.simhash for r in simhash62(df).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == _ref_simhash(t), (i, t[:40])


class TestLineBoilerplateDedup:
    """line_boilerplate_dedup: frequency-threshold removal hits EVERY copy
    (unlike paragraph_dedup's keep-first), unique lines survive, fully-
    boilerplate docs become empty."""

    def test_threshold_semantics(self, spark):
        from webcrawler_woc_spark.operators.dedup import line_boilerplate_dedup

        rows = [(i, f"unique line {i}\nshared footer") for i in range(4)]
        rows.append((4, "shared footer"))  # doc that is ONLY boilerplate
        rows.append((5, "below-threshold twin\nunique line 5"))
        rows.append((6, "below-threshold twin\nunique line 6"))
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r.doc_id: r for r in line_boilerplate_dedup(df, min_docs=5).collect()}
        # 'shared footer' is in 5 distinct docs -> removed everywhere
        for i in range(4):
            assert out[i].clean_text == f"unique line {i}"
            assert (out[i].n_lines, out[i].n_removed) == (2, 1)
        assert out[4].clean_text == ""  # all-boilerplate doc drops to empty
        assert (out[4].n_lines, out[4].n_removed) == (1, 1)
        # 2-doc twin is below min_docs=5 -> kept in both
        assert out[5].clean_text == "below-threshold twin\nunique line 5"
        assert out[6].n_removed == 0

    def test_order_preserved_around_removals(self, spark):
        from webcrawler_woc_spark.operators.dedup import line_boilerplate_dedup

        boiler = "B"
        docs = [(i, f"a{i}\n{boiler}\nz{i}") for i in range(5)]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        out = line_boilerplate_dedup(df, min_docs=5).collect()
        assert all(r.clean_text == f"a{r.doc_id}\nz{r.doc_id}" for r in out)

    def test_null_text_doc_survives_as_empty(self, spark):
        from webcrawler_woc_spark.operators.dedup import line_boilerplate_dedup

        rows = [(i, "shared") for i in range(5)] + [(9, None)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r.doc_id: r for r in line_boilerplate_dedup(df, min_docs=5).collect()}
        assert 9 in out  # NULL-text doc must not vanish from the corpus
        assert (out[9].clean_text, out[9].n_lines, out[9].n_removed) == ("", 0, 0)
        assert out[0].clean_text == ""  # 'shared' crossed the threshold


class TestCharLmScores:
    def test_rare_transitions_score_higher(self, spark):
        from webcrawler_woc_spark.operators.textstats import char_lm_scores

        fluent = "the cat sat on the mat and the cat sat again"
        docs = [(i, fluent) for i in range(9)]
        docs.append((9, "zq xj qz jx zq xj"))  # transitions seen nowhere else
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        out = {r.doc_id: r for r in char_lm_scores(df).collect()}
        assert out[9].centibits_per_bigram > out[0].centibits_per_bigram
        assert all(out[i].centibits_per_bigram == out[0].centibits_per_bigram for i in range(9))

    def test_degenerate_docs_zeroed(self, spark):
        from webcrawler_woc_spark.operators.textstats import char_lm_scores

        df = spark.createDataFrame(
            [(0, "normal text here"), (1, "x"), (2, ""), (3, None)],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: r for r in char_lm_scores(df).collect()}
        assert len(out) == 4  # nothing dropped
        for i in (1, 2, 3):
            assert (out[i].n_bigrams, out[i].bits_total, out[i].centibits_per_bigram) == (0, 0, 0)
