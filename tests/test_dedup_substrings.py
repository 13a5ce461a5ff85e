"""Cross-document exact-substring detection (operators/dedup.py
exact_substring_dups): crafted docs with a shared 8-token span must surface
exactly that span's windows; corpus-scale parity is pinned by the
dedup_substrings DuckDB oracle."""

from __future__ import annotations


def test_shared_span_detected_and_unique_text_not(spark):
    from webcrawler_woc_spark.operators.dedup import exact_substring_dups

    shared = "one two three four five six seven eight"  # exactly 8 tokens
    rows = [
        (1, f"intro {shared} tail-a unique-a"),
        (2, f"other start {shared} tail-b"),
        (3, "totally different words that never repeat anywhere else at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = exact_substring_dups(df, k=8).collect()
    # the shared 8-token window appears once per doc => one whash, 2 docs
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.n_occurrences, r.first_doc) == (2, 2, 1)


def test_within_doc_repeat_alone_is_not_cross_doc(spark):
    from webcrawler_woc_spark.operators.dedup import exact_substring_dups

    span = "a b c d e f g h"
    rows = [
        (1, f"{span} filler {span}"),  # repeats internally only
        (2, "nothing shared here with the first document at all okay"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    assert exact_substring_dups(df, k=8).count() == 0


def test_matches_brute_force_on_pseudo_random_corpus(spark):
    """Window-level parity against an independent brute-force: every k-token
    window STRING shared across docs must be found, and (absent hash
    collisions, impossible at this scale) nothing else."""
    from collections import defaultdict

    from webcrawler_woc_spark.operators.dedup import exact_substring_dups

    # deterministic pseudo-random docs over a tiny vocab => plenty of
    # accidental shared windows at k=3
    vocab = ["aa", "bb", "cc", "dd"]
    docs = {
        d: " ".join(vocab[(d * 7 + i * 13 + i * i * 5) % len(vocab)] for i in range(20))
        for d in range(8)
    }
    k = 3
    truth: dict[str, set[int]] = defaultdict(set)
    occurrences: dict[str, int] = defaultdict(int)
    for d, text in docs.items():
        toks = text.split()
        for i in range(len(toks) - k + 1):
            w = " ".join(toks[i : i + k])
            truth[w].add(d)
            occurrences[w] += 1
    expected = sorted(
        (len(ds), occurrences[w], min(ds))
        for w, ds in truth.items()
        if len(ds) >= 2
    )
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = sorted(
        (r.n_docs, r.n_occurrences, r.first_doc)
        for r in exact_substring_dups(df, k=k).collect()
    )
    assert got == expected


def test_short_docs_produce_no_windows(spark):
    from webcrawler_woc_spark.operators.dedup import exact_substring_dups

    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id bigint, text string"
    )
    # both docs < 8 tokens: no windows at all, even though texts are equal
    assert exact_substring_dups(df, k=8).count() == 0


class TestVerifySubstringDups:
    """Content-verify stage (verify_substring_dups): hash collisions must
    not survive, true text duplicates must, with the same counts as the
    hash report."""

    # real 31-bit collision pair: both token hashes == 165141136
    A = " ".join(["xjojar"] * 8)
    B = " ".join(["bibfvj"] * 8)

    def test_collision_pair_really_collides(self):
        import numpy as np

        from webcrawler_woc_spark.operators.dedup import _np_token_hash31

        hs = _np_token_hash31(np.array(["xjojar", "bibfvj"], dtype=object))
        assert hs[0] == hs[1] == 165141136

    def test_collision_reported_by_hash_but_killed_by_verify(self, spark):
        from webcrawler_woc_spark.operators.dedup import (
            exact_substring_dups,
            verify_substring_dups,
        )

        docs = spark.createDataFrame(
            [(1, self.A), (2, self.B)], "doc_id bigint, text string"
        )
        hash_report = exact_substring_dups(docs, k=8).collect()
        assert len(hash_report) == 1  # the false positive the hash pass makes
        assert hash_report[0].n_docs == 2
        assert verify_substring_dups(docs, k=8).count() == 0  # verify kills it

    def test_true_duplicates_survive_with_counts(self, spark):
        from webcrawler_woc_spark.operators.dedup import verify_substring_dups

        shared = "one two three four five six seven eight"
        docs = spark.createDataFrame(
            [
                (1, f"intro {shared} tail"),
                (2, f"{shared} other end"),
                (3, self.A),
                (4, self.B),  # collision pair mixed in: must not appear
            ],
            "doc_id bigint, text string",
        )
        out = verify_substring_dups(docs, k=8).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.wtext, r.n_docs, r.n_occurrences, r.first_doc) == (shared, 2, 2, 1)

    def test_unicode_whitespace_tokenizer_parity(self, spark):
        # ADVICE r4: Java \s is ASCII-only while the window-hash kernel uses
        # str.split() (Unicode whitespace). A NBSP / EN-QUAD prefix before the
        # shared window would shift JVM token positions and slice the wrong
        # window text if the Catalyst split pattern diverged from the kernel.
        from webcrawler_woc_spark.operators.dedup import verify_substring_dups

        shared = "alpha beta gamma delta epsilon zeta eta theta"
        nbsp, enquad = chr(0xA0), chr(0x2000)
        docs = spark.createDataFrame(
            [
                (1, f"lead{nbsp}words{enquad}here {shared} tail"),
                (2, f"{nbsp}{shared}{enquad}coda"),
            ],
            "doc_id bigint, text string",
        )
        out = verify_substring_dups(docs, k=8).collect()
        assert (len(out), out[0].wtext, out[0].n_docs) == (1, shared, 2)
