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


def test_short_docs_produce_no_windows(spark):
    from webcrawler_woc_spark.operators.dedup import exact_substring_dups

    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id bigint, text string"
    )
    # both docs < 8 tokens: no windows at all, even though texts are equal
    assert exact_substring_dups(df, k=8).count() == 0
