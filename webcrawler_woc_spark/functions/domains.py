"""Registrable-domain (eTLD+1) extraction — the grouping key for
domain-level politeness, ownership rollups, and per-site dedup budgets
(host-level grouping splits www./cdn./m. of one site; this is the standard
fix).

The suffix rule here is a PINNED two-level-suffix subset, kept small and
Catalyst-only so the DuckDB oracle can express the identical logic. A
production deployment swaps in the full Mozilla Public Suffix List the same
way: the list is broadcast-side data, the expression shape (match the
longest listed suffix, keep one more label) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# pinned 2-level public suffixes (subset; production = full PSL)
PUBLIC_SUFFIXES_2LD = (
    "ac.uk", "co.in", "co.jp", "co.uk", "com.au", "com.br", "gov.uk", "org.uk",
)


def registrable_domain(host_col) -> "F.Column":
    """eTLD+1 of a lowercase host: last two labels, or last three when the
    last two form a listed 2-level public suffix; hosts of <= 2 labels (or
    that ARE a bare suffix) pass through unchanged. Pure Catalyst."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(n <= 2, host_col)
        .when(last2.isin(*PUBLIC_SUFFIXES_2LD), last3)
        .otherwise(last2)
    )
