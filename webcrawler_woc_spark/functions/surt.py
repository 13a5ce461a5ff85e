"""SURT (Sort-friendly URI Reordering Transform) keys — pure Catalyst.

Web archives (Common Crawl CDX, OpenWayback) sort and range-partition their
URL indexes by SURT key: the host is split on '.', reversed, re-joined with
',', then ')' and the path follow — `http://host0.example/page/3` →
`example,host0)/page/3`. Reversed-host ordering clusters every URL of a
registrable domain (and all its subdomains) into one contiguous key range,
which is what makes domain-prefix scans partition-prunable: a range-
partitioned `seen`/`frontier` table keyed by SURT answers "everything under
*.example.com" with a range predicate instead of a full scan.

The reference crawler keys its sets by raw URL (`HashSet<Url>`,
`/root/reference/src/crawler.rs:43-45`) — fine in RAM, hostile to 100 TB
range pruning; SURT is the standard at-rest ordering for that scale.

Everything here is regexp/split/reverse/concat — JVM-side, codegen'd, and
reproducible verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def surt_host(url: Column) -> Column:
    """Reversed comma-joined host: `a.b.example` -> `example,b,a`.
    Non-hierarchical URLs (mailto:/tel: — no '://host') yield ''."""
    host = F.regexp_extract(url, _SCHEME_HOST_RE, 1)
    return F.when(host == "", F.lit("")).otherwise(
        F.array_join(F.reverse(F.split(host, r"\.")), ",")
    )


def surt_key(url: Column) -> Column:
    """Full SURT key `revhost)path`; path defaults to '/' when absent.
    Null for non-hierarchical URLs (no host to reorder)."""
    host_part = surt_host(url)
    after = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    path = F.when(after == "", F.lit("/")).otherwise(after)
    return F.when(host_part == "", F.lit(None).cast("string")).otherwise(
        F.concat(host_part, F.lit(")"), path)
    )
