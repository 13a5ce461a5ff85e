"""PII detection + redaction over web text — pure Catalyst regex kernels.

Training-data pipelines scrub personally identifiable information before a
corpus ships (the C4/Dolma-style email/phone/IP pass). Three detector
classes, each a single JVM-side regex — counted with ``regexp_extract_all``
and redacted with ``regexp_replace`` (global by default in Spark; the DuckDB
twin passes the 'g' flag):

* emails  -> ``<EMAIL>``
* E.164-ish phone numbers (+NNNNNNNNNNN) -> ``<PHONE>``
* dotted-quad IPv4 literals -> ``<IP>``

Patterns stay inside the Java-regex ∩ RE2 common subset (no lookaround, no
unicode classes) so the DuckDB oracle runs the byte-identical pattern.
Scale shape: a scan-only projection — no shuffle, no Python; whole-stage
codegen end to end. Redacted output is fingerprinted with the same rolling
poly hash as ``textstats.fingerprints`` so the correctness gate value-hashes
the full redacted byte stream without shipping megabyte strings around.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webcrawler_woc_spark.operators.textstats import rolling_fingerprint

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PHONE_RE = r"\+[0-9]{10,12}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("int")


def redact_stages(text: Column) -> tuple[Column, Column, Column]:
    """THE redaction chain, one definition: (after_emails, after_phones,
    fully_redacted). Order is part of the contract: emails, then phones,
    then IPv4 — a token can match two detectors (the local part of
    '+12345678901@example.com' is also a phone pattern), and whichever pass
    runs first swallows it. pii_scrub counts each detector on the stage its
    pass actually sees, so sharing the stages is what keeps 'counts equal
    replacements' true by construction."""
    r1 = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    r2 = F.regexp_replace(r1, PHONE_RE, "<PHONE>")
    return r1, r2, F.regexp_replace(r2, IPV4_RE, "<IP>")


def redact(text: Column) -> Column:
    """Fully-redacted text (the last redact_stages stage)."""
    return redact_stages(text)[2]


def pii_scrub(df: DataFrame, text: Column, keys: list[str]) -> DataFrame:
    """Per-row PII counts + redacted-text fingerprint.

    Output (*keys, n_emails, n_phones, n_ipv4, redacted_len, redacted_fp).
    Counts are taken on the PROGRESSIVELY-redacted text (emails on raw,
    phones after email redaction, IPv4 after both) so each count equals the
    number of replacements its pass actually made — counting every detector
    on the raw text would disagree with the redacted stream whenever one
    token matches two detectors (e.g. a phone-shaped email local part).
    The fingerprint is the order-sensitive rolling hash of the REDACTED
    string — any detector miss or over-match changes it."""
    r1, r2, red = redact_stages(text)
    fp = rolling_fingerprint(red)
    return df.select(
        *keys,
        _count(text, EMAIL_RE).alias("n_emails"),
        _count(r1, PHONE_RE).alias("n_phones"),
        _count(r2, IPV4_RE).alias("n_ipv4"),
        F.length(red).alias("redacted_len"),
        fp.alias("redacted_fp"),
    )
