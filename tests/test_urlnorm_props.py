"""Property-based tests (hypothesis) for the URL canonicalization kernel.

The canonical form is the engine's identity for the seen-set, the join keys
and the politeness host — idempotence and representation invariants are what
keep 10^10-URL dedup sound. The golden corpus (test_urlnorm.py) pins exact
reference parity; these properties pin the algebra on arbitrary inputs.
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from webcrawler_woc_spark.functions.urlnorm import (
    host_of,
    join_url,
    normalize_host,
    normalize_url,
    parse_absolute,
)

# printable-ascii soup plus URL-significant characters — adversarial but
# realistic (href attribute contents)
url_chars = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=%.-_~ \t\n\\{}`\"<>",
    max_size=80,
)
hostish = st.text(
    alphabet=string.ascii_letters + string.digits + ".-" + "üñß",
    min_size=1,
    max_size=30,
)
COMMON_SETTINGS = settings(max_examples=300, deadline=None)


class TestParseAbsoluteProperties:
    @COMMON_SETTINGS
    @given(url_chars)
    def test_idempotent(self, raw):
        # canonicalizing a canonical URL must be a no-op: the seen-set
        # identity would otherwise drift between waves
        c = parse_absolute(raw)
        if c is not None:
            assert parse_absolute(c) == c

    @COMMON_SETTINGS
    @given(url_chars)
    def test_no_raw_whitespace_or_controls_survive(self, raw):
        c = parse_absolute(raw)
        if c is not None:
            assert not any(ch in c for ch in " \t\n\r\x00")

    @COMMON_SETTINGS
    @given(hostish, st.integers(0, 99999))
    def test_special_scheme_host_is_lowercase(self, host, n):
        c = parse_absolute(f"HTTP://{host}/page/{n}")
        if c is not None:
            h = host_of(c)
            assert h is not None and h == h.lower()
            assert c.startswith("http://")

    @COMMON_SETTINGS
    @given(url_chars, url_chars)
    def test_join_output_is_canonical(self, base_tail, rel):
        base = parse_absolute("http://example.test/" + base_tail)
        if base is None:
            return
        j = join_url(base, rel)
        if j is not None:
            assert parse_absolute(j) == j

    @COMMON_SETTINGS
    @given(url_chars)
    def test_normalize_url_matches_parse_or_join(self, href):
        # normalize_url(href, base) is the extraction-path entry: for an
        # absolute href it must agree with parse_absolute exactly
        base = "http://base.test/dir/page"
        out = normalize_url(href, base)
        absolute = parse_absolute(href)
        if absolute is not None:
            assert out == absolute
        if out is not None:
            assert parse_absolute(out) == out  # canonical either way


class TestNormalizeHostProperties:
    @COMMON_SETTINGS
    @given(hostish)
    def test_normalized_entry_matches_canonical_url_host(self, host):
        # a whitelist entry that normalizes must equal the host the engine
        # derives from a URL using it — the policy-matching invariant
        entry = normalize_host(host)
        if entry is None:
            return
        url = parse_absolute(f"http://{host}/x")
        if url is not None:
            assert host_of(url) == entry

    @COMMON_SETTINGS
    @given(hostish)
    def test_idempotent(self, host):
        entry = normalize_host(host)
        if entry is not None:
            assert normalize_host(entry) == entry
