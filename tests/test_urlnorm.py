"""Golden tests for URL canonicalization (url-crate / WHATWG parity).

Golden expectations are hand-derived from the documented behavior of the
WHATWG URL Standard (which the Rust `url` crate implements) — SURVEY.md §1.1.
"""

from webcrawler_woc_spark.functions.urlnorm import (
    host_of,
    join_url,
    link_type_of,
    normalize_url,
    parse_absolute,
)

BASE = "http://host0.example/page/1"


class TestParseAbsolute:
    def test_simple(self):
        assert parse_absolute("http://example.com/a") == "http://example.com/a"

    def test_scheme_host_lowercased(self):
        assert parse_absolute("HTTP://EXAMPLE.Com/Path") == "http://example.com/Path"

    def test_default_port_stripped(self):
        assert parse_absolute("http://example.com:80/a") == "http://example.com/a"
        assert parse_absolute("https://example.com:443/") == "https://example.com/"
        assert parse_absolute("http://example.com:8080/a") == "http://example.com:8080/a"

    def test_empty_path_becomes_slash(self):
        assert parse_absolute("http://example.com") == "http://example.com/"

    def test_dot_segments_removed(self):
        assert parse_absolute("http://e.com/a/b/../c") == "http://e.com/a/c"
        assert parse_absolute("http://e.com/a/./b") == "http://e.com/a/b"
        assert parse_absolute("http://e.com/../a") == "http://e.com/a"

    def test_fragment_preserved(self):
        assert parse_absolute("http://e.com/a#frag") == "http://e.com/a#frag"

    def test_query_preserved(self):
        assert parse_absolute("http://e.com/a?x=1&y=2") == "http://e.com/a?x=1&y=2"

    def test_space_percent_encoded(self):
        assert parse_absolute("http://e.com/a b") == "http://e.com/a%20b"

    def test_existing_percent_untouched(self):
        assert parse_absolute("http://e.com/a%20b") == "http://e.com/a%20b"

    def test_non_ascii_path_utf8_encoded(self):
        assert parse_absolute("http://e.com/héllo") == "http://e.com/h%C3%A9llo"

    def test_mailto_opaque(self):
        assert parse_absolute("mailto:user@example.com") == "mailto:user@example.com"

    def test_tel_opaque(self):
        assert parse_absolute("tel:+15551234567") == "tel:+15551234567"

    def test_relative_fails(self):
        assert parse_absolute("page2") is None
        assert parse_absolute("../x") is None
        assert parse_absolute("/abs/path") is None

    def test_empty_host_fails(self):
        assert parse_absolute("http://") is None

    def test_unknown_scheme_opaque(self):
        assert parse_absolute("foo:bar") == "foo:bar"

    def test_tab_newline_removed(self):
        assert parse_absolute("http://e.com/a\tb\nc") == "http://e.com/abc"

    def test_backslash_normalized(self):
        assert parse_absolute("http://e.com\\a\\b") == "http://e.com/a/b"


class TestJoin:
    def test_relative_path(self):
        assert join_url(BASE, "page2") == "http://host0.example/page/page2"

    def test_parent(self):
        assert join_url(BASE, "../x") == "http://host0.example/x"

    def test_dot_slash(self):
        assert join_url(BASE, "./y") == "http://host0.example/page/y"

    def test_root_relative(self):
        assert join_url(BASE, "/abs") == "http://host0.example/abs"

    def test_protocol_relative(self):
        assert join_url(BASE, "//other.example/z") == "http://other.example/z"

    def test_query_only(self):
        assert join_url(BASE, "?q=1") == "http://host0.example/page/1?q=1"


class TestNormalizeUrl:
    def test_fragment_only_dropped(self):
        assert normalize_url("#sec", BASE) is None
        assert normalize_url("#", BASE) is None

    def test_absolute_wins(self):
        assert normalize_url("http://a.example/x", BASE) == "http://a.example/x"

    def test_relative_joins(self):
        assert normalize_url("b.html", BASE) == "http://host0.example/page/b.html"

    def test_mailto(self):
        assert normalize_url("mailto:a@b.c", BASE) == "mailto:a@b.c"

    def test_none(self):
        assert normalize_url(None, BASE) is None

    def test_whitespace_trimmed(self):
        assert normalize_url("  http://a.example/x  ", BASE) == "http://a.example/x"

    def test_fragment_in_middle_kept(self):
        # only hrefs STARTING with '#' are dropped (links.rs:296-300)
        assert normalize_url("page#sec", BASE) == "http://host0.example/page/page#sec"


class TestFastPathParity:
    def test_fast_path_equals_slow_path(self):
        """The already-canonical fast-path regexes must be exact fixed-point
        detectors: disabling them must not change any result."""
        import re

        from webcrawler_woc_spark.functions import urlnorm

        samples = [
            "http://host0.example/page/0",
            "http://a.b/c/../d",
            "HTTP://X.Y/Z",
            "http://h.e:80/p",
            "http://h.e:8080/p",
            "http://h.e/p?q=%20x",
            "mailto:A@B.c",
            "mailto:user14@host4.example",
            "tel:+15550001111",
            "http://h.e/a b",
            "https://h.e/p#f",
            "ftp://f.e/x",
            "http://h.e/p/./q",
            "http://user@h.e/p",
            "http://h.e",
            "http://h.e/",
            "http://h.e/p?",
            "http://h.e/p#",
            "http://h_x.e/p",
            "http://h.e/%41",
            "foo:bar",
            "page2",
            "//proto.rel/x",
        ]
        fast_s, fast_o = urlnorm._FAST_SPECIAL_RE, urlnorm._FAST_OPAQUE_RE
        never = re.compile(r"(?!)")
        try:
            with_fast = [urlnorm.parse_absolute(s) for s in samples]
            urlnorm._FAST_SPECIAL_RE = urlnorm._FAST_OPAQUE_RE = never
            urlnorm._abs_cache.clear()
            urlnorm._base_cache.clear()
            without_fast = [urlnorm.parse_absolute(s) for s in samples]
        finally:
            urlnorm._FAST_SPECIAL_RE, urlnorm._FAST_OPAQUE_RE = fast_s, fast_o
        assert with_fast == without_fast


class TestLinkType:
    def test_types(self):
        assert link_type_of("mailto:a@b.c") == "Mail"
        assert link_type_of("tel:+123") == "PhoneNo"
        assert link_type_of("http://e.com/") == "Other"
        assert link_type_of("foo:bar") == "Other"


class TestHostOf:
    def test_http(self):
        assert host_of("http://example.com/a") == "example.com"

    def test_with_port(self):
        assert host_of("http://example.com:8080/a") == "example.com"

    def test_mailto_no_host(self):
        assert host_of("mailto:a@b.c") is None

    def test_idempotent_canonicalization(self):
        # property: c(c(u)) == c(u) over assorted shapes
        cases = [
            "http://E.com:80/a/../b c?q=1#f",
            "https://x.example/",
            "mailto:Foo@Bar.com",
            "http://host3.example/page/7",
        ]
        for u in cases:
            c1 = parse_absolute(u)
            assert c1 is not None
            assert parse_absolute(c1) == c1
