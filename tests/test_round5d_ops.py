"""Round-5 batch-4 operators: rel=canonical extraction + clustering,
meta-refresh client redirects, soft-404 detection, template structure
fingerprints, content-defined-chunking dedup."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pages(spark, rows):
    """(url, html_str, headers_dict|None) -> fetch-shaped frame with a
    binary body and a map headers column."""
    df = spark.createDataFrame(
        rows, "url string, html_s string, headers map<string,string>"
    )
    return df.select("url", F.encode("html_s", "utf-8").alias("html"), "headers")


class TestCanonicalLinks:
    def test_link_tag_absolute_and_relative(self, spark):
        from webcrawler_woc_spark.operators.canonical import canonical_links

        pages = _pages(
            spark,
            [
                (
                    "http://a.example/dup?sid=1",
                    '<html><head><link rel="canonical" href="http://a.example/clean"></head>',
                    None,
                ),
                (
                    "http://a.example/dup2",
                    "<html><head><link rel=canonical href='/clean'></head>",
                    None,
                ),
                ("http://a.example/plain", "<html><head></head>", None),
            ],
        )
        got = {r.url: (r.canonical_source, r.canonical_url) for r in canonical_links(pages).collect()}
        assert got["http://a.example/dup?sid=1"] == ("link", "http://a.example/clean")
        assert got["http://a.example/dup2"] == ("link", "http://a.example/clean")
        assert got["http://a.example/plain"] == (None, None)

    def test_header_outranks_link_tag(self, spark):
        from webcrawler_woc_spark.operators.canonical import canonical_links

        pages = _pages(
            spark,
            [
                (
                    "http://a.example/p",
                    '<link rel="canonical" href="http://a.example/from-tag">',
                    {"link": '<http://a.example/from-header>; rel="canonical"'},
                )
            ],
        )
        (r,) = canonical_links(pages).collect()
        assert r.canonical_source == "header"
        assert r.canonical_url == "http://a.example/from-header"

    def test_reversed_attr_order_and_unresolvable(self, spark):
        from webcrawler_woc_spark.operators.canonical import canonical_links

        pages = _pages(
            spark,
            [
                (
                    "http://a.example/p1",
                    '<link href="http://a.example/c" rel="canonical">',
                    None,
                ),
                # protocol-relative: conservatively unresolved -> NULL
                ("http://a.example/p2", '<link rel=canonical href="//cdn.example/x">', None),
            ],
        )
        got = {r.url: r.canonical_url for r in canonical_links(pages).collect()}
        assert got["http://a.example/p1"] == "http://a.example/c"
        assert got["http://a.example/p2"] is None

    def test_clusters_rollup(self, spark):
        from webcrawler_woc_spark.operators.canonical import canonical_clusters

        canon = '<link rel="canonical" href="http://a.example/clean">'
        pages = _pages(
            spark,
            [
                ("http://a.example/clean", "<html>", None),  # target, fetched
                ("http://a.example/d1", canon, None),
                ("http://a.example/d2", canon, None),
                ("http://b.example/only", "<html>", None),  # singleton
            ],
        )
        got = {r.canonical_url: r for r in canonical_clusters(pages).collect()}
        c = got["http://a.example/clean"]
        assert (c.n_members, c.n_declared, c.rep_url) == (3, 2, "http://a.example/clean")
        s = got["http://b.example/only"]
        assert (s.n_members, s.n_declared, s.rep_url) == (1, 0, "http://b.example/only")

    def test_rep_falls_back_to_min_member_when_target_unfetched(self, spark):
        from webcrawler_woc_spark.operators.canonical import canonical_clusters

        canon = '<link rel="canonical" href="http://a.example/never-fetched">'
        pages = _pages(
            spark,
            [("http://a.example/z", canon, None), ("http://a.example/a", canon, None)],
        )
        (r,) = canonical_clusters(pages).collect()
        assert r.rep_url == "http://a.example/a"


class TestMetaRefresh:
    def test_extraction_and_self_refresh_dropped(self, spark):
        from webcrawler_woc_spark.operators.canonical import meta_refresh_redirects

        pages = _pages(
            spark,
            [
                (
                    "http://a.example/old",
                    '<meta http-equiv="refresh" content="5; url=http://a.example/new">',
                    None,
                ),
                (
                    "http://a.example/rel",
                    "<meta http-equiv=refresh content='0;URL=/moved'>",
                    None,
                ),
                # no url= part: reload, not a redirect
                ("http://a.example/self", '<meta http-equiv="refresh" content="30">', None),
                ("http://a.example/none", "<html>", None),
            ],
        )
        got = {r.url: (r.refresh_delay_s, r.refresh_target) for r in meta_refresh_redirects(pages).collect()}
        assert got == {
            "http://a.example/old": (5, "http://a.example/new"),
            "http://a.example/rel": (0, "http://a.example/moved"),
        }

    def test_composes_with_redirect_resolver(self, spark):
        """Mixed chain: server 301 a->b, client meta-refresh b->c resolves
        a to c through the same pointer-jumping rounds."""
        from webcrawler_woc_spark.operators.canonical import meta_refresh_redirects
        from webcrawler_woc_spark.operators.recrawl import resolve_redirects

        pages = _pages(
            spark,
            [("http://h/b", '<meta http-equiv="refresh" content="0; url=http://h/c">', None)],
        )
        meta_edges = meta_refresh_redirects(pages).select(
            F.col("url").alias("src"), F.col("refresh_target").alias("dst")
        )
        server_edges = spark.createDataFrame(
            [("http://h/a", "http://h/b")], "src string, dst string"
        )
        resolved = {
            r.src: r.final_url
            for r in resolve_redirects(server_edges.unionByName(meta_edges)).collect()
        }
        assert resolved["http://h/a"] == "http://h/c"
        assert resolved["http://h/b"] == "http://h/c"


class TestSoft404:
    def test_phrase_and_thin_signals(self, spark):
        from webcrawler_woc_spark.operators.traps import soft404_flags

        body = "word " * 200
        rows = [
            ("http://h1/ok", "h1", 200, body),
            ("http://h1/ok2", "h1", 200, body + "more words here"),
            ("http://h1/err", "h1", 200, "Sorry, page not found. " + body),
            ("http://h1/thin", "h1", 200, "word"),
            # real 404 status: not a SOFT 404 even with the phrase
            ("http://h1/hard", "h1", 404, "404 not found"),
        ]
        df = spark.createDataFrame(rows, "url string, host string, http_status int, text string")
        got = {r.url: r for r in soft404_flags(df).collect()}
        assert got["http://h1/err"].err_phrase == 1
        assert got["http://h1/err"].soft404 == 1
        assert got["http://h1/thin"].thin == 1
        assert got["http://h1/thin"].soft404 == 1
        assert got["http://h1/ok"].soft404 == 0
        assert got["http://h1/hard"].soft404 == 0

    def test_thin_is_relative_to_host_median(self, spark):
        """A 50-char page is thin on a host of 1000-char pages and normal
        on a host of 60-char pages."""
        from webcrawler_woc_spark.operators.traps import soft404_flags

        rows = (
            [(f"http://big/{i}", "big", 200, "x" * 1000) for i in range(4)]
            + [("http://big/s", "big", 200, "y" * 50)]
            + [(f"http://small/{i}", "small", 200, "x" * 60) for i in range(4)]
            + [("http://small/s", "small", 200, "y" * 50)]
        )
        df = spark.createDataFrame(rows, "url string, host string, http_status int, text string")
        got = {r.url: r.thin for r in soft404_flags(df).collect()}
        assert got["http://big/s"] == 1
        assert got["http://small/s"] == 0


class TestTemplateFingerprints:
    def test_same_structure_different_text_clusters(self, spark):
        from webcrawler_woc_spark.operators.textstats import template_fingerprints

        t = "<html><body><div><p>{}</p></div></body></html>"
        rows = [
            ("h1", 1, t.format("alpha")),
            ("h1", 2, t.format("totally different words")),
            ("h1", 3, t.format("third page")),
            ("h1", 4, "<html><body><span>other layout</span></body></html>"),
            ("h2", 5, t.format("same template, other host")),
        ]
        df = spark.createDataFrame(rows, "host string, doc_id bigint, html string")
        out = template_fingerprints(df, min_cluster=3).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r.host, []).append(r)
        big = [r for r in by_host["h1"] if r.n_pages == 3]
        assert len(big) == 1 and big[0].is_template == 1 and big[0].rep_doc == 1
        assert all(r.is_template == 0 for r in by_host["h2"])
        # same template on h2 yields the SAME fp (clusters are per-host by key)
        assert big[0].structure_fp == by_host["h2"][0].structure_fp

    def test_closing_tags_and_case_ignored(self, spark):
        from webcrawler_woc_spark.operators.textstats import template_fingerprints

        rows = [
            ("h", 1, "<HTML><Body><P>x</P></Body></HTML>"),
            ("h", 2, "<html><body><p>y"),
        ]
        df = spark.createDataFrame(rows, "host string, doc_id bigint, html string")
        out = template_fingerprints(df, min_cluster=2).collect()
        assert len(out) == 1 and out[0].n_pages == 2


class TestCdcChunkDups:
    def test_shared_suffix_survives_prefix_insertion(self, spark):
        """The CDC selling point: an inserted prefix shifts every fixed
        window but chunk boundaries resync, so the shared tail still dedups."""
        from webcrawler_woc_spark.operators.dedup import cdc_chunk_dups

        import random

        rng = random.Random(7)
        words = [f"w{rng.randrange(10**6)}" for _ in range(400)]
        base = " ".join(words)
        shifted = "INJECTED HEADER TOKENS " + base
        docs = spark.createDataFrame(
            [(1, base), (2, shifted), (3, " ".join(f"z{i}" for i in range(100)))],
            "doc_id bigint, text string",
        )
        out = cdc_chunk_dups(docs, divisor=16).collect()
        shared = [r for r in out if r.n_docs == 2]
        # docs 1/2 share (almost) all interior chunks despite the shift
        assert len(shared) >= 10
        assert all(r.first_doc == 1 for r in shared)

    def test_boundary_rule_pinned_against_python_reference(self, spark):
        """Brute-force Python reimplementation of the pinned rule over a
        tiny corpus must agree chunk-for-chunk."""
        from webcrawler_woc_spark.operators.dedup import (
            POLY_MOD,
            MERSENNE31,
            cdc_chunk_dups,
        )

        def tok_hash(t):
            acc = 0
            for ch in t:
                acc = (acc * 31 + ord(ch)) % POLY_MOD
            m = acc % MERSENNE31
            return (m * m) % MERSENNE31

        def chunks(text, d=4):
            hs = [tok_hash(t) for t in text.split()]
            out, cur = [], []
            for h in hs:
                cur.append(h)
                if h % d == 0:
                    out.append(cur)
                    cur = []
            if cur:
                out.append(cur)
            res = []
            for c in out:
                acc = 0
                for h in c:
                    acc = (acc * 31 + h) % POLY_MOD
                res.append((acc, len(c)))
            return res

        texts = {10: "aa bb cc dd ee ff gg hh", 11: "aa bb cc dd ee ff gg hh", 12: "xx yy"}
        expect = {}
        for did, t in texts.items():
            for h, ln in chunks(t):
                k = (h, ln)
                expect.setdefault(k, set()).add(did)
        expect = {k: v for k, v in expect.items() if len(v) >= 2}
        docs = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
        got = {
            (r.chunk_hash, r.chunk_len): set(range(r.first_doc, r.first_doc + r.n_docs))
            for r in cdc_chunk_dups(docs, divisor=4).collect()
        }
        assert set(got) == set(expect)

    def test_empty_and_single_token_docs(self, spark):
        from webcrawler_woc_spark.operators.dedup import cdc_chunk_dups

        docs = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "solo"), (4, "solo")],
            "doc_id bigint, text string",
        )
        out = cdc_chunk_dups(docs, divisor=4).collect()
        assert len(out) == 1
        assert out[0].n_docs == 2 and out[0].chunk_len == 1 and out[0].first_doc == 3
