"""Golden E2E: Spark engine vs pure-Python oracle on the derived corpus.

Asserts (SURVEY.md §5.2-2 / north rule):
(a) final seen-set equality;
(b) crawl order (wave, host, slot, url) equality;
(c) byte-identical extracted text per url (vs oracle AND corpus text column);
(d) routing of every link to the right (link_type, crawled) partition.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from webcrawler_woc_spark.config import CrawlConfig
from webcrawler_woc_spark.oracle.pyoracle import crawl_oracle
from webcrawler_woc_spark.plans.crawl import crawl, read_crawl_order, read_links_out, read_seen
from webcrawler_woc_spark.plans.state import Warehouse
from webcrawler_woc_spark.sources.corpus import pages_from_documents

SEEDS = [("http://host0.example/page/0", 1.0)]
WHITELIST = ["host0.example", "host1.example", "host2.example", "host3.example", "host4.example"]
WORDS = ["merge", "vector"]


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    df = pages_from_documents(spark, sf_dir).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def pages_dict(pages):
    return {r["url"]: bytes(r["html"]) for r in pages.select("url", "html").collect()}


def run_both(spark, pages, pages_dict, tmp, **kw):
    cfg = CrawlConfig(
        whitelist=kw.get("whitelist", WHITELIST),
        blacklist=kw.get("blacklist"),
        words=kw.get("words", WORDS),
        depth=kw.get("depth", 2),
        host_budget=kw.get("host_budget"),
        use_bloom=kw.get("use_bloom", True),
        timeout_ms=kw.get("timeout_ms"),
    )
    wh = Warehouse(spark, tmp, n_buckets=8)
    crawl(spark, wh, pages, SEEDS, cfg)
    oracle = crawl_oracle(
        pages_dict,
        SEEDS,
        whitelist=cfg.whitelist,
        blacklist=cfg.blacklist,
        words=cfg.words,
        depth=cfg.depth,
        host_budget=cfg.host_budget,
        timeout_ms=cfg.timeout_ms,
    )
    return wh, oracle


class TestDepth2:
    @pytest.fixture(scope="class")
    def run(self, spark, pages, pages_dict):
        with tempfile.TemporaryDirectory() as tmp:
            yield run_both(spark, pages, pages_dict, tmp)

    def test_seen_set(self, run):
        wh, oracle = run
        engine_seen = {r["url"] for r in read_seen(wh).collect()}
        assert engine_seen == oracle.seen
        assert len(engine_seen) > 1  # more than the seed was crawled

    def test_crawl_order(self, run):
        wh, oracle = run
        engine_order = sorted(
            (r["wave"], r["host"], r["slot"], r["url"]) for r in read_crawl_order(wh).collect()
        )
        assert engine_order == sorted(oracle.crawl_order)

    def test_extracted_text_byte_identical(self, run, pages):
        wh, oracle = run
        rows = wh.read_waves("extracted_text").collect()
        engine_text = {r["url"]: r["text"] for r in rows}
        assert engine_text == oracle.extracted_text
        # and against the corpus golden text column
        golden = {
            r["url"]: r["text"]
            for r in pages.filter(F.col("url").isin(list(engine_text))).collect()
        }
        assert engine_text == golden

    def test_links_out_routing(self, run):
        wh, oracle = run
        engine = {
            (r["url"], r["link_type"], r["crawled"])
            for r in read_links_out(wh).collect()
        }
        expected = {(l["url"], l["link_type"], l["crawled"]) for l in oracle.links_out}
        assert engine == expected

    def test_rejected_disjoint_from_frontier(self, run):
        wh, oracle = run
        rejected = {r["url"] for r in wh.read_waves("rejected").collect()}
        assert rejected == oracle.rejected
        assert not (rejected & oracle.seen & set())  # sanity

    def test_flagged_words(self, run):
        wh, oracle = run
        flagged = {r["url"] for r in wh.read_waves("flagged").collect()}
        assert flagged == oracle.flagged
        assert flagged  # word list matches some docs

    def test_wave_metrics_recorded(self, run):
        wh, _ = run
        for w in range(2):
            counts = wh.wave_counts(w)
            assert counts["scheduled"] >= 1
            assert counts["new_frontier"] >= 0
            assert wh.manifest["waves"][str(w)]["host_lineage"]


class TestPoliteness:
    @pytest.fixture(scope="class")
    def run(self, spark, pages, pages_dict):
        with tempfile.TemporaryDirectory() as tmp:
            yield run_both(spark, pages, pages_dict, tmp, depth=3, host_budget=6)

    def test_seen_set(self, run):
        wh, oracle = run
        assert {r["url"] for r in read_seen(wh).collect()} == oracle.seen

    def test_crawl_order_with_budget(self, run):
        wh, oracle = run
        engine_order = sorted(
            (r["wave"], r["host"], r["slot"], r["url"]) for r in read_crawl_order(wh).collect()
        )
        assert engine_order == sorted(oracle.crawl_order)

    def test_budget_respected(self, run):
        wh, _ = run
        per = (
            read_crawl_order(wh)
            .groupBy("wave", "host")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        # crawl-delay from robots: host h has delay 1 + h % 3; budget 6 =>
        # effective cap = max(1, 6 // delay) in {6, 3, 2}
        for r in per:
            assert r["n"] <= 6


class TestNoListsQuirk:
    def test_only_seed_crawled(self, spark, pages, pages_dict):
        # neither whitelist nor blacklist => should_crawl always false
        # (links.rs:133): only the seed is fetched; every link rejected.
        with tempfile.TemporaryDirectory() as tmp:
            wh, oracle = run_both(
                spark, pages, pages_dict, tmp, whitelist=None, depth=2
            )
            seen = {r["url"] for r in read_seen(wh).collect()}
            assert seen == {SEEDS[0][0]} == oracle.seen


class TestNoDepthMode:
    def test_sitemaps_and_exhaustion(self, spark, pages, pages_dict):
        with tempfile.TemporaryDirectory() as tmp:
            cfg_kw = dict(depth=None, host_budget=None, whitelist=["host0.example"])
            wh, oracle = run_both(spark, pages, pages_dict, tmp, **cfg_kw)
            assert {r["url"] for r in read_seen(wh).collect()} == oracle.seen
            engine_order = sorted(
                (r["wave"], r["host"], r["slot"], r["url"])
                for r in read_crawl_order(wh).collect()
            )
            assert engine_order == sorted(oracle.crawl_order)
            # sitemap-discovered urls (docs 0,10,20 on host0) must be seen
            assert "http://host0.example/page/10" in oracle.seen


class TestTimeoutMode:
    """Op 27: request-timeout simulation — engine and oracle must agree on
    which matched pages time out, and timed-out pages must not be extracted."""

    @pytest.fixture(scope="class")
    def run(self, spark, pages, pages_dict):
        with tempfile.TemporaryDirectory(prefix="wcw_e2e_timeout_") as tmp:
            yield run_both(spark, pages, pages_dict, tmp, depth=3, timeout_ms=10_000)

    def test_seen_and_order_match_oracle(self, run):
        wh, oracle = run
        assert {r["url"] for r in read_seen(wh).collect()} == oracle.seen
        engine_order = sorted(
            (r["wave"], r["host"], r["slot"], r["url"]) for r in read_crawl_order(wh).collect()
        )
        assert engine_order == sorted(oracle.crawl_order)

    def test_timed_out_pages_have_no_text_or_metadata(self, run, pages_dict):
        from webcrawler_woc_spark.oracle.pyoracle import _fetch_ms

        wh, oracle = run
        texts = {r["url"] for r in wh.read_waves("extracted_text").collect()}
        links = {r["url"]: r for r in read_links_out(wh).filter(F.col("crawled")).collect()}
        timed_out = {
            u for u in links if u in pages_dict and _fetch_ms(u) >= 10_000
        }
        assert timed_out, "corpus must contain at least one timed-out URL"
        for u in timed_out:
            assert u not in texts  # body never read
            assert links[u]["content_type"] is None  # failure row: no metadata

    def test_timeout_changes_the_crawl(self, spark, pages, pages_dict):
        # sanity: the gate actually alters the frontier vs no-timeout mode
        with tempfile.TemporaryDirectory(prefix="wcw_e2e_notmo_") as tmp:
            wh_plain, _ = run_both(spark, pages, pages_dict, tmp, depth=3)
            seen_plain = {r["url"] for r in read_seen(wh_plain).collect()}
        with tempfile.TemporaryDirectory(prefix="wcw_e2e_tmo_") as tmp:
            wh_tmo, _ = run_both(
                spark, pages, pages_dict, tmp, depth=3, timeout_ms=10_000
            )
            seen_tmo = {r["url"] for r in read_seen(wh_tmo).collect()}
        assert seen_tmo != seen_plain


class TestRobotsDisallow:
    """Opt-in robots Disallow gate: a linked /private page must never be
    scheduled when respect_disallow=True; engine == oracle either way."""

    @pytest.fixture(scope="class")
    def tiny(self, spark):
        def page(body):
            return f"<html><body>{body}</body></html>".encode()

        pages_dict = {
            "http://h0.example/robots.txt": b"User-agent: *\nDisallow: /private\n",
            "http://h0.example/page/0": page(
                '<a href="/private/secret">s</a><a href="/page/1">a</a>'
            ),
            "http://h0.example/page/1": page("leaf"),
            "http://h0.example/private/secret": page('<a href="/page/2">hidden</a>'),
            "http://h0.example/page/2": page("reachable only via private"),
        }
        rows = [(u, b, b.decode()) for u, b in pages_dict.items()]
        pages = spark.createDataFrame(rows, "url string, html binary, text string")
        return pages, pages_dict

    def _ct(self, url):
        return "text/plain" if url.endswith("robots.txt") else "text/html"

    def _run(self, spark, tiny, tmp, respect):
        from pyspark.sql import functions as F

        pages, pages_dict = tiny
        ct_expr = lambda url: F.when(
            url.endswith("robots.txt"), F.lit("text/plain")
        ).otherwise(F.lit("text/html"))
        cfg = CrawlConfig(
            whitelist=["h0.example"], depth=3, respect_disallow=respect, use_bloom=True
        )
        wh = Warehouse(spark, tmp, n_buckets=4)
        crawl(spark, wh, pages, [("http://h0.example/page/0", 1.0)], cfg,
              content_type_expr=ct_expr)
        oracle = crawl_oracle(
            pages_dict, [("http://h0.example/page/0", 1.0)],
            whitelist=cfg.whitelist, depth=cfg.depth, content_type_fn=self._ct,
            respect_disallow=respect,
        )
        return {r["url"] for r in read_seen(wh).collect()}, oracle.seen

    def test_disallow_blocks_private_subtree(self, spark, tiny):
        with tempfile.TemporaryDirectory() as tmp:
            engine, oracle = self._run(spark, tiny, tmp, respect=True)
        assert engine == oracle
        assert "http://h0.example/private/secret" not in engine
        assert "http://h0.example/page/2" not in engine  # only linked via private

    def test_without_flag_private_is_crawled(self, spark, tiny):
        with tempfile.TemporaryDirectory() as tmp:
            engine, oracle = self._run(spark, tiny, tmp, respect=False)
        assert engine == oracle
        assert "http://h0.example/private/secret" in engine
        assert "http://h0.example/page/2" in engine


class TestTrapFilter:
    """Opt-in crawler-trap gate: a linked trap URL (repeated path segments)
    must never be scheduled when trap_filter=True, and the subtree behind
    it stays unreached; default off crawls it (reference parity)."""

    @pytest.fixture(scope="class")
    def tiny(self, spark):
        def page(body):
            return f"<html><body>{body}</body></html>".encode()

        pages_dict = {
            "http://h0.example/page/0": page(
                '<a href="/a/a/a/loop">t</a><a href="/page/1">a</a>'
            ),
            "http://h0.example/page/1": page("leaf"),
            "http://h0.example/a/a/a/loop": page('<a href="/page/2">deep</a>'),
            "http://h0.example/page/2": page("reachable only via the trap"),
        }
        rows = [(u, b, b.decode()) for u, b in pages_dict.items()]
        pages = spark.createDataFrame(rows, "url string, html binary, text string")
        return pages

    def _run(self, spark, pages, tmp, trap_filter):
        from pyspark.sql import functions as F

        ct_expr = lambda url: F.lit("text/html")
        cfg = CrawlConfig(
            whitelist=["h0.example"], depth=3, trap_filter=trap_filter, use_bloom=True
        )
        wh = Warehouse(spark, tmp, n_buckets=4)
        crawl(spark, wh, pages, [("http://h0.example/page/0", 1.0)], cfg,
              content_type_expr=ct_expr)
        return {r["url"] for r in read_seen(wh).collect()}

    def test_trap_subtree_never_scheduled(self, spark, tiny):
        with tempfile.TemporaryDirectory() as tmp:
            seen = self._run(spark, tiny, tmp, trap_filter=True)
        assert "http://h0.example/a/a/a/loop" not in seen
        assert "http://h0.example/page/2" not in seen  # only linked via the trap
        assert "http://h0.example/page/1" in seen  # clean sibling unaffected

    def test_default_off_crawls_the_trap(self, spark, tiny):
        with tempfile.TemporaryDirectory() as tmp:
            seen = self._run(spark, tiny, tmp, trap_filter=False)
        assert "http://h0.example/a/a/a/loop" in seen
        assert "http://h0.example/page/2" in seen


class TestBroadcastFallbackEquivalence:
    def test_shuffle_fallback_crawl_matches_broadcast_crawl(
        self, spark, pages, monkeypatch, tmp_path
    ):
        """Force the size-conditional broadcast OFF (as if every manifest
        count exceeded BROADCAST_MAX_ROWS) and assert the whole crawl —
        seen set, links_out, per-wave counts — is identical to the
        broadcast-path crawl. Proves the scale fallback is semantics-free."""
        import webcrawler_woc_spark.config as cfgmod

        cfg = CrawlConfig(
            whitelist=[f"host{i}.example" for i in range(3)],
            words=["merge"],
            depth=2,
            use_bloom=True,
            n_buckets=8,
        )
        seeds = [("http://host0.example/page/0", 1.0)]

        def run(path):
            wh = Warehouse(spark, str(path), n_buckets=8)
            crawl(spark, wh, pages, seeds, cfg)
            seen = sorted(r["url"] for r in read_seen(wh).collect())
            counts = {w: i["counts"] for w, i in wh.manifest["waves"].items()}
            links = sorted(
                map(repr, read_links_out(wh).select("url", "crawled", "link_type").collect())
            )
            return seen, counts, links

        base = run(tmp_path / "wh_broadcast")
        # wave 0 passes frontier_rows=None (always broadcast); later waves
        # consult the manifest — forcing the threshold to 0 flips every
        # size-gated join to the shuffle fallback
        monkeypatch.setattr(cfgmod, "BROADCAST_MAX_ROWS", 0)
        fallback = run(tmp_path / "wh_shuffle")
        assert fallback == base
