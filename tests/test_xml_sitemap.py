"""XML sitemap parsing (operators/sitemaps.parse_xml_sitemap): loc
extraction with trim, single-pass entity unescape, index detection."""

from __future__ import annotations


def test_loc_extraction_trim_and_entities(spark):
    from webcrawler_woc_spark.operators.sitemaps import parse_xml_sitemap

    body = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>  http://a.example/p?x=1&amp;y=2  </loc></url>"
        "<url><loc>http://a.example/amp-literal?q=&amp;lt;tag&amp;gt;</loc></url>"
        "<url><loc>http://a.example/quote&apos;d</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("http://a.example/s.xml", body)], "sitemap_url string, body string")
    rows = sorted(parse_xml_sitemap(df).collect(), key=lambda r: r.idx)
    assert [r.url for r in rows] == [
        "http://a.example/p?x=1&y=2",
        # &amp;lt; must decode ONCE (to &lt;), never twice (to <)
        "http://a.example/amp-literal?q=&lt;tag&gt;",
        "http://a.example/quote'd",
    ]
    assert all(r.is_index is False for r in rows)


def test_sitemapindex_flag_and_order(spark):
    from webcrawler_woc_spark.operators.sitemaps import parse_xml_sitemap

    body = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.example/s2.xml</loc></sitemap>"
        "<sitemap><loc>http://a.example/s1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([("http://a.example/i.xml", body)], "sitemap_url string, body string")
    rows = sorted(parse_xml_sitemap(df).collect(), key=lambda r: r.idx)
    assert [(r.idx, r.url, r.is_index) for r in rows] == [
        (0, "http://a.example/s2.xml", True),  # document order preserved
        (1, "http://a.example/s1.xml", True),
    ]


def test_locless_body_yields_no_rows(spark):
    from webcrawler_woc_spark.operators.sitemaps import parse_xml_sitemap

    df = spark.createDataFrame(
        [("http://a.example/s.xml", "<urlset></urlset>"), ("http://b.example/s.xml", "")],
        "sitemap_url string, body string",
    )
    assert parse_xml_sitemap(df).count() == 0
