"""The Spark-generated corpus must byte-match the pure-Python twin —
this is what lets the Python oracle and DuckDB arithmetic oracle stand in
for the distributed engine's input."""

import duckdb
import pytest
from pyspark.sql import functions as F

from webcrawler_woc_spark.functions.html import extract_links, extract_text
from webcrawler_woc_spark.sources.corpus import (
    pages_from_documents,
    py_doc_page,
    py_robots_sitemap_pages,
)


@pytest.fixture(scope="module")
def spark_rows(spark, sf_dir):
    df = pages_from_documents(spark, sf_dir)
    return {r["url"]: r for r in df.collect()}


@pytest.fixture(scope="module")
def py_rows(sf_dir):
    docs = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    n = len(docs)
    rows = [py_doc_page(d, t, l, n) for d, t, l in docs]
    rows += py_robots_sitemap_pages(n)
    return {r["url"]: r for r in rows}


class TestCorpusParity:
    def test_same_url_set(self, spark_rows, py_rows):
        assert set(spark_rows) == set(py_rows)

    def test_html_bytes_identical(self, spark_rows, py_rows):
        for url, pr in py_rows.items():
            assert bytes(spark_rows[url]["html"]) == pr["html"], url

    def test_text_column_identical(self, spark_rows, py_rows):
        for url, pr in py_rows.items():
            assert spark_rows[url]["text"] == pr["text"], url

    def test_text_column_is_extract_text_of_html(self, py_rows):
        # the north-rule invariant holds on the corpus itself for doc pages
        for url, r in py_rows.items():
            if "/page/" in url:
                assert extract_text(r["html"].decode()) == r["text"], url

    def test_embedded_links_recoverable(self, py_rows):
        # kernel recovers the arithmetic graph from doc 0's html
        r = py_rows["http://host0.example/page/0"]
        links = extract_links(r["html"].decode(), r["url"])
        assert "http://host0.example/page/10" in links
        assert "http://host0.example/page/20" in links
