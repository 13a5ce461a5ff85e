"""Streaming extraction drains the corpus and matches the batch kernel."""

import os

from pyspark.sql import functions as F

from webcrawler_woc_spark.operators.extract import HTML_MIMES, extract_child_links
from webcrawler_woc_spark.sources.corpus import default_content_type_expr, pages_from_documents
from webcrawler_woc_spark.streaming.extract_stream import stream_extract_links


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "links")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(spark, sf_dir)
    pages.write.parquet(pages_dir)

    q = stream_extract_links(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(300)

    streamed = {
        (r["parent_url"], r["url"])
        for r in spark.read.parquet(out_dir).select("parent_url", "url").collect()
    }
    gated = pages.withColumn("content_type", default_content_type_expr(F.col("url"))).filter(
        F.col("content_type").isin(*HTML_MIMES)
    )
    batch = {
        (r["parent_url"], r["url"])
        for r in extract_child_links(gated).select("parent_url", "url").collect()
    }
    assert streamed == batch and len(batch) > 0
    assert os.path.exists(ckpt)  # exactly-once checkpoint committed
