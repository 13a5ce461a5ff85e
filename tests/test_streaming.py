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


def test_stateful_dedup_emits_each_url_once(spark, tmp_path):
    """applyInPandasWithState seen-set: overlapping micro-batches, one row per
    distinct url, state survives across batches (maxFilesPerTrigger=1)."""
    from webcrawler_woc_spark.streaming.dedup_stream import stream_dedup_links

    links_dir = str(tmp_path / "links_in")
    out_dir = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt2")

    rows = [("p", f"http://h.example/{i % 7}", "Other") for i in range(50)]
    df = spark.createDataFrame(rows, "parent_url string, url string, link_type string")
    # 5 files => 5 micro-batches, every batch full of re-discoveries
    df.repartition(5).write.parquet(links_dir)

    q = stream_dedup_links(spark, links_dir, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir).collect()
    urls = sorted(r["url"] for r in out)
    assert urls == sorted(f"http://h.example/{i}" for i in range(7))  # once each


def test_stateful_dedup_resumes_from_checkpoint(spark, tmp_path):
    """New files after a drained run: resume emits ONLY never-seen urls."""
    from webcrawler_woc_spark.streaming.dedup_stream import stream_dedup_links

    links_dir = str(tmp_path / "links_in")
    out_dir = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt3")

    first = spark.createDataFrame(
        [("p", "http://h.example/a", "Other"), ("p", "http://h.example/b", "Other")],
        "parent_url string, url string, link_type string",
    )
    first.coalesce(1).write.parquet(links_dir)
    stream_dedup_links(spark, links_dir, out_dir, ckpt).awaitTermination(300)

    second = spark.createDataFrame(
        [("p", "http://h.example/b", "Other"), ("p", "http://h.example/c", "Other")],
        "parent_url string, url string, link_type string",
    )
    second.coalesce(1).write.mode("append").parquet(links_dir)
    stream_dedup_links(spark, links_dir, out_dir, ckpt).awaitTermination(300)

    urls = sorted(r["url"] for r in spark.read.parquet(out_dir).collect())
    assert urls == ["http://h.example/a", "http://h.example/b", "http://h.example/c"]


def test_windowed_host_rate_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked tumbling-window count per host == the batch groupBy."""
    from webcrawler_woc_spark.operators.fetch import host_expr
    from webcrawler_woc_spark.sources.corpus import pages_from_documents
    from webcrawler_woc_spark.streaming.host_rate_stream import (
        host_rate_result,
        stream_host_fetch_rate,
    )
    from pyspark.sql import functions as F

    pages = pages_from_documents(spark, sf_dir)
    pages_dir = str(tmp_path / "pages")
    pages.repartition(4).write.parquet(pages_dir)

    q = stream_host_fetch_rate(spark, pages_dir, "host_rate_t", max_files_per_trigger=1)
    q.awaitTermination(300)
    got = {
        (r["host"], r["window_start"]): r["n_fetches"]
        for r in host_rate_result(spark, "host_rate_t").collect()
    }

    batch = (
        spark.read.parquet(pages_dir)
        .select(host_expr(F.col("url")).alias("host"), F.col("warc_ts"))
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "host")
        .agg(F.count("*").alias("n"))
        .select("host", F.col("w.start").cast("timestamp").cast("long").alias("ws"), "n")
    )
    want = {(r["host"], r["ws"]): r["n"] for r in batch.collect()}
    assert got == want and len(got) > 0
