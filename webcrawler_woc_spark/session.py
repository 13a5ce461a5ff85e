"""SparkSession factory with the engine's standard configuration.

Design notes (100 TB target):
* AQE on — runtime coalescing + skew-join splitting for the frontier ⋈ pages
  join under zipf host skew.
* Arrow on — every Python-side kernel is an Arrow-batched pandas UDF.
* Shuffle partitions are fixed (deterministic plans in tests) but should be
  sized to ~2-3x total cores on a real cluster; the crawl driver re-partitions
  state tables by ``pmod(url_hash, n_buckets)`` so wave-over-wave joins on
  url_hash are co-partitioned.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webcrawler-woc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]) in the
    sandbox; on a real cluster it is left unset so spark-submit controls it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE: coalescePartitions.parallelismFirst is left at its default
        # (true). Setting it false (bytes-first) shrank tiny crawl-state
        # shuffles nicely but coalesced the medium-sized frontier-expansion
        # shuffles to a handful of partitions, starving 32 cores: measured
        # scaling efficiency collapsed 0.83 -> 0.26. Parallelism-first is the
        # right default for a throughput-scaling engine.
        # let AQE re-partition CACHED plans: the per-wave caches (matched /
        # fetched / children / deduped) are wave-sized, and with this off
        # (the default) they materialize at the full shuffle-partition count,
        # so every broadcast-exchange subplan over them schedules 32-192
        # near-empty tasks — measured 2-3.8s per subplan job on an 82-URL
        # wave. With AQE coalescing the caches, crawl_depth3 dropped ~2x
        # (27.8s -> ~14s median at the bench config). Output partitioning of
        # cached frames is never relied upon (state tables repartition
        # explicitly on write), so this is safe.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
