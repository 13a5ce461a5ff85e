"""Streaming gap-sessionization via Spark's native ``session_window``.

The batch twin (`rel_sessionize`) derives sessions with lag + running-sum
windows; a continuous deployment wants the built-in streaming session
window instead: state-store-backed window MERGING (two micro-batches of the
same user's events coalesce into one growing session), watermark-driven
eviction, append-mode emission once a session can no longer grow. That
merge-on-arrival statefulness is the one streaming shape the engine didn't
cover yet (dedup_stream = custom keyed state, host_rate_stream = tumbling
window).

Semantics (microsecond-exact, mirrored in the DuckDB oracle): a session is
a maximal run of per-user events where each gap is <= ``gap`` — the merge
is INCLUSIVE at the boundary (a gap of exactly 30:00.000000 still merges;
a new session starts only when the gap EXCEEDS 30:00), pinned by
tests/test_session_stream.py. The window spans [first_event,
last_event + gap). Unlike the batch twin (which floors to whole seconds
first) the comparison is at full microsecond precision.

Append-mode flush caveat (finite replays): a session only emits after the
WATERMARK passes its end, and the watermark only advances between
micro-batches — so the final batch's sessions would stay pending forever.
The driver therefore appends two far-future SENTINEL batches (ordered after
the data by file modification time, which is how the file source orders
micro-batches): sentinel 1 advances the watermark past every real session,
sentinel 2 triggers the batch that emits them. Sentinel users are negative
and filtered from results. A production deployment reading an unbounded
source never needs this — new data plays the sentinel role.

The watermark DELAY must exceed the replay's whole event-time span: the
data files are hash-partitioned (every micro-batch spans the full range),
so after batch 1 any tighter watermark would classify batches 2..n as late
and silently DROP them (measured: 491 of 946 sessions survived a 0-second
delay). The default (10 years) keeps every replayed event on-time while the
2100-dated sentinels still push the watermark past every real session end.

Scale shape: state is one (user, open-session) entry, partitioned by user;
watermark eviction bounds it to active users. Hot-key skew = one user's
event storm; AQE can't split stateful keys, so the upstream politeness-style
cap (events per user per batch) is the lever, same as the crawl path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SESSION_GAP = "30 minutes"
GAP_US = 1800 * 1_000_000


def stream_user_sessions(
    spark: SparkSession,
    events_dir: str,
    query_name: str,
    gap: str = SESSION_GAP,
    watermark: str = "3650 days",
    max_files_per_trigger: int = 1,
):
    """readStream(user_id, ts) -> watermark -> session_window(gap) merge ->
    append-mode memory table ``query_name``. Returns the StreamingQuery."""
    events = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(events_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def session_result(spark: SparkSession, query_name: str) -> DataFrame:
    """(user_id, session_start_us, session_end_us, n_events) — microsecond
    epochs as BIGINT so the cross-engine value hash is exact; sentinel users
    (negative ids) dropped."""
    return (
        spark.table(query_name)
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )
