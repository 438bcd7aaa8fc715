"""Structured Streaming over the events table.

The reference is strictly batch (SURVEY §2.10) — this is north-star
surface: the same tumbling-window aggregation exposed both as a batch
query (oracle-checkable) and as a watermarked streaming query.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_event_agg(events: DataFrame, window_seconds: int = 3600) -> DataFrame:
    """Batch-form tumbling aggregation: integer epoch bucket (timezone-proof
    — identical in Spark and DuckDB) × event_type → count + value sum.

    ``ts`` arrives as int64 epoch **nanoseconds** (nanosAsLong read path);
    the bucket uses integer division only — nanos exceed 2^53, so routing
    through double would corrupt the bucket edges.
    """
    window_ns = int(window_seconds) * 1_000_000_000
    bucket = F.expr(f"ts div {window_ns}")  # exact integer division
    return (
        events.groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def windowed_event_counts_stream(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming variant: file source → watermark → windowed agg.

    Late rows beyond the watermark are dropped; state is bounded by the
    watermark horizon — the standard production shape for the events feed.
    Returns the (unstarted) streaming DataFrame; callers attach a sink::

        q = (df.writeStream.outputMode("append").format("memory")
               .queryName("out").start())
        q.processAllAvailable()
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        # the file streaming source requires a directory; stage a symlink
        staged = tempfile.mkdtemp(prefix="omics_stream_")
        os.symlink(events_path, os.path.join(staged, os.path.basename(events_path)))
        events_path = staged
    stream = spark.readStream.schema(schema).parquet(events_path)
    # ts is int64 nanos on the read path; event-time ops need a timestamp.
    # Integer division only — nanos exceed 2^53, double division would
    # corrupt microseconds (same invariant as the batch path above).
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        stream.withColumn("__event_time", ts)
        .withWatermark("__event_time", watermark)
        .groupBy(F.window("__event_time", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


def session_window_agg(events: DataFrame, gap_seconds: int = 21600) -> DataFrame:
    """Batch-form session windows via the built-in ``F.session_window``:
    per user, events closer than ``gap_seconds`` merge into one session
    ([start, last_event + gap) ranges merge while they overlap — an event
    exactly ``gap`` after the previous one starts a NEW session).

    Same streaming-first shape as the tumbling variant: the identical
    expression works under ``readStream`` + watermark (session windows
    are Structured Streaming's native sessionization).  ``ts`` arrives as
    int64 epoch nanos; integer division to micros only (nanos exceed
    2^53).  Value sums go through DECIMAL so both engines agree exactly.

    Returns (user_id, session_start_us, session_end_us, n, sum_value).
    """
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        events.withColumn("__event_time", ts)
        .groupBy(
            F.session_window("__event_time", f"{int(gap_seconds)} seconds"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n",
            "sum_value",
        )
    )


def hopping_window_agg(
    events: DataFrame, window_seconds: int = 3600, slide_seconds: int = 900
) -> DataFrame:
    """Batch-form hopping (sliding) windows via the built-in ``F.window``
    with a slide: each event lands in ``window/slide`` overlapping
    buckets.  Same streaming-first shape as the tumbling variant (the
    identical expression runs under readStream + watermark).  ``ts``
    arrives as int64 epoch nanos → integer division to micros; DECIMAL
    value sums for cross-engine exactness.

    Returns (window_start_us, window_end_us, event_type, n, sum_value).
    """
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        events.withColumn("__event_time", ts)
        .groupBy(
            F.window(
                "__event_time",
                f"{int(window_seconds)} seconds",
                f"{int(slide_seconds)} seconds",
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            F.unix_micros(F.col("window.end")).alias("window_end_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )
