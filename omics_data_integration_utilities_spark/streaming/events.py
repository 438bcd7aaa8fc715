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
