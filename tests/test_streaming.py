"""Structured Streaming smoke: the windowed events aggregation must
process the full parquet batch through a memory sink and agree with the
batch-form tumbling aggregation on totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from omics_data_integration_utilities_spark.streaming.events import (
    tumbling_event_agg,
    windowed_event_counts_stream,
)
from .conftest import SF_SMOKE


def test_stream_matches_batch_totals(spark, tmp_path):
    path = f"{SF_SMOKE}/events.parquet"
    stream_df = windowed_event_counts_stream(spark, path, window="1 hour")
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT sum(n) AS total, count(*) AS groups FROM stream_out"
        ).collect()[0]
    finally:
        q.stop()

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(path)
    batch = tumbling_event_agg(events, 3600)
    expect_total = events.count()
    expect_groups = batch.count()
    assert got["total"] == expect_total
    assert got["groups"] == expect_groups
