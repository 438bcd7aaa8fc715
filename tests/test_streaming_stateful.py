"""Stateful streaming: running per-user stats must agree with the batch
aggregation after the single micro-batch drains."""

from __future__ import annotations

from pyspark.sql import functions as F

from omics_data_integration_utilities_spark.streaming.stateful import (
    running_user_stats_stream,
)
from .conftest import SF_SMOKE


def test_stateful_user_stats_match_batch(spark, tmp_path):
    path = f"{SF_SMOKE}/events.parquet"
    stream_df = running_user_stats_stream(spark, path)
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: r
            for r in spark.sql("SELECT * FROM user_stats").collect()
        }
    finally:
        q.stop()

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from omics_data_integration_utilities_spark.streaming.events import ts_event_micros

    events = spark.read.parquet(path)
    batch = (
        events
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
            F.max(ts_event_micros(events)).alias("last"),
        )
    )
    expect = {r["user_id"]: r for r in batch.collect()}
    assert set(got) == set(expect)
    for uid, e in expect.items():
        g = got[uid]
        assert g["n_events"] == e["n"]
        assert abs(g["sum_value"] - e["s"]) < 1e-6
        assert g["last_ts_us"] == e["last"]
