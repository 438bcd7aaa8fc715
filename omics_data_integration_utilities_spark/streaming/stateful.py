"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star surface; the reference is batch-only).

Running per-user statistics over the events feed: count, value sum, and
max event-time per user, carried in explicit group state across
micro-batches — the building block for sessionization / per-entity
accumulators on an unbounded stream.  State is bounded by the user-key
cardinality and the eviction timeout.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import stream_source_schema, ts_event_micros

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_ts_us long"
STATE_SCHEMA = "n long, s double, last long"


def _update_user_stats(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        last = max(last, int(pdf["ts_us"].max()))
    state.update((n, s, last))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 6)], "last_ts_us": [last]}
    )


def running_user_stats_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """events parquet stream → per-user running stats with explicit state.

    Returns the unstarted streaming DataFrame (attach a sink; ``update``
    output mode emits one row per touched user per micro-batch).
    """
    # nanos-aware: no conf change for MICROS feeds; kept for NANOS feeds
    schema = stream_source_schema(spark, events_path)
    if os.path.isfile(events_path):
        staged = tempfile.mkdtemp(prefix="omics_stateful_")
        os.symlink(events_path, os.path.join(staged, os.path.basename(events_path)))
        events_path = staged
    stream = spark.readStream.schema(schema).parquet(events_path)
    # normalize the timestamp to epoch micros JVM-side (any parquet ts
    # encoding) so the pandas state function sees a plain int64 column
    return (
        stream.select(
            "user_id", "value", ts_event_micros(stream).alias("ts_us")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
