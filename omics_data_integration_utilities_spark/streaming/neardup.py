"""Streaming near-duplicate detection: banded-minhash LSH state over a
document feed (north-star surface; the reference is strictly batch).

The batch pipeline (``operators.dedup``: shingle → minhash → band →
bucket-join) re-expressed incrementally: signatures and band keys are
computed JVM-side on the stream (the same zero-shuffle array-HOF
projections as batch), then each (band, band_key) bucket carries its
member-id list as explicit group state via ``applyInPandasWithState`` —
a newly arriving document emits one candidate pair against every
earlier member of each bucket it lands in, the incremental form of the
batch posting-list expansion.

Scale shape: state is one row per occupied band bucket, each bounded by
``max_posting`` ids (a bucket that exceeds the cap has lost its
locality signal — it saturates, drops its id list, and stops emitting,
the streaming analogue of the batch cap that DROPS oversized buckets).
With an event-time watermark, bucket state additionally expires via
EventTimeTimeout, so total state is bounded by the horizon — the
production choice when near-in-time duplicates dominate.

Parity with batch (tests/test_streaming.py): when the whole corpus
arrives within the horizon, the distinct emitted (id_a, id_b) set
equals ``lsh_candidate_pairs`` under the same cap.  Across batches the
cap is best-effort: pairs emitted before a bucket saturates are not
retracted (streams cannot retract).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.constants import MAX_POSTING
from ..operators.dedup import lsh_band_keys

OUTPUT_SCHEMA = "band int, band_key string, id_a long, id_b long"
# ids: bucket membership so far; saturated: cap tripped (ids dropped)
STATE_SCHEMA = "ids array<long>, saturated boolean"


def _stage_dir(path: str) -> str:
    if os.path.isfile(path):
        staged = tempfile.mkdtemp(prefix="omics_neardup_")
        os.symlink(path, os.path.join(staged, os.path.basename(path)))
        return staged
    return path


def _make_bucket_fn(max_posting: int, ttl_ms: int | None):
    def emit_bucket_pairs(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        band, band_key = key
        old, saturated = (
            (list(state.get[0]), bool(state.get[1])) if state.exists else ([], False)
        )
        new: list[int] = []
        max_ts = 0
        for pdf in pdfs:
            new.extend(int(x) for x in pdf["__id"])
            # __event_millis is computed JVM-side (unix_millis): pandas
            # Timestamp.value on the Arrow-converted column is session-tz
            # wall-clock nanos, which would offset the timeout under a
            # non-UTC spark.sql.session.timeZone
            if ttl_ms is not None and "__event_millis" in pdf.columns and len(pdf):
                max_ts = max(max_ts, int(pdf["__event_millis"].max()))
        rows: list[tuple[int, str, int, int]] = []
        if saturated or len(old) + len(new) > max_posting:
            # locality signal lost: drop membership, stop emitting
            state.update(([], True))
        else:
            for i, b in enumerate(new):
                for a in old + new[:i]:
                    lo, hi = (a, b) if a < b else (b, a)
                    rows.append((band, band_key, lo, hi))
            state.update((old + new, False))
        if ttl_ms is not None and max_ts:
            # clamp to just past the current watermark: a bucket fed only
            # LATE data (newest member already beyond the horizon) would
            # otherwise set a timeout in the past, which Spark rejects and
            # the whole query dies — instead such a bucket expires at the
            # next timeout pass
            state.setTimeoutTimestamp(
                max(max_ts + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        if rows:
            yield pd.DataFrame(rows, columns=["band", "band_key", "id_a", "id_b"])

    return emit_bucket_pairs


def lsh_neardup_pairs_stream(
    spark: SparkSession,
    docs_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_posting: int = MAX_POSTING,
    watermark: str | None = None,
    state_ttl_ms: int = 24 * 3600 * 1000,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Document stream → per-band-bucket candidate near-dup pairs.

    Returns the unstarted streaming DataFrame (band, band_key, id_a,
    id_b); consumers ``.distinct()`` on (id_a, id_b) to merge bands,
    then verify with the batch jaccard/simhash verifiers.  With
    ``watermark`` set, a synthetic event time is derived from the doc id
    (a real feed supplies its ingest timestamp) and bucket state expires
    ``state_ttl_ms`` past its newest member.
    """
    schema = spark.read.parquet(docs_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # one file per micro-batch: the multi-batch parity/eviction tests
        # drive real incremental arrival through this (a production feed
        # sets its own trigger cadence)
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(_stage_dir(docs_path))
    keys = lsh_band_keys(stream, text_col, id_col).withColumnRenamed(id_col, "__id")
    timeout = GroupStateTimeout.NoTimeout
    ttl: int | None = None
    if watermark is not None:
        # offset by a day so id 0 clears the initial epoch-0 watermark
        keys = (
            keys.withColumn(
                "__event_time",
                F.timestamp_seconds(F.col("__id").cast("double") + F.lit(86400.0)),
            )
            .withWatermark("__event_time", watermark)
            .withColumn("__event_millis", F.unix_millis(F.col("__event_time")))
        )
        timeout = GroupStateTimeout.EventTimeTimeout
        ttl = int(state_ttl_ms)
    return keys.groupBy("band", "band_key").applyInPandasWithState(
        _make_bucket_fn(int(max_posting), ttl),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
