"""Streaming sinks: the write-side conventions the streaming entry
points leave to callers (north-star surface; the reference is strictly
batch — its sinks are plain CSV/SQLite writes,
/root/reference/integrative_omics/gizmos.py's to_csv/to_sql call sites).

Two production shapes:

- :func:`start_parquet_append_sink` — the plain durable feed archive:
  append-mode parquet files + checkpoint, the downstream input for every
  batch recount/verify job in this engine (the Lambda split the
  heavy-hitter and dedup docstrings describe needs the archived feed).

- :func:`start_upsert_sink` — streaming MERGE: each micro-batch upserts
  into a parquet SNAPSHOT via ``operators.joins.upsert_snapshot``
  (anti-join + union — no Delta/Iceberg machinery), written blue-green
  (tmp dir + atomic rename) so readers never observe a half-written
  snapshot.  This is the "latest state per key" sink that update-mode
  aggregations and CDC-style feeds need, expressed with the engine's own
  operators; exactly-once per micro-batch comes from foreachBatch's
  replay contract (a replayed batch re-derives the same snapshot —
  upsert is idempotent per key/batch).

Scale shape: the upsert's anti-join builds from the micro-batch (small
side) so the snapshot is scanned, never shuffled; snapshot rewrite cost
is O(snapshot + batch) per trigger — at a 100 TB snapshot you would
partition the snapshot directory by key-hash bucket and rewrite only the
buckets the batch touches (the engine's bucketed-index pattern,
operators/dedup.py build_dedup_index); this single-dir form is the
correct small/medium shape and the bucketed variant is a layout change,
not a semantics change.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.joins import upsert_snapshot


def start_parquet_append_sink(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Append-mode parquet archive with checkpointing — the durable feed
    copy batch verifiers recount against.  Returns the started query."""
    writer = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_upsert_sink(
    stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: "list[str]",
    trigger_once: bool = False,
) -> StreamingQuery:
    """Streaming MERGE into a parquet snapshot: per micro-batch, rows
    replace same-key snapshot rows, new keys insert, untouched rows
    carry (``upsert_snapshot`` semantics).  The batch is deduped to one
    row per key first (LAST occurrence by batch order is arbitrary under
    Spark's micro-batch semantics, so the dedupe is a plain
    ``dropDuplicates`` — feed a deterministic update stream, or
    pre-aggregate, when per-key ordering matters).

    Blue-green write: the new snapshot lands in a tmp sibling dir and
    atomically renames over the old one, so concurrent readers see
    either the previous or the next complete snapshot, never a partial
    write (parquet dir rename is atomic on a posix fs; object stores
    want a manifest swap instead — same pattern, different primitive).
    """
    spark = stream.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates(key_cols)
        if os.path.isdir(snapshot_dir):
            target = spark.read.parquet(snapshot_dir)
            merged = upsert_snapshot(target, batch, key_cols)
        else:
            merged = batch
        tmp = f"{snapshot_dir}.tmp-{batch_id}-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{snapshot_dir}.old-{batch_id}-{uuid.uuid4().hex[:8]}"
        if os.path.isdir(snapshot_dir):
            os.rename(snapshot_dir, old)
        os.rename(tmp, snapshot_dir)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
