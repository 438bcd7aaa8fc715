"""Streaming exact dedup over a document feed.

North-star surface (the reference is strictly batch): the batch
``exact_dedup`` content-hash semantics re-expressed as a Structured
Streaming query, so an ingest pipeline can drop duplicate documents
on arrival instead of re-scanning the corpus.

Scale shape: state is one row per DISTINCT content hash.  The
unbounded form (``dedup_doc_stream``) is the cross-batch guarantee —
state grows with distinct content, the standard trade for global
streaming dedup; the watermarked form (``with_watermark=True``) uses
``dropDuplicatesWithinWatermark`` so state is bounded by the event-time
horizon and duplicates are only suppressed within it — the production
choice when near-in-time duplicates dominate (crawl re-fetches,
producer retries).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_dir(path: str) -> str:
    if os.path.isfile(path):
        staged = tempfile.mkdtemp(prefix="omics_stream_")
        os.symlink(path, os.path.join(staged, os.path.basename(path)))
        return staged
    return path


def dedup_doc_stream(
    spark: SparkSession,
    docs_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_watermark: bool = False,
    watermark: str = "1 hour",
) -> DataFrame:
    """File-source stream of documents -> one row per distinct content
    hash (md5 of ``text_col``, the same fingerprint the batch
    ``operators.dedup.exact_dedup`` groups on).

    Returns the unstarted streaming DataFrame (id, content_hash);
    which duplicate's id survives is arrival-order-dependent, exactly
    like any streaming dedup — parity with batch is on the kept
    hash-set, not the representative ids.
    """
    schema = spark.read.parquet(docs_path).schema
    stream = spark.readStream.schema(schema).parquet(_stage_dir(docs_path))
    hashed = stream.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    if with_watermark:
        # synthetic event time from the id keeps the example self-contained
        # (a real feed supplies its own ingest timestamp column); offset by
        # a day so id 0 doesn't collide with the initial watermark at epoch
        # 0 and get discarded as late
        hashed = hashed.withColumn(
            "__event_time",
            F.timestamp_seconds(F.col(id_col).cast("double") + F.lit(86400.0)),
        ).withWatermark("__event_time", watermark)
        return hashed.dropDuplicatesWithinWatermark(["content_hash"]).drop(
            "__event_time"
        )
    return hashed.dropDuplicates(["content_hash"])


def incremental_dedup_verdicts_stream(
    spark: SparkSession,
    docs_path: str,
    ref_df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_posting: int | None = None,
    max_files_per_trigger: int | None = None,
    index=None,
) -> DataFrame:
    """Streaming incremental dedup: a document feed gets per-doc
    verdicts (``exact_ref`` / ``near_ref`` / ``novel``) against a STATIC
    reference corpus — admit-on-arrival for the nightly-ingest shape
    that :func:`...operators.dedup.incremental_dedup_verdicts` handles
    in batch.

    Built entirely from STATELESS stream-static left joins (see
    ``ref_dedup_verdicts_wide``): the stream side carries one row per
    doc with digest + band-key columns, every join is 1:<=1 against a
    distinct static table, so the query runs in append mode with no
    watermark and no state store — the static reference projections are
    re-resolved per micro-batch (cache ``ref_df`` for a long-running
    query, or pass ``index=`` — a persisted
    :class:`...operators.dedup.DedupIndex` with ``ref_df=None`` — so
    each trigger probes the bucketed tables instead of re-scanning the
    corpus).  In-batch duplicate suppression (exact_batch/near_batch)
    needs cross-row state and belongs to the batch operator or a
    downstream ``dropDuplicatesWithinWatermark``.

    Returns the unstarted streaming DataFrame (id, verdict).
    """
    from ..operators.constants import MAX_POSTING
    from ..operators.dedup import ref_dedup_verdicts_wide

    schema = spark.read.parquet(docs_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(_stage_dir(docs_path))
    return ref_dedup_verdicts_wide(
        stream,
        ref_df,
        text_col,
        id_col,
        MAX_POSTING if max_posting is None else int(max_posting),
        index=index,
    )
