"""Streaming curation pipeline: quality gate → exact dedup on arrival.

The batch flagship (``plans/data_pipeline.py``) curates a corpus in one
composed plan; this is the INGEST-time sibling — documents stream in,
low-quality ones drop at the gate (a pure JVM projection, the same
``quality_expr`` the batch scorer uses), and exact duplicates are
suppressed as they arrive (``dropDuplicates`` on the content hash —
state is one row per distinct kept hash, the standard global-dedup
trade; pass a watermark column upstream and switch to
``dropDuplicatesWithinWatermark`` when the horizon-bounded form is
wanted, as in ``streaming/dedup.py``).

Parity contract (tests/test_streaming.py): the kept CONTENT-HASH SET
equals the batch equivalent (same gate, then distinct hashes) on the
same input.  Which duplicate's id survives is arrival-order-dependent —
exactly like any streaming dedup — so parity is on hashes and counts,
never representative ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import quality_expr
from .dedup import _stage_dir


def curate_doc_stream(
    spark: SparkSession,
    docs_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
) -> DataFrame:
    """File-source document stream → quality gate → exact dedup.

    Returns the unstarted streaming DataFrame
    (id, source, content_hash, quality): one row per kept document.
    """
    schema = spark.read.parquet(docs_path).schema
    stream = spark.readStream.schema(schema).parquet(_stage_dir(docs_path))
    gated = stream.select(
        F.col(id_col),
        F.col("source"),
        F.md5(F.col(text_col)).alias("content_hash"),
        F.round(quality_expr(text_col), 6).alias("quality"),
    ).where(F.col("quality") >= F.lit(float(min_quality)))
    return gated.dropDuplicates(["content_hash"])
