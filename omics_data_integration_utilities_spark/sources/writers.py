"""Sinks (SURVEY §2.1 S8-S10).

The reference writes incrementally — header-once CSV then ``mode='a'``
appends inside loops (``heraldPathways.py:505-522``), per-chunk SQLite
appends (``queryMassNPDB_mod.py:149-151``) — because pandas cannot hold
the full result.  The engine's posture: accumulate lazily (union of
DataFrames is a plan, not data) and write ONCE; for genuinely incremental
production use, partitioned parquet appends keep writes atomic per
partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Canonical sink (replaces S9 SQLite appends): columnar, splittable,
    statistics for pushdown on re-read."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    sep: str = ",",
    single_file: bool = False,
) -> None:
    """S8 CSV sink.  ``single_file`` coalesces to one part — only for
    small result tables (the reference's results.csv shape); large outputs
    stay multi-part."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)


def write_edge_file(df: DataFrame, path: str) -> None:
    """S10: headerless space-separated edge list (ClusterOne input)."""
    df.write.mode("overwrite").option("sep", " ").option("header", False).csv(path)


def write_bucketed_table(
    df: DataFrame, name: str, bucket_cols: Sequence[str], n_buckets: int = 64
) -> None:
    """Bucketed managed table: co-locates later joins/aggregations on
    ``bucket_cols`` without a shuffle — the storage-side half of the
    100 TB join strategy (SURVEY §4 'Parquet bucketing of NPDB by
    rounded mass')."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )
