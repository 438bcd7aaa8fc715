"""Data-layout writers — partitioned (Hive-style directories) and
clustered (range-partitioned + sorted files) parquet, plus the pruned
read path that exploits them.

The reference repo writes flat CSV/SQLite outputs; at 100 TB the WRITE
layout is a first-class query-performance decision, so this module is
part of the additive scale surface:

- ``write_partitioned``: directory-per-value layout.  A reader's
  equality/IN predicate on the partition column becomes a
  **PartitionFilters** entry — Spark never lists, opens, or schedules
  the non-matching directories.  This is the only pruning that skips
  I/O *entirely* (file listing included), so it belongs on the
  low-cardinality columns every query filters on (source, language,
  date).  Partition values must be low-cardinality: a directory per
  distinct value of a high-cardinality key would melt the filesystem
  metadata layer — that's what clustering is for.
- ``write_clustered``: ``repartitionByRange`` + ``sortWithinPartitions``
  on a (possibly high-cardinality) key.  Files then hold disjoint key
  ranges and every parquet row-group footer carries tight min/max
  stats, so a pushed range predicate (**PushedFilters**) lets the
  reader skip whole row groups without decoding them.  Complements
  directory partitioning one level down.
- The two compose: partition by the coarse column, cluster by the fine
  key within each directory (``write_partitioned(cluster_by=...)``).

Determinism note: ``repartitionByRange`` samples to pick range bounds,
so FILE boundaries may shift run-to-run; the rows and their values are
unaffected — only which file a boundary row lands in.  Nothing here
may be relied on for output ordering; readers re-sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_partitioned", "write_clustered", "read_table"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    cluster_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` under ``path`` with one directory level per column
    in ``partition_by`` (Hive layout), optionally clustering rows by
    ``cluster_by`` inside each directory.

    The pre-write ``repartition(*partition_by)`` puts each partition
    value's rows in one task, so each directory gets ONE file instead
    of one-per-upstream-task — the small-files problem is a write-time
    decision, and the default (no repartition) produces
    |tasks|×|values| files at cluster scale.
    """
    parts = list(partition_by)
    if not parts:
        raise ValueError("write_partitioned: partition_by must be non-empty")
    clus = [c for c in cluster_by if c not in parts]
    shaped = df.repartition(*parts)
    if clus:
        shaped = shaped.sortWithinPartitions(*parts, *clus)
    shaped.write.mode(mode).partitionBy(*parts).parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``num_files`` range-partitioned, internally
    sorted parquet files on ``cluster_by`` — disjoint key ranges per
    file, tight row-group min/max footers, so pushed range predicates
    skip row groups wholesale.  Size ``num_files`` for O(100 MB–1 GB)
    files at the target scale."""
    clus = list(cluster_by)
    if not clus:
        raise ValueError("write_clustered: cluster_by must be non-empty")
    if num_files < 1:
        raise ValueError("write_clustered: num_files must be >= 1")
    (
        df.repartitionByRange(num_files, *clus)
        .sortWithinPartitions(*clus)
        .write.mode(mode)
        .parquet(path)
    )


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a layout written by either writer.  Partition-column values
    are recovered from the directory names (they come back LAST in the
    schema, as discovered partition columns); predicates on them prune
    directories, predicates on clustered columns push down to the
    parquet reader."""
    return spark.read.parquet(path)
