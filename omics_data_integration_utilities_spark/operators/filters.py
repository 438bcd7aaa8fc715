"""Filter operators (SURVEY §2.2 P1-P9).

All pure DataFrame expressions; the per-group statistics use a single
shuffle (window or groupBy+join on the same key, which Catalyst reuses).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def threshold_filter(df: DataFrame, col: str, cutoff: float, absolute: bool = True) -> DataFrame:
    """P2: ``abs(correlation) >= cutoff`` style predicate
    (reference ``gizmos.py:646-649``)."""
    c = F.abs(F.col(col)) if absolute else F.col(col)
    return df.where(c >= cutoff)


def remove_zeros(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """P5: drop every group (gene) that contains any exact-zero value
    (reference ``corrMultiomics.py:200-202``).  Long-form anti-join: one
    shuffle to find offending keys, broadcast-anti back."""
    bad = df.where(F.col(value_col) == 0).select(*key_cols).distinct()
    return df.join(bad, key_cols, "left_anti")


def mad_filter(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    min_mad: float = 0.0,
) -> DataFrame:
    """P6: keep groups whose median-absolute-deviation exceeds ``min_mad``
    (reference ``gizmos.py:15-25,121-130``).

    Exact medians (not approx) so the DuckDB oracle agrees.  Two
    aggregations over the same key — the second groupBy reuses the
    partitioning of the first join's shuffle.
    """
    med = df.groupBy(*key_cols).agg(F.median(value_col).alias("__med"))
    mad = (
        df.join(med, key_cols)
        .groupBy(*key_cols)
        .agg(F.median(F.abs(F.col(value_col) - F.col("__med"))).alias("mad"))
        .where(F.col("mad") > min_mad)
    )
    return df.join(mad.select(*key_cols), key_cols, "left_semi")


def group_mad(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """Per-group MAD values (the statistic itself, for inspection/tests)."""
    med = df.groupBy(*key_cols).agg(F.median(value_col).alias("__med"))
    return (
        df.join(med, key_cols)
        .groupBy(*key_cols)
        .agg(F.median(F.abs(F.col(value_col) - F.col("__med"))).alias("mad"))
    )


def outlier_flags(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    threshold: float = 2.0,
    broadcast_stats: bool | None = None,
) -> DataFrame:
    """P8: per-group z-score outlier flag, DriverNet
    ``getPatientOutlierMatrix.R:4-26`` (x is an outlier iff
    ``|x − μ| >= threshold·σ`` within its gene).

    Aggregate-then-join formulation: the per-group stats table has one row
    per group (map-side partial aggregation), and the big relation is never
    sorted — strictly cheaper than the window form, which must sort every
    partition.  ``broadcast_stats=None`` (default) lets Catalyst/AQE pick
    the join strategy from the stats table's actual size — a forced hint
    would be wrong when the group key is high-cardinality (10⁸ groups is a
    stats table that no longer broadcasts); pass True only when the caller
    knows the group count is small.
    """
    stats = df.groupBy(*key_cols).agg(
        F.mean(value_col).alias("__mu"), F.stddev(value_col).alias("__sd")
    )
    if broadcast_stats:
        stats = F.broadcast(stats)
    joined = df.join(stats, key_cols)
    return joined.withColumn(
        "outlier",
        F.when(F.col("__sd").isNull() | (F.col("__sd") == 0), F.lit(False)).otherwise(
            F.abs(F.col(value_col) - F.col("__mu")) >= F.lit(threshold) * F.col("__sd")
        ),
    ).drop("__mu", "__sd")


def na_fraction_filter(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    max_na_fraction: float = 0.2,
) -> DataFrame:
    """P9: drop groups with more than ``max_na_fraction`` missing values
    (MethylMix ``Download_Preprocess.R:791-819``)."""
    frac = (
        df.groupBy(*key_cols)
        .agg(F.avg(F.col(value_col).isNull().cast("int")).alias("na_frac"))
        .where(F.col("na_frac") <= max_na_fraction)
    )
    return df.join(frac.select(*key_cols), key_cols, "left_semi")


def nonzero_transition_filter(df: DataFrame, col: str) -> DataFrame:
    """P4: drop rows whose rounded transition is exactly zero
    (reference ``pathMassTransitions.py:278-288``)."""
    return df.where(F.abs(F.col(col)) > 0)


def drop_null_any(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """P7: ``dropna(how='any')`` / subset variant."""
    return df.na.drop("any", subset=subset)
