"""Query registry part 3 — analytics kernels (DriverNet greedy cover,
permutation null).  The greedy loop is inherently sequential (SURVEY §2
O3/K7) and the permutation fan-out uses a seeded RNG, so these have no
ANSI-SQL oracle — the driver records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..analytics.combat import combat_adjust
from ..analytics.drivernet import greedy_driver_selection, permutation_null_coverage
from .registry import _j12_events, _j12_tables, _t


def _perm_tables(spark: SparkSession, sf_dir: str):
    """DriverNet triple with permutation-ready column names."""
    mutations, edges, outliers = _j12_tables(spark, sf_dir)
    return (
        mutations.withColumnRenamed("gene", "mut_gene"),
        edges,
        outliers.withColumnRenamed("gene", "out_gene"),
    )


def q_drivernet_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7/O3: greedy driver selection over the J12 bipartite events —
    top-5 covering brands with newly-covered event counts."""
    events = _j12_events(spark, sf_dir)
    picks = greedy_driver_selection(events, k=5)
    return spark.createDataFrame(
        [(i, g, int(c)) for i, (g, c) in enumerate(picks)],
        "pick long, mut_gene string, covered long",
    )


def q_drivernet_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: permutation-null per-rank coverage distribution (20 seeded
    runs, DriverNet SignificanceTest.R:28-74 — mutation/outlier gene
    names re-drawn per run upstream of the bipartite join, inputs
    broadcast once)."""
    mutations, edges, outliers = _perm_tables(spark, sf_dir)
    return permutation_null_coverage(mutations, edges, outliers, n_runs=20, k=5)


def q_drivernet_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 + K7 end-to-end, DriverNet ResultSummary.R:104-129 semantics:
    per-driver empirical p-value = fraction of ALL pooled null coverages
    (every rank of every randomized run) exceeding that driver's observed
    coverage.  One row per selected driver; the null comparison is a
    single lazy aggregation plan (no per-gene actions)."""
    events = _j12_events(spark, sf_dir)
    picks = greedy_driver_selection(events, k=5)
    picks_df = spark.createDataFrame(
        [(i + 1, g, int(c)) for i, (g, c) in enumerate(picks)],
        "pick long, mut_gene string, covered long",
    )
    mutations, edges, outliers = _perm_tables(spark, sf_dir)
    null = permutation_null_coverage(mutations, edges, outliers, n_runs=20, k=5).select(
        "coverage"
    )
    return (
        picks_df.crossJoin(null)
        .groupBy("pick", "mut_gene", "covered")
        .agg(
            F.sum((F.col("coverage") > F.col("covered")).cast("long")).alias("null_gt"),
            F.count(F.lit(1)).alias("n_null"),
        )
        .withColumn("p_value", F.round(F.col("null_gt") / F.col("n_null"), 6))
        .orderBy("pick")
    )


def q_combat_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10 family: ComBat-style EB batch correction — feature = event_type,
    batch = source-ish bucket of user_id, value = event value."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.select(
        F.col("event_type").alias("feature"),
        F.col("event_id").cast("string").alias("sample"),
        (F.col("user_id") % 3).cast("string").alias("batch"),
        F.col("value").alias("v"),
    )
    return combat_adjust(cells, "feature", "sample", "batch", "v")


QUERIES_ANALYTICS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "drivernet_greedy": q_drivernet_greedy,
    "drivernet_permutation": q_drivernet_permutation,
    "drivernet_significance": q_drivernet_significance,
    "combat_adjust": q_combat_adjust,
}

# intentionally empty: greedy/permutation are not SQL-expressible
ORACLES_ANALYTICS: dict[str, str] = {}
