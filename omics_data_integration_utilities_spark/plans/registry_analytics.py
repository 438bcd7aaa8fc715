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
from .registry import _j12_events, _t


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
    """A8: permutation-null coverage distribution (20 seeded runs,
    DriverNet SignificanceTest.R:28-74 shape)."""
    events = _j12_events(spark, sf_dir)
    return permutation_null_coverage(events, n_runs=20, k=5)


def q_drivernet_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 + K7 end-to-end: observed greedy coverage vs the permutation
    null → empirical p-value (DriverNet ResultSummary.R:104-129 shape)."""
    events = _j12_events(spark, sf_dir)
    picks = greedy_driver_selection(events, k=5)
    observed = sum(c for _, c in picks)
    null = permutation_null_coverage(events, n_runs=20, k=5)
    worse = null.where(F.col("total_coverage") >= observed).count()
    total = null.count()
    return spark.createDataFrame(
        [(int(observed), int(worse), int(total), round((worse + 1) / (total + 1), 6))],
        "observed_coverage long, null_ge long, n_runs long, p_value double",
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
