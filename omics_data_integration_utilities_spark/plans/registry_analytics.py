"""Query registry part 3 — analytics kernels (DriverNet greedy cover,
permutation null).  The greedy loop is inherently sequential (SURVEY §2
O3/K7) and the permutation fan-out uses a seeded RNG, so these have no
ANSI-SQL oracle — the driver records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..analytics.drivernet import greedy_driver_selection, permutation_null_coverage
from .registry import _j12_events


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


QUERIES_ANALYTICS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "drivernet_greedy": q_drivernet_greedy,
    "drivernet_permutation": q_drivernet_permutation,
}

# intentionally empty: greedy/permutation are not SQL-expressible
ORACLES_ANALYTICS: dict[str, str] = {}
