"""DriverNet-style analytics (SURVEY §2 K7/O3/A8, reference
``DriverNet/DriverSelection.R`` and ``SignificanceTest.R``).

Two pieces:

- :func:`greedy_driver_selection` — the inherently sequential greedy
  set-cover.  Spark prepares the bipartite event table (J12, distributed);
  the K-round loop itself runs as K tiny Spark jobs (groupBy + top-1 +
  anti-join), collecting only one winner row per round.  Event data never
  leaves the cluster — at 100 TB the anti-join shrinks the working set
  every round, and ``localCheckpoint`` keeps lineage flat.

- :func:`permutation_null_coverage` — the reference's 500 randomized
  greedy re-runs (``SignificanceTest.R:28-74``) as a ``groupBy(run_id).
  applyInPandas`` fan-out: each run permutes mutation→gene labels with a
  run-seeded RNG and replays the greedy cover in pandas (each run's data is
  small — patients×genes — exactly why the reference could run it in R).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_driver_selection(
    events: DataFrame,
    mut_col: str = "mut_gene",
    event_cols: tuple[str, str] = ("patient", "out_gene"),
    k: int = 5,
) -> list[tuple[str, int]]:
    """Greedy set cover: repeatedly pick the mutated gene covering the most
    remaining (patient, outlier-gene) events; remove covered events.

    Returns [(gene, newly_covered_count), ...] in selection order.
    Deterministic: ties break on the gene key ascending.
    """
    ev = list(event_cols)
    remaining = events.select(mut_col, *ev).distinct().localCheckpoint()
    out: list[tuple[str, int]] = []
    for _ in range(k):
        top = (
            remaining.groupBy(mut_col)
            .agg(F.count(F.lit(1)).alias("__cov"))
            .orderBy(F.col("__cov").desc(), F.col(mut_col).asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        gene, cov = top[0][0], top[0][1]
        out.append((gene, cov))
        covered = remaining.where(F.col(mut_col) == gene).select(*ev).distinct()
        remaining = remaining.join(covered, ev, "left_anti").localCheckpoint()
        if remaining.isEmpty():
            break
    return out


def _greedy_pandas(pdf: pd.DataFrame, k: int) -> list[int]:
    """In-memory greedy cover over (mut_gene, event) rows → coverage sizes."""
    sets = pdf.groupby("mut_gene")["event"].apply(set).to_dict()
    covered: set = set()
    sizes: list[int] = []
    for _ in range(k):
        best_gene, best_gain = None, 0
        for g in sorted(sets):
            gain = len(sets[g] - covered)
            if gain > best_gain:
                best_gene, best_gain = g, gain
        if best_gene is None:
            break
        covered |= sets[best_gene]
        sizes.append(best_gain)
    return sizes


def permutation_null_coverage(
    events: DataFrame,
    n_runs: int = 100,
    k: int = 5,
    mut_col: str = "mut_gene",
    event_cols: tuple[str, str] = ("patient", "out_gene"),
) -> DataFrame:
    """Null distribution of greedy coverage: each run shuffles the
    mutation→gene assignment (run-seeded, reproducible) and replays the
    greedy cover.  Distributed one-run-per-group via ``applyInPandas``.

    Returns (run_id, total_coverage).
    """
    ev = events.select(
        F.col(mut_col).alias("mut_gene"),
        F.concat_ws("", *[F.col(c).cast("string") for c in event_cols]).alias("event"),
    ).distinct()
    runs = ev.sparkSession.range(n_runs).withColumnRenamed("id", "run_id")
    fanout = ev.crossJoin(runs)

    def run_one(pdf: pd.DataFrame) -> pd.DataFrame:
        run_id = int(pdf["run_id"].iloc[0])
        rng = pd.Series(pdf["mut_gene"].unique()).sample(
            frac=1.0, random_state=run_id
        )
        mapping = dict(zip(sorted(rng), rng))
        shuffled = pdf.assign(mut_gene=pdf["mut_gene"].map(mapping))
        sizes = _greedy_pandas(shuffled, k)
        return pd.DataFrame({"run_id": [run_id], "total_coverage": [int(sum(sizes))]})

    return fanout.groupBy("run_id").applyInPandas(
        run_one, schema="run_id long, total_coverage long"
    )
