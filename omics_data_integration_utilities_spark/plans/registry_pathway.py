"""Query registry part 6 — the §3.3 iterative pathway-expansion lifecycle
(K5) with an unrolled-CTE DuckDB oracle.

The oracle mirrors the loop exactly: round r candidates = frontier ×
transitions matched against the known-structure price grid, deduped per
(root, structure), anti-joined against everything already reached.  The
compared result is the per-round path/structure census (small, robust).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pathway_expand import iterative_expand
from .registry import _t, TRANSITIONS, TRANSITIONS_SQL_VALUES

ROOT_MOD = 20  # sample 1-in-20 parts as expansion roots
ITERATIONS = 3


def q_pathway_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-round census of the K5 expansion: paths and distinct structures
    reached at each round (all rounds 0..ITERATIONS emitted, zero-filled,
    so the unrolled oracle compares exactly even when a round dries up)."""
    part = _t(spark, sf_dir, "part")
    all_structs = part.select(
        F.col("p_partkey").alias("structure_id"), F.col("p_retailprice").alias("mm")
    )
    roots = all_structs.where(F.col("structure_id") % ROOT_MOD == 0)
    trans = spark.createDataFrame(TRANSITIONS, "transition string, delta double")
    paths = iterative_expand(roots, trans, iterations=ITERATIONS, known=all_structs)
    agg = paths.groupBy("round").agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.countDistinct("structure_id").alias("n_structures"),
    )
    rounds = spark.range(ITERATIONS + 1).select(F.col("id").cast("int").alias("round"))
    return rounds.join(agg, "round", "left").select(
        "round",
        F.coalesce("n_paths", F.lit(0)).alias("n_paths"),
        F.coalesce("n_structures", F.lit(0)).alias("n_structures"),
    )


def _pathway_sql() -> str:
    key = "CAST(round(({mm} + t.delta) * 10, 0) AS BIGINT)"
    ctes = [
        "known AS (SELECT CAST(round(p_retailprice * 10, 0) AS BIGINT) AS key, "
        "p_partkey AS pid, p_retailprice AS pmm FROM part)",
        f"trans AS (SELECT * FROM (VALUES {TRANSITIONS_SQL_VALUES}) AS t(transition, delta))",
        f"n0 AS (SELECT p_partkey AS root, p_partkey AS sid, p_retailprice AS mm FROM part "
        f"WHERE p_partkey % {ROOT_MOD} = 0)",
        "reached0 AS (SELECT root, sid FROM n0)",
    ]
    for r in range(1, ITERATIONS + 1):
        prev = f"n{r-1}"
        ctes.append(
            f"c{r} AS (SELECT f.root, k.pid AS sid, k.pmm AS mm FROM {prev} f "
            f"CROSS JOIN trans t JOIN known k ON k.key = {key.format(mm='f.mm')})"
        )
        ctes.append(
            f"n{r} AS (SELECT DISTINCT root, sid, mm FROM c{r} cc WHERE NOT EXISTS "
            f"(SELECT 1 FROM reached{r-1} rr WHERE rr.root = cc.root AND rr.sid = cc.sid))"
        )
        ctes.append(
            f"reached{r} AS (SELECT root, sid FROM reached{r-1} UNION ALL SELECT root, sid FROM n{r})"
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, count(*) AS n_paths, count(DISTINCT sid) AS n_structures FROM n{r}"
        for r in range(0, ITERATIONS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


SQL_PATHWAY_CENSUS = _pathway_sql()


QUERIES_PATHWAY: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "plan_pathway_expand": q_pathway_census,
}

ORACLES_PATHWAY: dict[str, str] = {
    "plan_pathway_expand": SQL_PATHWAY_CENSUS,
}
