"""Iterative pathway expansion — the §3.3 ``heraldPathways`` lifecycle
(reference ``heraldPathways.py:381-491`` ``reaction_loop``) restated as a
driver-orchestrated loop of pure DataFrame rounds.

Reference shape: for ≤ ``--iterations`` rounds, react every unreacted
structure (Pool fan-out per structure), assign product IDs against known
structures (mutable shared lists updated in callbacks), mark reacted,
iterate.  Spark restatement (SURVEY §7 M6):

- each round is ONE job: candidate products via the transition match (J6)
  → keep only products that exist in the known-structure table (the
  reference's id-assignment join) → anti-join against everything already
  reached from the same root (the dedup that replaces shared mutable
  state) → union into the frontier;
- ``localCheckpoint()`` per round cuts the growing lineage (the K5 risk
  note in SURVEY §7);
- fully deterministic: product identity is the matched structure id — no
  random VM ids.

The analog domain: structures = parts keyed by retail price (the "mass"),
reactions = a small signed transition table; a product exists when some
part sits at the transitioned price point — exactly the reference's
"candidate mass matched back against the mass table" semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def iterative_expand(
    structures: DataFrame,
    transitions: DataFrame,
    iterations: int = 3,
    id_col: str = "structure_id",
    mass_col: str = "mm",
    delta_col: str = "delta",
    digits: int = 1,
    known: DataFrame | None = None,
) -> DataFrame:
    """Breadth-first expansion: returns (root, structure_id, round) for
    every structure reachable from each root in ≤ ``iterations`` rounds.

    ``structures``: (structure_id, mm) — the expansion roots.  ``known``
    (defaults to ``structures``): the structure table products are matched
    against.  ``transitions``: (transition, delta), broadcast.  One
    shuffled equi-join per round on the integer price-grid key; the
    anti-join dedup keeps the frontier minimal.
    """
    scale = 10 ** digits
    known_src = known if known is not None else structures
    # the known-structure grid joins EVERY round: checkpoint it once so
    # the scan + key projection run once instead of per round (at 100 TB
    # the known table is the big side — swap for cache()/a reliable
    # checkpoint, same reasoning)
    known = known_src.select(
        F.round(F.col(mass_col) * scale, 0).cast("long").alias("__key"),
        F.col(id_col).alias("__product_id"),
        F.col(mass_col).alias("__product_mm"),
    ).localCheckpoint(eager=False)

    frontier = structures.select(
        F.col(id_col).alias("root"), F.col(id_col).alias("structure_id"), F.col(mass_col)
    )
    reached = frontier.select("root", "structure_id")
    out = frontier.select("root", "structure_id").withColumn("round", F.lit(0))

    for rnd in range(1, iterations + 1):
        cand = (
            frontier.crossJoin(F.broadcast(transitions))
            .withColumn(
                "__key",
                F.round((F.col(mass_col) + F.col(delta_col)) * scale, 0).cast("long"),
            )
            .join(known, "__key")
        )
        new = (
            cand.select("root", F.col("__product_id").alias("structure_id"),
                        F.col("__product_mm").alias(mass_col))
            .dropDuplicates(["root", "structure_id"])
            .join(reached, ["root", "structure_id"], "left_anti")
            .localCheckpoint()
        )
        if new.isEmpty():
            break
        out = out.unionByName(new.select("root", "structure_id").withColumn("round", F.lit(rnd)))
        # no checkpoint here: `reached` is a shallow union over the
        # already-checkpointed per-round `new` sets (lineage depth stays
        # O(rounds), each leg materialized), so a third job per round
        # bought nothing
        reached = reached.unionByName(new.select("root", "structure_id"))
        frontier = new
    return out
