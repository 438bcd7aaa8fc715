"""The measured-build-side guard, in one place.

A relation produced ABOVE a ``localCheckpoint``/aggregation has no
reliable stats, and Spark's static planner guessing it broadcastable is
how the r12 pair-relation incident collected >1 GiB to the driver at
16× scale.  Every join in this engine whose build side is such a
relation therefore sizes it by MEASUREMENT: materialize once, count,
broadcast under the cap, otherwise shuffle-hash building from this
(provably bounded) side — never a sort, never a planner guess.

Shared by ``sketches.frequent_items`` (candidate recount),
``text.ngram_decontaminate`` (test-gram set) and
``text.contamination_report`` (test-gram relation); new call sites
should use this instead of re-implementing the pattern so a future
policy change (e.g. byte-based budgets) lands everywhere at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_build_side(df: DataFrame, max_broadcast_rows: int):
    """Materialize ``df`` (localCheckpoint — it will be scanned at least
    twice: the count and the join), measure it, and return
    ``(join_side, n_rows)``: ``F.broadcast`` under the cap, else the
    checkpointed relation hinted ``shuffle_hash`` so the join builds
    its hash table from this bounded side.

    The checkpoint is LAZY (r17, guide §1.2 — fewer jobs): the count is
    the first action over the marked RDD, so one job both computes and
    persists it — a count scans every partition, so the materialization
    is complete, and the join then reads the persisted blocks exactly
    as before."""
    ckpt = df.localCheckpoint(eager=False)
    n = ckpt.count()
    side = (
        F.broadcast(ckpt) if n <= int(max_broadcast_rows) else ckpt.hint("shuffle_hash")
    )
    return side, n
