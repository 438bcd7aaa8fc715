"""Containment mapping — the relational shell of the reference's
base-rule map construction (SURVEY §2 K3/K4, ``mapBaseRetroRules.py``).

The reference builds, for every reaction SMARTS, the ``;``-lists of rules
it is contained in (``smarts_is_in``) and rules it contains
(``smarts_has``) by pairwise RDKit substructure matching, pre-filtered by
monoisotopic mass (``mapBaseRetroRules.py:203-205`` — a pattern can only
be a substructure of something at least as heavy).

Spark-first restatement over token/shingle sets:

- candidate pairs come from an inverted-index join (only pairs sharing an
  element exist — never |rules|²),
- the mass pre-filter becomes a size ordering (|A| ≤ |B|),
- "substructure" is set containment above a threshold
  (|A∩B| / |A| ≥ τ; τ=1.0 is exact containment),
- the ``;``-list map columns are canonical sorted ``set_encode`` strings
  (deterministic, SURVEY §7).

The chemistry kernel (RDKit ``HasSubstructMatch``) would drop in as a
verification pandas_udf over exactly these candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import MAX_POSTING, SHINGLE_WIDTH
from .dedup import shingles_from_tokens


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_containment: float = 0.8,
    width: int = SHINGLE_WIDTH,
    max_posting: int = MAX_POSTING,
) -> DataFrame:
    """(inner_id, outer_id, containment): directed pairs where the smaller
    set is ≥ ``min_containment`` covered by the larger (ties on size break
    by id so each unordered pair appears once).

    Shingle postings above ``max_posting`` are dropped (same stop-shingle
    guard as the dedup operators — bounds the in-row pair expansion that
    one hot key would otherwise blow up at corpus scale; the DuckDB oracle
    carries the identical bound)."""
    from .dedup import _pairs_from_ids

    arr = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    ).select(F.col(id_col), shingles_from_tokens(F.col("__toks"), width).alias("__sh"))
    e = arr.select(F.col(id_col), F.explode_outer("__sh").alias("s"))
    sizes = arr.select(F.col(id_col), F.size("__sh").cast("long").alias("sz"))

    # posting-list pair expansion (shingle sets computed once); direction
    # is decided afterwards from the sizes
    inter = (
        e.where(F.col("s").isNotNull())
        .groupBy("s")
        .agg(F.collect_list(id_col).alias("__ids"))
        .where((F.size("__ids") > 1) & (F.size("__ids") <= max_posting))
        .select(F.explode(_pairs_from_ids(F.col("__ids"))).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    pairs = inter.join(sa, "id_a").join(sb, "id_b")
    # size pre-filter (the mass analog): the smaller set is the inner side;
    # equal sizes keep the (id_a < id_b) orientation the expansion produced
    inner_is_a = F.col("sz_a") <= F.col("sz_b")
    return (
        pairs.select(
            F.when(inner_is_a, F.col("id_a")).otherwise(F.col("id_b")).alias("inner_id"),
            F.when(inner_is_a, F.col("id_b")).otherwise(F.col("id_a")).alias("outer_id"),
            F.round(
                F.col("inter") / F.when(inner_is_a, F.col("sz_a")).otherwise(F.col("sz_b")), 6
            ).alias("containment"),
        )
        .where(F.col("containment") >= min_containment)
    )


def containment_map(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_containment: float = 0.8,
    width: int = SHINGLE_WIDTH,
    max_posting: int = MAX_POSTING,
) -> DataFrame:
    """Per-id rule-map row (the reference's ``rule_map`` output shape,
    FIXTURES §14): canonical ``;``-lists of containers (``is_in``) and
    containees (``has``)."""
    pairs = containment_pairs(df, text_col, id_col, min_containment, width, max_posting)
    is_in = pairs.groupBy(F.col("inner_id").alias(id_col)).agg(
        F.array_join(F.array_sort(F.collect_set(F.col("outer_id").cast("string"))), ";").alias(
            "is_in"
        )
    )
    has = pairs.groupBy(F.col("outer_id").alias(id_col)).agg(
        F.array_join(F.array_sort(F.collect_set(F.col("inner_id").cast("string"))), ";").alias(
            "has"
        )
    )
    base = df.select(F.col(id_col))
    return (
        base.join(is_in, id_col, "left")
        .join(has, id_col, "left")
        .select(
            id_col,
            F.coalesce("is_in", F.lit("")).alias("is_in"),
            F.coalesce("has", F.lit("")).alias("has"),
        )
    )
