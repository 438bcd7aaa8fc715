"""Permutation null + FDR machinery (SURVEY §2 K12, Gohs method).

Reference semantics, re-expressed Spark-first:

* mismatched-pair null distribution — ``Gohs_method/
  integrated_aCGH_expression_relationships.R:109-131`` (``null.distb.m``
  correlates randomly re-paired rows; the Spark restatement uses a
  deterministic cyclic-shift derangement by md5 rank so both engines and
  repeated runs agree),
* permutation p-value = fraction of the null at least as extreme,
  with the reference's prepended sentinel making it never zero —
  ``...R:130`` (``c(0, ...)``) and ``:157``
  (``length(which(comb.pv.rand<=x))/length(comb.pv.rand)``),
* Benjamini-Hochberg adjust — ``...R:158`` (``p.adjust(method="fdr")``).

Everything here is pure DataFrame algebra (no UDF): the null-rank count
is a union + one window pass (nulls sorted before observations on ties),
and BH is the classic reverse cumulative-min window — both
whole-stage-codegen'd and DuckDB-oracle-able, and both scale: no
``collect``, one shuffle per window partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def permutation_pvalues(
    obs: DataFrame,
    null: DataFrame,
    stat_col: str,
    block_cols: list[str],
    greater: bool = True,
) -> DataFrame:
    """Attach ``perm_pv`` to each observed row: the fraction of the
    block's null statistics at least as extreme (≥ when ``greater``),
    with +1 smoothing mirroring the reference's prepended 0 sentinel
    (R:130) so a p-value is never exactly zero.

    Implemented as union + one window: nulls order before observations on
    ties, so the running null count at an observed row is exactly
    ``#null >= stat``.  Null rows need only ``block_cols + [stat_col]``.
    """
    o = obs.withColumn("__is_obs", F.lit(1))
    n = null.select(
        *[F.col(c) for c in block_cols], F.col(stat_col), F.lit(0).alias("__is_obs")
    )
    # align schemas: null side gets nulls for the obs-only columns
    for c in o.columns:
        if c not in n.columns:
            n = n.withColumn(c, F.lit(None).cast(o.schema[c].dataType))
    u = o.select(*o.columns).unionByName(n.select(*o.columns))
    order = [F.desc(stat_col)] if greater else [F.asc(stat_col)]
    w_cum = Window.partitionBy(*block_cols).orderBy(*order, F.asc("__is_obs"))
    w_all = Window.partitionBy(*block_cols)
    ranked = u.select(
        *u.columns,
        F.sum(1 - F.col("__is_obs")).over(w_cum).alias("__null_le"),
        F.sum(1 - F.col("__is_obs")).over(w_all).alias("__null_n"),
    ).where(F.col("__is_obs") == 1)
    return ranked.withColumn(
        "perm_pv",
        F.round((F.col("__null_le") + 1.0) / (F.col("__null_n") + 1.0), 6),
    ).drop("__is_obs", "__null_le", "__null_n")


def bh_adjust(
    df: DataFrame,
    pv_col: str,
    block_cols: list[str],
    tiebreak_cols: list[str],
    out_col: str = "pv_adj",
) -> DataFrame:
    """Benjamini-Hochberg ``p.adjust(method="fdr")`` (R:158) as a window
    expression: rank p ascending, raw_i = m·p_i/i, then the running min
    from each row to the end of the block, capped at 1.  ``tiebreak_cols``
    make row_number deterministic across engines."""
    order = [F.asc(pv_col)] + [F.asc(c) for c in tiebreak_cols]
    w_rank = Window.partitionBy(*block_cols).orderBy(*order)
    w_all = Window.partitionBy(*block_cols)
    w_tail = (
        Window.partitionBy(*block_cols)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    raw = (
        F.col(pv_col)
        * F.count(F.lit(1)).over(w_all)
        / F.row_number().over(w_rank)
    )
    return df.withColumn("__raw", raw).withColumn(
        out_col, F.round(F.least(F.lit(1.0), F.min("__raw").over(w_tail)), 6)
    ).drop("__raw")


def mismatched_pair_null(
    df: DataFrame,
    block_col: str,
    var_col: str,
    sample_col: str,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Deterministic mismatched re-pairing for the null (R:109-131
    ``null.distb.m`` correlates modality A of a random gene with
    modality B of another; here each variable's A-series is paired with
    the B-series of its successor in md5-rank order — a derangement, so
    every null pair is genuinely mismatched, and deterministic for the
    oracle).  Returns per (block, var_a, var_b) the Pearson r of the
    mismatched series over shared samples."""
    ranked_vars = (
        df.select(block_col, var_col)
        .distinct()
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(block_col).orderBy(F.md5(F.col(var_col)), F.col(var_col))
            ),
        )
    )
    n_vars = ranked_vars.groupBy(block_col).agg(F.count(F.lit(1)).alias("__n"))
    a_side = ranked_vars.select(
        F.col(block_col), F.col(var_col).alias("var_a"), F.col("__rk").alias("__rka")
    )
    b_side = ranked_vars.select(
        F.col(block_col).alias("__blk_b"),
        F.col(var_col).alias("var_b"),
        F.col("__rk").alias("__rkb"),
    )
    pairing = (
        a_side.join(n_vars, on=block_col)
        .join(
            b_side,
            (F.col(block_col) == F.col("__blk_b"))
            & (F.col("__rkb") == (F.col("__rka") % F.col("__n")) + 1),
        )
        .select(block_col, "var_a", "var_b")
        .where(F.col("var_a") != F.col("var_b"))
    )
    a = df.select(
        F.col(block_col), F.col(var_col).alias("var_a"),
        F.col(sample_col).alias("__s"), F.col(a_col).alias("__va"),
    )
    b = df.select(
        F.col(block_col), F.col(var_col).alias("var_b"),
        F.col(sample_col).alias("__s"), F.col(b_col).alias("__vb"),
    )
    joined = pairing.join(a, [block_col, "var_a"]).join(b, [block_col, "var_b", "__s"])
    return (
        joined.groupBy(block_col, "var_a", "var_b")
        .agg(F.corr("__va", "__vb").alias("r"), F.count(F.lit(1)).alias("n"))
        .where(F.col("r").isNotNull())
        .select(block_col, "var_a", "var_b", F.round("r", 6).alias("r"), "n")
    )
