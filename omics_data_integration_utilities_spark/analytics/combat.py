"""ComBat-style empirical-Bayes batch correction (SURVEY §2 K10 family,
reference ``MethylMix/ComBat_NoFiles.R:30-297``).

Parametric ComBat on long-form data (feature, sample, batch, value):

1. per-feature standardization (grand mean + pooled variance),
2. per (feature, batch) location/scale estimates,
3. EB shrinkage of batch effects toward the per-batch prior
   (normal prior for gamma, inverse-gamma for delta — method-of-moments
   hyperparameters, the reference's parametric branch),
4. adjust and de-standardize.

Spark shape: steps 1-2 are plain aggregations (two shuffles); step 3 is a
per-batch ``applyInPandas`` over the small (feature × batch) effect table;
step 4 is a broadcast join back onto the data — the full matrix never
gathers anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combat_adjust(
    df: DataFrame,
    feature_col: str,
    sample_col: str,
    batch_col: str,
    value_col: str,
    eb_iterations: int = 30,
) -> DataFrame:
    """Returns the input plus ``adjusted`` (batch-corrected value).

    Deterministic; distributed except the per-batch EB solve, whose input
    is one row per (feature, batch).
    """
    feat_stats = df.groupBy(feature_col).agg(
        F.avg(value_col).alias("__gmean"),
        F.var_pop(value_col).alias("__gvar"),
    )
    std = (
        df.join(feat_stats, feature_col)
        .withColumn(
            "__z",
            (F.col(value_col) - F.col("__gmean"))
            / F.sqrt(F.greatest(F.col("__gvar"), F.lit(1e-12))),
        )
    )
    effects = std.groupBy(feature_col, batch_col).agg(
        F.avg("__z").alias("gamma_hat"),
        F.greatest(F.var_samp("__z"), F.lit(1e-12)).alias("delta_hat"),
        F.count(F.lit(1)).alias("__n"),
    )

    def eb_shrink(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf["gamma_hat"].to_numpy(dtype=float)
        d = pdf["delta_hat"].to_numpy(dtype=float)
        n = pdf["__n"].to_numpy(dtype=float)
        # hyperpriors (method of moments, ComBat parametric)
        gbar, t2 = float(np.mean(g)), float(np.var(g)) + 1e-12
        dbar, s2 = float(np.mean(d)), float(np.var(d)) + 1e-12
        a_prior = (2 * s2 + dbar**2) / s2
        b_prior = (dbar * s2 + dbar**3) / s2
        g_star, d_star = g.copy(), d.copy()
        for _ in range(eb_iterations):
            g_new = (n * t2 * g + d_star * gbar) / (n * t2 + d_star)
            sum2 = (n - 1) * d + n * (g - g_new) ** 2
            d_new = (0.5 * sum2 + b_prior) / (n / 2.0 + a_prior - 1.0)
            if np.max(np.abs(g_new - g_star)) < 1e-10 and np.max(np.abs(d_new - d_star)) < 1e-10:
                g_star, d_star = g_new, d_new
                break
            g_star, d_star = g_new, d_new
        out = pdf.copy()
        out["gamma_star"] = np.round(g_star, 10)
        out["delta_star"] = np.round(np.maximum(d_star, 1e-12), 10)
        return out

    schema = (
        f"{feature_col} string, {batch_col} string, gamma_hat double, "
        "delta_hat double, __n long, gamma_star double, delta_star double"
    )
    shrunk = effects.groupBy(batch_col).applyInPandas(eb_shrink, schema=schema)

    adjusted = (
        std.join(
            F.broadcast(shrunk.select(feature_col, batch_col, "gamma_star", "delta_star")),
            [feature_col, batch_col],
        )
        .withColumn(
            "adjusted",
            F.round(
                ((F.col("__z") - F.col("gamma_star")) / F.sqrt(F.col("delta_star")))
                * F.sqrt(F.greatest(F.col("__gvar"), F.lit(1e-12)))
                + F.col("__gmean"),
                6,
            ),
        )
    )
    return adjusted.select(feature_col, sample_col, batch_col, value_col, "adjusted")


def combat_mean_only(
    df: DataFrame,
    feature_col: str,
    sample_col: str,
    batch_col: str,
    value_col: str,
) -> DataFrame:
    """Mean-only ComBat (the reference family's ``mean.only`` variant:
    location-shift batch correction without the EB scale solve) — remove
    each batch's mean shift in standardized space, then de-standardize:

        adjusted = (z − mean_z(feature, batch)) · sqrt(gvar) + gmean

    Unlike :func:`combat_adjust` this is CLOSED FORM: two aggregations +
    a join back, every step plain SQL → DuckDB-oracle hash-checkable.
    Returns (feature, sample, value, adjusted).
    """
    feat_stats = df.groupBy(feature_col).agg(
        F.avg(value_col).alias("__gmean"),
        F.var_pop(value_col).alias("__gvar"),
    )
    std = df.join(feat_stats, feature_col).withColumn(
        "__z",
        (F.col(value_col) - F.col("__gmean"))
        / F.sqrt(F.greatest(F.col("__gvar"), F.lit(1e-12))),
    )
    gamma = std.groupBy(feature_col, batch_col).agg(
        F.avg("__z").alias("__gamma")
    )
    return (
        std.join(gamma, [feature_col, batch_col])
        .withColumn(
            "adjusted",
            F.round(
                (F.col("__z") - F.col("__gamma"))
                * F.sqrt(F.greatest(F.col("__gvar"), F.lit(1e-12)))
                + F.col("__gmean"),
                6,
            ),
        )
        .select(
            feature_col,
            sample_col,
            F.round(value_col, 6).alias(value_col),
            "adjusted",
        )
    )
