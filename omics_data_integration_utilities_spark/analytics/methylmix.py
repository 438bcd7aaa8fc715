"""MethylMix-style per-group mixture modelling (SURVEY §2 K8/K9,
reference ``MethylMix/MethylMix.R:313-419`` ModelSingleGene /
``blc_2`` EM).

The reference fits beta mixtures per gene over a ``foreach %dopar%`` R
worker pool; the Spark restatement is ``groupBy(gene).applyInPandas`` —
each group is small (samples per gene), the fan-out is the cluster.  The
kernel here is a 1-D Gaussian mixture EM with deterministic quantile
initialization (reproducible across runs/partitionings, replacing the
reference's order-dependent init) and BIC model selection over 1..max_k
components, mirroring the reference's maxComp search.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _fit_k(x: np.ndarray, k: int, max_iter: int = 100, tol: float = 1e-8):
    """EM for a k-component 1-D Gaussian mixture, quantile-initialized."""
    n = len(x)
    qs = np.quantile(x, [(i + 0.5) / k for i in range(k)])
    mu = qs.astype(float)
    sigma = np.full(k, max(x.std(), 1e-6))
    w = np.full(k, 1.0 / k)
    ll = -np.inf
    for _ in range(max_iter):
        dens = np.stack(
            [wi / (si * math.sqrt(2 * math.pi)) * np.exp(-0.5 * ((x - mi) / si) ** 2)
             for wi, mi, si in zip(w, mu, sigma)]
        )
        tot = dens.sum(axis=0) + 1e-300
        new_ll = float(np.log(tot).sum())
        r = dens / tot
        nk = r.sum(axis=1) + 1e-12
        w = nk / n
        mu = (r * x).sum(axis=1) / nk
        sigma = np.sqrt((r * (x - mu[:, None]) ** 2).sum(axis=1) / nk)
        sigma = np.maximum(sigma, 1e-6)
        if abs(new_ll - ll) < tol:
            ll = new_ll
            break
        ll = new_ll
    bic = -2 * ll + (3 * k - 1) * math.log(n)
    return ll, bic, w, mu, sigma


def fit_mixtures(
    df: DataFrame,
    group_col: str,
    value_col: str,
    max_k: int = 3,
    max_iter: int = 100,
) -> DataFrame:
    """Per-group GMM with BIC selection → (group, n, k, comp, weight, mu,
    sigma), one row per selected component.  Distributed one-group-per-task
    via applyInPandas (the reference's %dopar% fan-out, MethylMix.R:256)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[group_col].iloc[0]
        x = np.sort(pdf[value_col].dropna().to_numpy(dtype=float))
        if len(x) < 5:
            return pd.DataFrame(
                columns=[group_col, "n", "k", "comp", "weight", "mu", "sigma"]
            )
        best = None
        for k in range(1, max_k + 1):
            if len(x) < 5 * k:
                break
            ll, bic, w, mu, sigma = _fit_k(x, k, max_iter)
            if best is None or bic < best[0]:
                best = (bic, k, w, mu, sigma)
        _, k, w, mu, sigma = best
        order = np.argsort(mu)
        return pd.DataFrame(
            {
                group_col: key,
                "n": len(x),
                "k": k,
                "comp": range(k),
                "weight": np.round(w[order], 6),
                "mu": np.round(mu[order], 6),
                "sigma": np.round(sigma[order], 6),
            }
        )

    schema = f"{group_col} string, n long, k long, comp long, weight double, mu double, sigma double"
    return df.groupBy(group_col).applyInPandas(fit, schema=schema)


def linear_filter(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    min_n: int = 5,
    max_slope: float = 0.0,
    min_r2: float = 0.1,
) -> DataFrame:
    """K9: the reference's per-gene ``lm(GE ~ MET)`` screen
    (MethylMix.R:171-216) in closed-form SQL expressions — slope from
    covariance/variance, R² from corr² — no UDF, one shuffle."""
    from pyspark.sql import functions as F

    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.covar_pop(x_col, y_col).alias("__cov"),
        F.var_pop(x_col).alias("__var"),
        F.corr(x_col, y_col).alias("__r"),
    )
    out = (
        agg.where((F.col("n") >= min_n) & (F.col("__var") > 0) & F.col("__r").isNotNull())
        .withColumn("slope", F.col("__cov") / F.col("__var"))
        .withColumn("r2", F.col("__r") * F.col("__r"))
        .where((F.col("slope") < max_slope) & (F.col("r2") > min_r2))
    )
    return out.select(
        group_col,
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("r2", 6).alias("r2"),
    )
