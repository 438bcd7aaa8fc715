"""Per-group statistical kernels (SURVEY §2 K10, K12, K13) as
``applyInPandas`` blocks — numpy only (the image has no scipy/statsmodels).

- K10 kNN impute            ← MethylMix/Download_Preprocess.R:791-819
- K12 partial-correlation   ← Gohs_method/integrated_aCGH_expression_relationships.R:51-90
- K13 count GLM (Poisson IRLS with offset; the reference's edgeR NB-GLM
  with CN offsets, Robinson_method/R/run_ABCD-DNA.R:10-84 — NB dispersion
  handled as a quasi-likelihood scale rather than edgeR's tagwise fit)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def knn_impute(
    df: DataFrame,
    block_col: str,
    row_col: str,
    col_col: str,
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """K10: impute missing (row, col) cells from the k nearest rows by
    euclidean distance over shared observed columns, per block.  Each block
    pivots to a small matrix inside its task — the fan-out is the cluster.
    Returns (block, row, col, value, imputed)."""

    def impute(pdf: pd.DataFrame) -> pd.DataFrame:
        block = pdf[block_col].iloc[0]
        m = pdf.pivot_table(
            index=row_col, columns=col_col, values=value_col, aggfunc="first", dropna=False
        )
        a = m.to_numpy(dtype=float)
        observed = ~np.isnan(a)
        out_rows = []
        for i in range(a.shape[0]):
            for j in np.where(np.isnan(a[i]))[0]:
                # RMS distance to every donor row over mutually observed cols
                dists = []
                for other in range(a.shape[0]):
                    if other == i or np.isnan(a[other, j]):
                        continue
                    mask = observed[i] & observed[other]
                    if not mask.any():
                        continue
                    d = float(np.sqrt(np.mean((a[i, mask] - a[other, mask]) ** 2)))
                    dists.append((d, other))
                dists.sort()
                if dists:
                    a[i, j] = float(np.mean([a[o, j] for _, o in dists[:k]]))
        for i, row_key in enumerate(m.index):
            for j, col_key in enumerate(m.columns):
                if not np.isnan(a[i, j]):
                    out_rows.append(
                        (block, row_key, col_key, round(float(a[i, j]), 6), not observed[i, j])
                    )
        return pd.DataFrame(
            out_rows, columns=[block_col, row_col, col_col, value_col, "imputed"]
        )

    schema = f"{block_col} string, {row_col} string, {col_col} string, {value_col} double, imputed boolean"
    return df.groupBy(block_col).applyInPandas(impute, schema=schema)


def partial_correlations(
    df: DataFrame,
    block_col: str,
    var_col: str,
    sample_col: str,
    value_col: str,
    shrinkage: float = 0.1,
) -> DataFrame:
    """K12: partial correlations between variables given all others, from
    the inverse of the (shrunk) correlation matrix — GeneNet's
    ``ggm.estimate.pcor`` shape with a fixed shrinkage intensity for
    determinism.  Per block via applyInPandas.
    Returns (block, var_a, var_b, pcor)."""

    def pcor(pdf: pd.DataFrame) -> pd.DataFrame:
        block = pdf[block_col].iloc[0]
        m = pdf.pivot_table(
            index=sample_col, columns=var_col, values=value_col, aggfunc="first"
        ).dropna()
        names = list(m.columns)
        if len(names) < 3 or len(m) < 3:
            return pd.DataFrame(columns=[block_col, "var_a", "var_b", "pcor"])
        r = np.corrcoef(m.to_numpy(dtype=float), rowvar=False)
        r = (1 - shrinkage) * r + shrinkage * np.eye(len(names))
        prec = np.linalg.inv(r)
        d = np.sqrt(np.diag(prec))
        pc = -prec / np.outer(d, d)
        rows = [
            (block, names[i], names[j], round(float(pc[i, j]), 6))
            for i in range(len(names))
            for j in range(i + 1, len(names))
        ]
        return pd.DataFrame(rows, columns=[block_col, "var_a", "var_b", "pcor"])

    schema = f"{block_col} string, var_a string, var_b string, pcor double"
    return df.groupBy(block_col).applyInPandas(pcor, schema=schema)


def poisson_glm_offset(
    df: DataFrame,
    block_col: str,
    count_col: str,
    group_col: str,
    offset_col: str,
    max_iter: int = 25,
) -> DataFrame:
    """K13: log-linear count GLM with offset via IRLS, per block —
    count ~ group, offset log(exposure).  The two-level-group case reduces
    to comparing rate ratios; a z statistic comes from the Fisher
    information.  Returns (block, coef, estimate, se, z)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        block = pdf[block_col].iloc[0]
        levels = sorted(pdf[group_col].unique())
        if len(levels) < 2:
            return pd.DataFrame(columns=[block_col, "coef", "estimate", "se", "z"])
        y = pdf[count_col].to_numpy(dtype=float)
        off = np.log(np.maximum(pdf[offset_col].to_numpy(dtype=float), 1e-12))
        X = np.column_stack(
            [np.ones(len(y))]
            + [(pdf[group_col] == lv).to_numpy(dtype=float) for lv in levels[1:]]
        )
        beta = np.zeros(X.shape[1])
        for _ in range(max_iter):
            eta = X @ beta + off
            mu = np.exp(np.clip(eta, -30, 30))
            W = mu
            z = eta - off + (y - mu) / np.maximum(mu, 1e-12)
            XtW = X.T * W
            try:
                beta_new = np.linalg.solve(XtW @ X, XtW @ z)
            except np.linalg.LinAlgError:
                break
            if np.max(np.abs(beta_new - beta)) < 1e-10:
                beta = beta_new
                break
            beta = beta_new
        eta = X @ beta + off
        mu = np.exp(np.clip(eta, -30, 30))
        cov = np.linalg.inv((X.T * mu) @ X)
        se = np.sqrt(np.diag(cov))
        names = ["intercept"] + [f"{group_col}={lv}" for lv in levels[1:]]
        return pd.DataFrame(
            {
                block_col: block,
                "coef": names,
                "estimate": np.round(beta, 6),
                "se": np.round(se, 6),
                "z": np.round(beta / np.maximum(se, 1e-12), 6),
            }
        )

    schema = f"{block_col} string, coef string, estimate double, se double, z double"
    return df.groupBy(block_col).applyInPandas(fit, schema=schema)
