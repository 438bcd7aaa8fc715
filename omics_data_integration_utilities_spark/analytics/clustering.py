"""K11 — probe→cluster hierarchical clustering (reference
``MethylMix/Download_Preprocess.R:1350-1482``: 1−corr distance, complete
linkage, cut at h=0.6, then per-cluster mean profiles).

Pure-numpy agglomerative clustering (no scipy in the image): per gene the
probe count is tiny, so each gene's linkage runs inside its
``applyInPandas`` task — the fan-out across genes is the cluster,
mirroring the reference's per-gene loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _complete_linkage_cut(dist: np.ndarray, h: float) -> np.ndarray:
    """Agglomerative complete-linkage on a dense distance matrix, cutting
    when the next merge would exceed ``h``.  Returns cluster labels
    (0-based, ordered by smallest member index — deterministic)."""
    n = dist.shape[0]
    clusters: list[list[int]] = [[i] for i in range(n)]
    d = dist.copy()
    np.fill_diagonal(d, np.inf)
    while len(clusters) > 1:
        m = len(clusters)
        best = (np.inf, -1, -1)
        for i in range(m):
            for j in range(i + 1, m):
                cd = max(
                    dist[a, b] for a in clusters[i] for b in clusters[j]
                )
                if cd < best[0] or (cd == best[0] and (i, j) < (best[1], best[2])):
                    best = (cd, i, j)
        if best[0] > h:
            break
        _, i, j = best
        clusters[i] = clusters[i] + clusters[j]
        del clusters[j]
    labels = np.zeros(n, dtype=int)
    for lbl, members in enumerate(sorted(clusters, key=min)):
        for mbr in members:
            labels[mbr] = lbl
    return labels


def cluster_probes(
    df: DataFrame,
    gene_col: str,
    probe_col: str,
    sample_col: str,
    value_col: str,
    cut_height: float = 0.6,
) -> DataFrame:
    """Per-gene probe clustering on 1−correlation distance →
    (gene, probe, cluster).  Genes fan out across the cluster."""

    def one_gene(pdf: pd.DataFrame) -> pd.DataFrame:
        gene = pdf[gene_col].iloc[0]
        m = pdf.pivot_table(
            index=probe_col, columns=sample_col, values=value_col, aggfunc="first"
        ).dropna()
        probes = list(m.index)
        if len(probes) == 0:
            return pd.DataFrame(columns=[gene_col, probe_col, "cluster"])
        if len(probes) == 1:
            return pd.DataFrame({gene_col: [gene], probe_col: probes, "cluster": [0]})
        corr = np.corrcoef(m.to_numpy(dtype=float))
        corr = np.nan_to_num(corr, nan=0.0)
        labels = _complete_linkage_cut(1.0 - corr, cut_height)
        return pd.DataFrame({gene_col: gene, probe_col: probes, "cluster": labels})

    schema = f"{gene_col} string, {probe_col} string, cluster long"
    return df.groupBy(gene_col).applyInPandas(one_gene, schema=schema)


def cluster_mean_profiles(
    df: DataFrame,
    clusters: DataFrame,
    gene_col: str,
    probe_col: str,
    sample_col: str,
    value_col: str,
) -> DataFrame:
    """A7 follow-up: average value per (gene, cluster, sample) — plain
    join + groupBy, the reference's colMeans over cluster members."""
    return (
        df.join(clusters, [gene_col, probe_col])
        .groupBy(gene_col, "cluster", sample_col)
        .agg(F.round(F.avg(value_col), 6).alias("mean_value"))
    )
