"""Tests for the applyInPandas kernels (K10-K13) and sources (S6)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from omics_data_integration_utilities_spark.analytics.clustering import (
    _complete_linkage_cut,
    cluster_mean_profiles,
    cluster_probes,
)
from omics_data_integration_utilities_spark.analytics.kernels import (
    knn_impute,
    partial_correlations,
    poisson_glm_offset,
)
from omics_data_integration_utilities_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    fake_decoder,
)
from omics_data_integration_utilities_spark.sources.rest import fetch_tsv_source


def test_complete_linkage_two_blocks():
    # two tight blocks far apart → exactly two clusters at h=0.5
    d = np.array(
        [
            [0.0, 0.1, 0.9, 0.9],
            [0.1, 0.0, 0.9, 0.9],
            [0.9, 0.9, 0.0, 0.1],
            [0.9, 0.9, 0.1, 0.0],
        ]
    )
    labels = _complete_linkage_cut(d, 0.5)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_cluster_probes_and_profiles(spark):
    rows = []
    for s in range(6):
        base = float(s)
        rows += [
            ("g1", "pA", f"s{s}", base),
            ("g1", "pB", f"s{s}", base * 1.01 + 0.1),  # correlated with pA
            ("g1", "pC", f"s{s}", -base),  # anti-correlated
        ]
    df = spark.createDataFrame(rows, "gene string, probe string, sample string, beta double")
    cl = cluster_probes(df, "gene", "probe", "sample", "beta", cut_height=0.6)
    got = {r["probe"]: r["cluster"] for r in cl.collect()}
    assert got["pA"] == got["pB"]
    assert got["pC"] != got["pA"]
    prof = cluster_mean_profiles(df, cl, "gene", "probe", "sample", "beta")
    assert prof.count() == 2 * 6  # two clusters × six samples


def test_knn_impute_fills_missing(spark):
    rows = [
        ("b", "r1", "c1", 1.0), ("b", "r1", "c2", 2.0),
        ("b", "r2", "c1", 1.1), ("b", "r2", "c2", None),
        ("b", "r3", "c1", 0.9), ("b", "r3", "c2", 2.2),
    ]
    df = spark.createDataFrame(rows, "block string, row string, col string, v double")
    out = {(r["row"], r["col"]): (r["v"], r["imputed"]) for r in
           knn_impute(df, "block", "row", "col", "v", k=2).collect()}
    v, imputed = out[("r2", "c2")]
    assert imputed is True
    assert 1.9 < v < 2.3  # mean of neighbours' c2 values
    assert out[("r1", "c1")] == (1.0, False)


def test_partial_corr_chain(spark):
    # chain x → y → z: pcor(x,z | y) should be near 0, pcor(x,y) strong
    rng = np.random.RandomState(3)
    x = rng.normal(size=200)
    y = x + rng.normal(scale=0.3, size=200)
    z = y + rng.normal(scale=0.3, size=200)
    rows = []
    for i in range(200):
        rows += [("b", f"s{i}", "x", float(x[i])), ("b", f"s{i}", "y", float(y[i])),
                 ("b", f"s{i}", "z", float(z[i]))]
    df = spark.createDataFrame(rows, "block string, sample string, var string, v double")
    out = {(r["var_a"], r["var_b"]): r["pcor"] for r in
           partial_correlations(df, "block", "var", "sample", "v", shrinkage=0.01).collect()}
    assert out[("x", "y")] > 0.5
    assert abs(out[("x", "z")]) < 0.2


def test_poisson_glm_recovers_rate_ratio(spark):
    # group b has 3× the rate of group a at equal exposure
    rows = [("blk", "a", 100.0, 1000.0), ("blk", "b", 300.0, 1000.0),
            ("blk", "a", 110.0, 1100.0), ("blk", "b", 320.0, 1050.0)]
    df = spark.createDataFrame(rows, "block string, grp string, n double, exposure double")
    out = {r["coef"]: r for r in
           poisson_glm_offset(df, "block", "n", "grp", "exposure").collect()}
    est = out["grp=b"]["estimate"]
    assert abs(est - np.log(3)) < 0.1
    assert out["grp=b"]["z"] > 5


def test_multimodal_stub_raises_without_decoder(spark):
    import pytest

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    media = documents_as_media(docs)
    with pytest.raises(NotImplementedError):
        extract_features(media, decoder=None)


def test_multimodal_fake_decoder_deterministic(spark):
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    media = documents_as_media(docs)
    a = extract_features(media, decoder=fake_decoder).collect()[0]
    b = extract_features(media, decoder=fake_decoder).collect()[0]
    assert a == b
    assert a["n_bytes"] == 11
    assert len(a["feature"]) == 4


def test_rest_source_with_fake_transport(spark):
    text = "#header\nP12345\tPF00001\nP67890\tPF00002\n"
    df = fetch_tsv_source(
        spark, "https://example.test/list", "uniprot string, pfam string",
        fetch=lambda url: text,
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("P12345", "PF00001"), ("P67890", "PF00002")]
