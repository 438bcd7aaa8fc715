"""Similarity-search tests: GEMM path ≡ expression path, IVF recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from omics_data_integration_utilities_spark.operators import similarity as S


def _emb(spark, sf="0.001"):
    return spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")


def test_gemm_topk_equals_expression_topk(spark):
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") % 10 == 0)
    a = sorted(
        map(tuple, S.brute_force_topk(emb, queries, k=5).collect())
    )
    b = sorted(
        map(tuple, S.brute_force_topk_np(emb, queries, k=5).collect())
    )
    assert a == b


def test_gemm_neardup_equals_expression(spark):
    emb = _emb(spark)
    a = sorted(map(tuple, S.cosine_neardup_pairs(emb, min_cosine=0.3).collect()))
    b = sorted(map(tuple, S.cosine_neardup_np(emb, min_cosine=0.3).collect()))
    assert a == b


def test_ivf_recall_against_brute_force(spark):
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["cand_id"])
        for r in S.brute_force_topk_np(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in S.ivf_topk(emb, queries, k=5, n_lists=8, n_probes=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"
    # full probing degenerates to exact
    full = {
        (r["query_id"], r["cand_id"])
        for r in S.ivf_topk(emb, queries, k=5, n_lists=8, n_probes=8).collect()
    }
    assert full == exact


def test_lsh_bucketed_neardup_subset_of_exact(spark):
    emb = _emb(spark)
    exact = {
        (r["id_a"], r["id_b"]) for r in S.cosine_neardup_np(emb, min_cosine=0.3).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in S.lsh_bucketed_neardup(emb, dim=64, min_cosine=0.3, n_planes=4).collect()
    }
    assert approx.issubset(exact)
