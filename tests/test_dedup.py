

def test_hot_band_buckets_reports_capped_lsh_buckets(spark):
    """A corpus of identical docs lands every doc in the same band buckets;
    with max_posting below the corpus size the audit must surface them and
    lsh_candidate_pairs must drop them."""
    from omics_data_integration_utilities_spark.operators.dedup import (
        hot_band_buckets,
        lsh_candidate_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(12)],
        "doc_id long, text string",
    )
    hot = hot_band_buckets(docs, "text", "doc_id", max_posting=8).collect()
    assert len(hot) > 0 and all(r["n_docs"] == 12 for r in hot)
    assert lsh_candidate_pairs(docs, "text", "doc_id", max_posting=8).count() == 0
    # with a cap above the corpus the pairs reappear
    assert lsh_candidate_pairs(docs, "text", "doc_id", max_posting=20).count() == 66
