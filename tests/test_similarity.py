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


def test_semantic_dedup_drops_near_duplicates_keeps_lowest_id(spark):
    """Three exact/near copies of one direction collapse to the lowest
    id; an orthogonal vector survives; output covers every input id."""
    import numpy as np

    from omics_data_integration_utilities_spark.operators.similarity import (
        semantic_dedup,
    )

    base = np.zeros(8); base[0] = 1.0
    near = np.zeros(8); near[0] = 1.0; near[1] = 0.05   # cos ~0.9988
    ortho = np.zeros(8); ortho[3] = 1.0
    rows = [
        (1, [float(x) for x in base]),
        (2, [float(x) for x in near]),
        (3, [float(x) for x in base]),
        (4, [float(x) for x in ortho]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, "embedding", "vec_id", threshold=0.95, n_lists=2
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["keep"] is True
    assert out[4]["keep"] is True
    # 2 and 3 land in 1's cluster (same direction) and are >= threshold
    assert out[2]["keep"] is False and out[2]["max_sim_to_kept"] >= 0.95
    assert out[3]["keep"] is False and out[3]["max_sim_to_kept"] == 1.0


def test_semantic_dedup_partitioning_invariant(spark):
    """Same keep-set whatever the input partitioning (the greedy order is
    id-sorted inside each cluster, not arrival-sorted)."""
    import random

    from omics_data_integration_utilities_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [0.0] * 8
        v[i % 4] = 1.0
        v[(i + 1) % 8] = rng.random() * 0.01  # tiny jitter: near-dup groups of 10
        rows.append((i, v))
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df2 = df1.repartition(13)
    kept1 = {
        r["vec_id"]
        for r in semantic_dedup(df1, threshold=0.99, n_lists=4).collect()
        if r["keep"]
    }
    kept2 = {
        r["vec_id"]
        for r in semantic_dedup(df2, threshold=0.99, n_lists=4).collect()
        if r["keep"]
    }
    assert kept1 == kept2
    assert 0 < len(kept1) < 40


def test_semantic_dedup_threshold_one_keeps_only_exact(spark):
    """threshold=1.0-epsilon only collapses exact duplicates."""
    from omics_data_integration_utilities_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.98, 0.2, 0.0, 0.0]),  # close but not identical
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        df, threshold=0.9999, n_lists=1).collect()}
    assert out == {1: True, 2: False, 3: True}


def test_lloyd_refine_distributed_matches_numpy_replica(spark):
    """The opt-in full-corpus Lloyd refinement must reach the same
    assignments as a numpy full-data Lloyd from the same initial
    centroids on a well-separated planted clustering (ulp-order noise in
    the distributed float sums cannot flip a separated argmin), and the
    refined centroids must land on the true cluster means."""
    import numpy as np

    centers = np.array(
        [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0], [7.0, 7.0, 7.0]]
    )
    rows = []
    for i in range(200):
        # cluster pattern 0,0,1,1,2,2,3,3,... so the fallback training
        # prefix (first ids) seeds every planted cluster — Lloyd with one
        # seed per cluster converges to the planted partition instead of
        # a split/merged local optimum
        c = (i // 2) % 4
        # deterministic integer jitter in [-0.4, 0.4]
        jit = np.array([((i * 7 + d * 13) % 9 - 4) / 10.0 for d in range(3)])
        rows.append((i, c, (centers[c] + jit).tolist()))
    df = spark.createDataFrame(
        [(i, e) for i, _, e in rows], "vec_id long, embedding array<double>"
    )

    # deliberately bad init: all four seeds near cluster 0's corner
    init = centers[0][None, :] + np.array(
        [[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, 0.5, 0.0], [0.0, 0.0, 0.5]]
    )
    refined = S.lloyd_refine_distributed(df, init, iterations=5)

    # numpy replica: same init, same rule (empty list keeps centroid)
    m = np.array([e for _, _, e in rows])
    cents = init.copy()
    for _ in range(5):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        asn = d2.argmin(axis=1)
        for c in range(4):
            if (asn == c).any():
                cents[c] = m[asn == c].mean(axis=0)
    assert np.allclose(refined, cents, atol=1e-9)

    # end-to-end through ivf_assign: refined assignment must split the
    # planted clusters exactly (4 lists, one per cluster)
    assigned, _ = S.ivf_assign(
        df, n_lists=4, max_train_rows=8, full_refine_iterations=5
    )
    got = {r["vec_id"]: r["list_id"] for r in assigned.collect()}
    by_cluster = {}
    for i, c, _ in rows:
        by_cluster.setdefault(c, set()).add(got[i])
    assert all(len(v) == 1 for v in by_cluster.values())
    assert len({next(iter(v)) for v in by_cluster.values()}) == 4


def test_diversity_sample_planted_geometry_picks_extremes(spark):
    """Single-list greedy on a planted line: seed = lowest id, first
    pick = farthest point, later picks fill the largest gaps; min_dist
    per cluster is non-increasing (the defining greedy invariant)."""
    import math

    from omics_data_integration_utilities_spark.operators.similarity import (
        diversity_sample,
    )

    # unit vectors fanned over 90 degrees: ids 0..9 at angles 0..90
    rows = [
        (i, [math.cos(math.radians(9.0 * i)), math.sin(math.radians(9.0 * i))])
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r["pick_rank"], r["vec_id"], r["min_dist"])
        for r in diversity_sample(df, n=3, n_lists=1).collect()
    )
    # seed id 0 (angle 0); farthest = id 9 (angle 81); then the midpoint
    assert [(rk, vid) for rk, vid, _ in got] == [(0, 0), (1, 9), (2, 4)]
    dists = [d for _, _, d in got if d is not None]
    assert dists == sorted(dists, reverse=True)


def test_diversity_sample_quotas_and_partition_invariance(spark):
    """Quotas apportion n over clusters by size (sum == n when no cluster
    caps), the result is invariant under input repartitioning, and a
    cluster smaller than its quota yields all its rows."""
    import random

    from omics_data_integration_utilities_spark.operators.similarity import (
        diversity_sample,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = diversity_sample(df, n=40, n_lists=4, sample_fraction=1.0)
    picks = {(r["list_id"], r["vec_id"], r["pick_rank"]) for r in out.collect()}
    assert len(picks) == 40
    again = {
        (r["list_id"], r["vec_id"], r["pick_rank"])
        for r in diversity_sample(
            df.repartition(13), n=40, n_lists=4, sample_fraction=1.0
        ).collect()
    }
    assert picks == again
    # quota larger than the corpus: every row selected, no crash
    tiny = spark.createDataFrame(rows[:5], "vec_id long, embedding array<double>")
    assert diversity_sample(tiny, n=50, n_lists=1).count() == 5


def test_ann_index_probe_matches_ivf_topk_and_prunes_buckets(spark, tmp_path):
    """The persisted ANN index lifecycle: build -> probe equals the
    in-memory ivf_topk at identical settings (exact AND approximate),
    attach re-registers with the stored bucket spec and returns the same
    answers, and the probe scan reads only the probed buckets
    (SelectedBucketsCount in the plan)."""
    from pyspark.sql import functions as F

    from omics_data_integration_utilities_spark.operators.similarity import (
        ann_index_topk,
        attach_ann_index,
        build_ann_index,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") % 20 == 0)
    idx = build_ann_index(
        emb, "embedding", "vec_id", "t_ann_idx", str(tmp_path / "idx"), n_lists=8
    )
    try:
        canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
        for n_probes in (8, 3):
            got = ann_index_topk(spark, q, idx, k=4, n_probes=n_probes)
            want = ivf_topk(
                emb, q, "embedding", "vec_id", k=4, n_lists=8, n_probes=n_probes
            )
            assert canon(got) == canon(want), f"n_probes={n_probes}"
        att = attach_ann_index(spark, "t_ann_idx", str(tmp_path / "idx"))
        assert att.n_lists == 8 and att.n_buckets == 8
        assert canon(ann_index_topk(spark, q, att, k=4, n_probes=3)) == canon(
            ann_index_topk(spark, q, idx, k=4, n_probes=3)
        )
        plan = (
            ann_index_topk(spark, q, idx, 4, 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount:" in plan
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ann_idx_lists")


def test_attach_ann_index_refuses_wrong_name_and_foreign_table(spark, tmp_path):
    from pyspark.sql import functions as F
    import pytest

    from omics_data_integration_utilities_spark.operators.similarity import (
        attach_ann_index,
        build_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    build_ann_index(
        emb, "embedding", "vec_id", "t_ann_guard", str(tmp_path / "g"), n_lists=4
    )
    try:
        with pytest.raises(ValueError, match="names index"):
            attach_ann_index(spark, "other_name", str(tmp_path / "g"))
        # same-name table registered at a DIFFERENT location: the build
        # MUST refuse via the shared _write_index_table ownership guard
        # (proceeding would DROP an unrelated managed table, deleting
        # its data) — review regression: the refusal must be asserted
        # to FIRE, not merely tolerated
        spark.sql("DROP TABLE IF EXISTS t_ann_guard2_lists")
        emb.limit(1).write.saveAsTable("t_ann_guard2_lists")
        with pytest.raises(ValueError, match="t_ann_guard2_lists"):
            build_ann_index(
                emb.withColumn("vec_id", F.col("vec_id") + 1),
                "embedding", "vec_id", "t_ann_guard2", str(tmp_path / "g2"),
                n_lists=4,
            )
        # and the unrelated table's data survived the refusal
        assert spark.table("t_ann_guard2_lists").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ann_guard_lists")
        spark.sql("DROP TABLE IF EXISTS t_ann_guard2_lists")


def test_extend_ann_index_blue_green(spark, tmp_path):
    """extend_ann_index: the next generation holds old + batch vectors
    assigned to the SAME centroids (one generation, one quantizer) —
    probing it equals probing a manually-unioned assignment under the
    original centroids; the old generation stays probe-able until
    dropped; shared name/path refused."""
    import pytest
    from pyspark.sql import functions as F

    from omics_data_integration_utilities_spark.operators.similarity import (
        ann_index_topk,
        build_ann_index,
        extend_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0)
    q = emb.where(F.col("vec_id") % 17 == 0)
    idx = build_ann_index(
        old, "embedding", "vec_id", "t_ann_g1", str(tmp_path / "g1"), n_lists=8
    )
    try:
        with pytest.raises(ValueError, match="different"):
            extend_ann_index(idx, batch, "t_ann_g1", str(tmp_path / "gX"))
        idx2 = extend_ann_index(idx, batch, "t_ann_g2", str(tmp_path / "g2"))
        import numpy as np

        assert np.allclose(idx2.centroids, idx.centroids)
        got = sorted(
            tuple(r)
            for r in ann_index_topk(spark, q, idx2, k=3, n_probes=8).collect()
        )
        # comparator: full-corpus index built around the SAME quantizer
        # — assign everything to idx's centroids via a fresh extension
        # of an empty base is equivalent to union(old lists, batch
        # assigned); easiest exact comparator is the extended table
        # itself vs per-id membership + brute cosine over the union
        from omics_data_integration_utilities_spark.operators.similarity import (
            _probe_scored_topk,
        )

        union_assigned = spark.table(idx2.lists_table)
        want = sorted(
            tuple(r)
            for r in _probe_scored_topk(
                union_assigned, q, idx.centroids, "embedding", "vec_id", 3, 8, 6
            ).collect()
        )
        assert got == want
        assert union_assigned.count() == emb.count()
        # old generation still probes
        assert ann_index_topk(spark, q, idx, k=3, n_probes=2).count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ann_g1_lists")
        spark.sql("DROP TABLE IF EXISTS t_ann_g2_lists")


def test_ann_index_cross_session_types_and_guards(spark, tmp_path):
    """Review regressions (r13): (1) attach must declare the PHYSICAL
    column types from metadata — a float32 embedding corpus attached
    with a hardcoded ARRAY<DOUBLE> DDL breaks the first cross-session
    probe scan; (2) extend's clobber guard must normalize paths (a
    trailing-slash spelling of the same dir is the same dir); (3) an
    empty query batch yields an empty result, not a numpy crash."""
    import pytest
    from pyspark.sql import functions as F

    from omics_data_integration_utilities_spark.operators.similarity import (
        ann_index_topk,
        attach_ann_index,
        build_ann_index,
        extend_ann_index,
    )

    # embeddings.parquet stores array<float> — the cross-session trap
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert dict(emb.dtypes)["embedding"] == "array<float>"
    idx = build_ann_index(
        emb, "embedding", "vec_id", "t_ann_types", str(tmp_path / "t"), n_lists=4
    )
    try:
        assert idx.vec_type == "array<float>"
        # simulate a fresh session: drop the catalog entry, re-attach
        spark.sql("DROP TABLE t_ann_types_lists")
        att = attach_ann_index(spark, "t_ann_types", str(tmp_path / "t"))
        assert att.vec_type == "array<float>"
        q = emb.where(F.col("vec_id") % 20 == 0)
        assert ann_index_topk(spark, q, att, k=3, n_probes=4).count() > 0

        # (2) trailing-slash spelling of the same path is refused
        with pytest.raises(ValueError, match="different"):
            extend_ann_index(
                att, emb.limit(1), "t_ann_types_g2", str(tmp_path / "t") + "/"
            )

        # (3) empty query batch -> empty relation, correct schema
        empty_q = emb.where(F.lit(False))
        out = ann_index_topk(spark, empty_q, att, k=3, n_probes=4)
        assert out.count() == 0
        assert out.columns == ["query_id", "cand_id", "score", "rank"]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ann_types_lists")


def test_profile_sketches_merge_accepts_legacy_schema(spark):
    """Review regression (r13): summary rows persisted WITHOUT the
    numeric-merge columns (pre-fix history) must still merge under the
    lexicographic fallback instead of failing analysis."""
    from omics_data_integration_utilities_spark.operators.profile import (
        estimate_profile,
        merge_profile_sketches,
        profile_sketches,
    )

    df = spark.range(1, 4).selectExpr("id as k")
    legacy = profile_sketches(df).drop("col_kind", "min_num", "max_num")
    out = estimate_profile(merge_profile_sketches(legacy)).collect()
    assert len(out) == 1
    # single slice: lexicographic fallback is still exact here
    assert out[0]["min_value"] == "1" and out[0]["max_value"] == "3"


def test_sim_index_probe_matches_registered_form(spark):
    """The bench-only steady-state probe must return exactly what the
    registered build+probe form returns (same centroid config, exact
    mode) — the dedup_index_probe equality contract."""
    from omics_data_integration_utilities_spark.plans.registry_docs import (
        q_sim_index_probe,
        q_sim_index_topk,
    )

    sf = "/root/testdata/sf0.001"
    a = sorted(tuple(r) for r in q_sim_index_probe(spark, sf).collect())
    b = sorted(tuple(r) for r in q_sim_index_topk(spark, sf).collect())
    assert a == b and len(a) > 0
    # second invocation reuses the memoized index (steady state) and
    # still agrees
    a2 = sorted(tuple(r) for r in q_sim_index_probe(spark, sf).collect())
    assert a2 == a


def test_shared_ann_index_reused_and_result_identical(spark):
    """r14 verdict item 4: sim_index_topk builds the one live index
    generation and sim_index_recall / the bench probe REUSE it (no
    second k-means build in a session), and a reused index certifies
    bit-identically to a standalone-built one (the build is
    deterministic)."""
    from omics_data_integration_utilities_spark.plans import registry_docs as rd

    sf = "/root/testdata/sf0.001"
    rd.q_sim_index_topk(spark, sf).collect()
    key = f"{__import__('os').getpid()}:{sf}"
    shared = rd._ANN_IDX_SHARED[key]
    reused = sorted(tuple(r) for r in rd.q_sim_index_recall(spark, sf).collect())
    # recall must not have replaced the published generation
    assert rd._ANN_IDX_SHARED[key] is shared
    probe = sorted(tuple(r) for r in rd.q_sim_index_probe(spark, sf).collect())
    assert rd._ANN_IDX_SHARED[key] is shared and len(probe) > 0
    # standalone (fresh-build) recall agrees bit-for-bit
    rd.cleanup_registry_state()
    fresh = sorted(tuple(r) for r in rd.q_sim_index_recall(spark, sf).collect())
    assert fresh == reused and len(fresh) > 0


def test_gemm_build_side_guard_fails_fast_over_cap(spark):
    """r13 verdict item 4: every GEMM collect path sizes its build side
    by measurement (the limit IS the measurement — one job) and fails
    fast naming the bucketed alternative instead of OOMing the driver."""
    import pytest

    emb = _emb(spark)
    n = emb.count()
    with pytest.raises(ValueError, match="lsh_bucketed_neardup"):
        S._ids_matrix(emb, "vec_id", "embedding", max_rows=n - 1)
    # boundary: exactly max_rows passes with the full side collected
    ids, m, norms = S._ids_matrix(emb, "vec_id", "embedding", max_rows=n)
    assert len(ids) == n and m.shape[0] == n and len(norms) == n


def test_probe_empty_batch_schema_matches_nonempty_for_int_ids(spark):
    """ADVICE r14: the empty-query fast path must emit the ACTUAL
    physical id dtype (an int id stays int) — a quiet serving
    micro-batch must never append a schema-conflicting bigint parquet
    file into a results directory of int-id rows."""
    emb = _emb(spark).select(
        F.col("vec_id").cast("int").alias("vec_id"), "embedding"
    )
    queries = emb.where(F.col("vec_id") % 20 == 0)
    nonempty = S.ivf_topk(emb, queries, k=3, n_lists=4, n_probes=2)
    empty = S.ivf_topk(emb, emb.where(F.lit(False)), k=3, n_lists=4, n_probes=2)
    assert [f.dataType for f in empty.schema.fields] == [
        f.dataType for f in nonempty.schema.fields
    ]
    assert dict(empty.dtypes)["query_id"] == "int"
    assert dict(empty.dtypes)["cand_id"] == "int"
    assert empty.count() == 0


def test_ann_recall_certificate_monotone_and_exact_row(spark, tmp_path):
    """r13 verdict item 3: the recall@k certificate.  Recall is monotone
    nondecreasing in n_probes (a displaced exact member can only be
    displaced by another exact member under the shared total order), the
    full-probe self-check row is exactly 1.0, and min_recall never
    exceeds the micro-averaged recall."""
    import shutil
    import tempfile

    emb = _emb(spark)
    path = tempfile.mkdtemp(prefix="t_ann_recall_")
    S.build_ann_index(emb, "embedding", "vec_id", "t_ann_recall", path, n_lists=8)
    idx = S.attach_ann_index(spark, "t_ann_recall", path)
    try:
        q = emb.where(F.col("vec_id") % 10 == 0)
        rows = {
            r["n_probes"]: r.asDict()
            for r in S.ann_recall_certificate(
                spark, q, idx, k=4, probe_settings=(1, 2, 4)
            ).collect()
        }
        assert sorted(rows) == [1, 2, 4, 8]  # full-probe row auto-appended
        rec = [rows[p]["recall"] for p in sorted(rows)]
        assert rec == sorted(rec), rec
        assert rows[8]["recall"] == 1.0 and rows[8]["min_recall"] == 1.0
        assert rows[8]["n_hit"] == rows[8]["n_exact"]
        for p, r in rows.items():
            assert 0.0 <= r["min_recall"] <= r["recall"] <= 1.0, (p, r)
            assert r["n_queries"] == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ann_recall_lists")
        shutil.rmtree(path, ignore_errors=True)


def test_recall_certificate_single_pass_matches_per_setting_probes(spark):
    """r16 optimization: the certificate now derives every approximate
    setting from ONE candidate pass at the largest setting (filter on
    __probe_rank) instead of re-probing per setting.  Equivalence
    contract: for every p, the filtered-candidates top-k must equal a
    fresh ann_index_topk at n_probes=p row for row — the nearest-list
    order is one argsort, so top-p lists are a prefix of top-max lists."""
    import shutil
    import tempfile

    emb = _emb(spark)
    path = tempfile.mkdtemp(prefix="t_ann_recall_sp_")
    S.build_ann_index(
        emb, "embedding", "vec_id", "t_ann_recall_sp", path, n_lists=8
    )
    idx = S.attach_ann_index(spark, "t_ann_recall_sp", path)
    try:
        q = emb.where(F.col("vec_id") % 10 == 0)
        cands = S._probe_scored_topk(
            spark.table(idx.lists_table), q, idx.centroids,
            idx.vec_col, idx.id_col, 4, 4, 6,
            respread=True, return_candidates=True,
        ).localCheckpoint()
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("cand_id").asc()
        )
        for p in (1, 2, 4):
            via_filter = sorted(
                map(
                    tuple,
                    cands.where(F.col("__probe_rank") < p)
                    .withColumn("rank", F.row_number().over(w))
                    .where(F.col("rank") <= 4)
                    .select("query_id", "cand_id", "score", "rank")
                    .collect(),
                )
            )
            via_probe = sorted(
                map(
                    tuple,
                    S.ann_index_topk(spark, q, idx, k=4, n_probes=p)
                    .select("query_id", "cand_id", "score", "rank")
                    .collect(),
                )
            )
            assert via_filter == via_probe, f"n_probes={p} diverged"
        # certificate-level equivalence: the single-pass certificate's
        # per-setting hit counts must equal those computed from fresh
        # per-setting probes against the same exact top-k
        exact = {
            (r["query_id"], r["cand_id"])
            for r in S.ann_index_topk(
                spark, q, idx, k=4, n_probes=idx.n_lists
            ).collect()
        }
        cert = {
            r["n_probes"]: r.asDict()
            for r in S.ann_recall_certificate(
                spark, q, idx, k=4, probe_settings=(1, 2, 4)
            ).collect()
        }
        for p in (1, 2, 4):
            probe_pairs = {
                (r["query_id"], r["cand_id"])
                for r in S.ann_index_topk(spark, q, idx, k=4, n_probes=p).collect()
            }
            assert cert[p]["n_hit"] == len(exact & probe_pairs), p
            assert cert[p]["n_exact"] == len(exact), p
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ann_recall_sp_lists")
        shutil.rmtree(path, ignore_errors=True)


def test_extend_ann_index_replace_ids_merge_semantics(spark, tmp_path):
    """extend_ann_index(replace_ids=True): an updated vector REPLACES
    its old row (one row per id, new embedding wins, re-assigned by the
    shared quantizer); the default append form would duplicate it."""
    import shutil
    import tempfile

    emb = _emb(spark)
    base = tempfile.mkdtemp(prefix="t_ann_replace_")
    g2 = tempfile.mkdtemp(prefix="t_ann_replace_g2_")
    g3 = tempfile.mkdtemp(prefix="t_ann_replace_g3_")
    idx = S.build_ann_index(
        emb, "embedding", "vec_id", "t_ann_rep", base, n_lists=4
    )
    try:
        # an EXISTING id with a changed vector
        upd = emb.where(F.col("vec_id") == 7).select(
            "vec_id", F.transform("embedding", lambda x: x * 2 + 1).alias("embedding")
        )
        merged = S.extend_ann_index(idx, upd, "t_ann_rep_g2", g2, replace_ids=True)
        lists = spark.table(merged.lists_table)
        assert lists.where(F.col("vec_id") == 7).count() == 1
        assert lists.count() == emb.count()
        # default append form duplicates — the documented hazard
        appended = S.extend_ann_index(idx, upd, "t_ann_rep_g3", g3)
        assert (
            spark.table(appended.lists_table).where(F.col("vec_id") == 7).count()
            == 2
        )
    finally:
        for t in ("t_ann_rep_lists", "t_ann_rep_g2_lists", "t_ann_rep_g3_lists"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        for d in (base, g2, g3):
            shutil.rmtree(d, ignore_errors=True)
