from __future__ import annotations

import numpy as np

from omics_data_integration_utilities_spark.analytics.combat import combat_adjust


def test_combat_removes_batch_shift(spark):
    """Two batches with a deliberate +5 location shift in batch b: after
    adjustment the batch means should nearly coincide."""
    rng = np.random.RandomState(5)
    rows = []
    for feat in ("f1", "f2"):
        base = 10.0 if feat == "f1" else 50.0
        for i in range(200):
            batch = "a" if i % 2 == 0 else "b"
            shift = 0.0 if batch == "a" else 5.0
            rows.append(
                (feat, f"s{i}", batch, float(base + shift + rng.normal(0, 1)))
            )
    df = spark.createDataFrame(rows, "feature string, sample string, batch string, v double")
    out = combat_adjust(df, "feature", "sample", "batch", "v").toPandas()
    for feat in ("f1", "f2"):
        sub = out[out.feature == feat]
        raw_gap = abs(
            sub[sub.batch == "a"].v.mean() - sub[sub.batch == "b"].v.mean()
        )
        adj_gap = abs(
            sub[sub.batch == "a"].adjusted.mean()
            - sub[sub.batch == "b"].adjusted.mean()
        )
        assert raw_gap > 4.0
        assert adj_gap < 0.5, f"{feat}: {adj_gap}"


def test_combat_deterministic(spark):
    rows = [
        ("f", f"s{i}", "a" if i % 2 else "b", float(i % 7)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "feature string, sample string, batch string, v double")
    a = sorted(map(tuple, combat_adjust(df, "feature", "sample", "batch", "v").collect()))
    b = sorted(map(tuple, combat_adjust(df, "feature", "sample", "batch", "v").collect()))
    assert a == b


def test_combat_mean_only_removes_batch_shift(spark):
    """A pure location shift between batches vanishes: per-feature batch
    means of the adjusted values agree across batches."""
    import numpy as np

    from omics_data_integration_utilities_spark.analytics.combat import (
        combat_mean_only,
    )

    rng = np.random.RandomState(7)
    rows = []
    for s in range(200):
        batch = "b1" if s % 2 == 0 else "b2"
        shift = 0.0 if batch == "b1" else 5.0
        rows.append(("f1", f"s{s}", batch, float(rng.normal(10.0, 1.0) + shift)))
    df = spark.createDataFrame(rows, "feature string, sample string, batch string, v double")
    out = combat_mean_only(df, "feature", "sample", "batch", "v").toPandas()
    merged = out.assign(batch=["b1" if int(s[1:]) % 2 == 0 else "b2" for s in out["sample"]])
    means = merged.groupby("batch")["adjusted"].mean()
    assert abs(means["b1"] - means["b2"]) < 1e-6
