from __future__ import annotations

from pyspark.sql import functions as F

from omics_data_integration_utilities_spark.operators.skew import (
    salted_group_count,
    salted_join,
)


def test_salted_join_equals_plain_join(spark):
    # hot key: 90% of left rows share key 1
    left = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(500)], "k long, payload long"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    plain = sorted(tuple(r) for r in left.join(right, ["k"]).collect())
    salted = sorted(tuple(r) for r in salted_join(left, right, ["k"], n_salts=4).collect())
    assert salted == plain


def test_salted_group_count(spark):
    df = spark.createDataFrame([(1,)] * 97 + [(2,)] * 3, "k long")
    got = {r["k"]: r["n"] for r in salted_group_count(df, ["k"], n_salts=4).collect()}
    assert got == {1: 97, 2: 3}


def _plain(left, right, how="inner"):
    return sorted(
        tuple(r) for r in left.join(right, ["k"], how).collect()
    )


def test_skew_aware_join_detects_and_routes(spark):
    """Auto-detection: the 90%-hot key routes through the salted path,
    the cold tail through the plain join; result == one plain join."""
    from omics_data_integration_utilities_spark.operators.skew import skew_aware_join

    left = spark.createDataFrame(
        [(1 if i % 10 else i % 7 + 10, i) for i in range(700)],
        "k long, payload long",
    ).repartition(6)
    right = spark.createDataFrame(
        [(k, f"v{k}") for k in list(range(1, 3)) + list(range(10, 17))],
        "k long, v string",
    )
    got = sorted(
        tuple(r)
        for r in skew_aware_join(left, right, ["k"], n_salts=4).collect()
    )
    assert got == _plain(left, right)


def test_skew_aware_join_explicit_hot_and_left_join_nulls(spark):
    """Explicit hot set (skip detection) + left join: unmatched and
    NULL-key rows carry through exactly like the plain left join."""
    from omics_data_integration_utilities_spark.operators.skew import skew_aware_join

    left = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (99, 30), (None, 40)],
        "k long, payload long",
    )
    right = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    got = sorted(
        repr((r["k"], r["payload"], r["v"]))
        for r in skew_aware_join(
            left, right, ["k"], hot_keys=[1], n_salts=3, how="left"
        ).collect()
    )
    want = sorted(
        repr((r["k"], r["payload"], r["v"]))
        for r in left.join(right, ["k"], "left").collect()
    )
    assert got == want


def test_skew_aware_join_no_hot_keys_is_plain(spark):
    """An un-skewed input (nothing above the threshold) degrades to the
    single plain join — no salting cost paid when none is needed."""
    from omics_data_integration_utilities_spark.operators.skew import skew_aware_join

    left = spark.createDataFrame(
        [(i % 50, i) for i in range(500)], "k long, payload long"
    )
    right = spark.createDataFrame(
        [(k, f"v{k}") for k in range(50)], "k long, v string"
    )
    got = sorted(
        tuple(r)
        for r in skew_aware_join(
            left, right, ["k"], hot_threshold=0.5
        ).collect()
    )
    assert got == _plain(left, right)


def test_skew_aware_join_sampled_detection(spark):
    """Sampled detection still finds a 90%-hot key and the result stays
    routing-invariant."""
    from omics_data_integration_utilities_spark.operators.skew import skew_aware_join

    left = spark.createDataFrame(
        [(7 if i % 10 else 2, i) for i in range(2000)], "k long, payload long"
    ).repartition(4)
    right = spark.createDataFrame([(7, "hot"), (2, "cold")], "k long, v string")
    got = sorted(
        tuple(r)
        for r in skew_aware_join(
            left, right, ["k"], detect_sample_fraction=0.2, n_salts=4
        ).collect()
    )
    assert got == _plain(left, right)


def test_salted_join_rejects_outer_forms(spark):
    """A right/full join through the REPLICATED side would emit each
    unmatched right row once per salt — the operator must refuse, not
    silently duplicate."""
    import pytest

    from omics_data_integration_utilities_spark.operators.skew import (
        skew_aware_join,
    )

    left = spark.createDataFrame([(1, 1)], "k long, payload long")
    right = spark.createDataFrame([(1, "a"), (9, "z")], "k long, v string")
    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(left, right, ["k"], how=bad)
        with pytest.raises(ValueError, match="inner/left"):
            skew_aware_join(left, right, ["k"], hot_keys=[1], how=bad)
        # rejection must NOT be data-dependent: an empty hot set (the
        # plain-join fast path) still refuses unsupported joins
        with pytest.raises(ValueError, match="inner/left"):
            skew_aware_join(left, right, ["k"], hot_keys=[], how=bad)


def test_skew_aware_join_null_in_explicit_hot_set(spark):
    """A NULL inside an externally supplied hot set must not poison the
    routing filters (isin with NULL makes both branches' predicates
    NULL for non-hot rows — they'd silently vanish); NULL keys never
    join anyway, so the NULL entry is dropped and the result equals the
    plain join."""
    from omics_data_integration_utilities_spark.operators.skew import skew_aware_join

    left = spark.createDataFrame(
        [(5, 1), (5, 2), (7, 3), (None, 4)], "k long, payload long"
    )
    right = spark.createDataFrame([(5, "a"), (7, "b")], "k long, v string")
    got = sorted(
        repr((r["k"], r["payload"], r["v"]))
        for r in skew_aware_join(
            left, right, ["k"], hot_keys=[None, 5], n_salts=3, how="left"
        ).collect()
    )
    want = sorted(
        repr((r["k"], r["payload"], r["v"]))
        for r in left.join(right, ["k"], "left").collect()
    )
    assert got == want
