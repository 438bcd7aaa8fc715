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
