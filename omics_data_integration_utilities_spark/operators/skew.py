"""Skew-mitigation utilities (SURVEY §4: band-join skew — masses cluster
around common compound weights; same story for hot document shingles and
hot join keys at 100 TB).

Two tools beyond AQE's runtime skew-join splitting:

- :func:`salted_join` — explicit key salting for shuffle joins where one
  side has hot keys: the hot side gets a random-ish (deterministic,
  hash-derived) salt in [0, n), the other side explodes over all n salts.
  Use when AQE can't help (e.g. aggregations feeding the join, or
  deliberately partitioned state).
- :func:`salted_group_count` — two-phase aggregation for hot group keys:
  partial count per (key, salt) then final sum per key.  Spark's hash
  aggregate already does map-side partials; this pattern matters for
  aggregates that DON'T partial well (collect_list/exact distinct).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: list[str], n: int) -> Column:
    # deterministic salt from the row content: reruns place rows in the
    # same salt bucket (xxhash64 is a stable Spark builtin)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side replicated
    over every salt value.  Result equals ``skewed.join(other, on, how)``
    for inner/left joins; the ``other`` side is typically the smaller one
    (its rows are duplicated ``n_salts``×)."""
    salt_source = salt_source or [c for c in skewed.columns if c not in on]
    if not salt_source:
        salt_source = on
    s = skewed.withColumn("__salt", _salt_col(salt_source, n_salts))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return s.join(o, on + ["__salt"], how).drop("__salt")


def salted_group_count(
    df: DataFrame, key_cols: list[str], n_salts: int = 8, count_col: str = "n"
) -> DataFrame:
    """Two-phase count: (key, salt) partials → key totals."""
    salted = df.withColumn("__salt", _salt_col(df.columns, n_salts))
    partial = salted.groupBy(*key_cols, "__salt").agg(F.count(F.lit(1)).alias("__pc"))
    return partial.groupBy(*key_cols).agg(F.sum("__pc").alias(count_col))
