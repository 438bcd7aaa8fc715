"""Oracle parity for every registered query — emulates the driver's t2
check (sorted columns + canonicalized values, multiset compare) at
sf0.001 (fast) and spot-checks at sf0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from omics_data_integration_utilities_spark.plans.golden_oracles import GOLDEN_ORACLES
from .conftest import SF_CORRECTNESS, SF_SMOKE, compare_query_to_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
# golden VALUES oracles pin sf0.01 outputs (the driver's only oracle
# scale) — at sf0.001 they cannot match, so the smoke tier checks those
# queries rows-only and tests/test_golden_oracles.py + the slow tier
# cover the sf0.01 value compare
WITH_ORACLE = sorted(set(ORACLES) - set(GOLDEN_ORACLES))
WITH_ORACLE_SF001 = sorted(ORACLES)
NO_ORACLE = sorted(set(QUERIES) - set(ORACLES) | set(GOLDEN_ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity_smoke(spark, duck, name):
    n = compare_query_to_oracle(
        spark, duck, name, QUERIES[name], ORACLES[name], SF_SMOKE
    )
    assert n >= 0


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_smoke(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.slow
@pytest.mark.parametrize("name", WITH_ORACLE_SF001)
def test_oracle_parity_sf001(spark, duck, name):
    compare_query_to_oracle(spark, duck, name, QUERIES[name], ORACLES[name], SF_CORRECTNESS)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_nonempty_at_sf001(spark, name):
    """Vacuous-pass guard: an empty result hash-matches an empty oracle,
    so every registered query must produce rows at the correctness scale."""
    assert QUERIES[name](spark, SF_CORRECTNESS).count() > 0, f"{name} is empty at sf0.01"
