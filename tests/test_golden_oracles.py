"""The golden VALUES oracles must match the live kernel outputs at sf0.01
under the driver's compare (sorted columns, round-6 floats, multiset rows).

This is the regression lock for the five seeded iterative kernels that
have no SQL-expressible oracle; their *semantics* are verified by the
numpy-replica tests elsewhere — here we prove the pinned literals still
reproduce, so a kernel regression flips the driver's hash check red.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from omics_data_integration_utilities_spark.plans.golden_oracles import GOLDEN_ORACLES

from .conftest import SF_CORRECTNESS

pytestmark = pytest.mark.slow


def _canon_rows(cols, rows):
    out = []
    for r in rows:
        out.append(
            sorted(
                (c, round(v, 6) if isinstance(v, float) else v)
                for c, v in zip(cols, r)
            )
        )
    return sorted(map(repr, out))


@pytest.mark.parametrize("name", sorted(GOLDEN_ORACLES))
def test_golden_oracle_matches_kernel(spark, name):
    df = entry.queries()[name](spark, SF_CORRECTNESS)
    got = _canon_rows(df.columns, [tuple(r) for r in df.collect()])

    cur = duckdb.connect().execute(GOLDEN_ORACLES[name])
    cols = [d[0] for d in cur.description]
    want = _canon_rows(cols, cur.fetchall())

    assert sorted(df.columns) == sorted(cols)
    assert got == want
