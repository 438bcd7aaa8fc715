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


def test_oracle_portability_lint(duck):
    """Driver-portability lint over every registered oracle SQL — the
    r7 ``doc_pack_chunks`` incident: an output column named ``offset``
    (a DuckDB *reserved* keyword) hash-red a value-correct query because
    the driver's canonicalization SQL re-selects output columns by
    unquoted name.  Enforce for ALL oracles:

    1. no output column is a DuckDB reserved keyword;
    2. every output column is a plain identifier (no spaces, parens, or
       generated names like ``sum(l_quantity)`` — those must be aliased
       on both sides; mixed case is allowed for reference-parity names
       like ``Ion_name``);
    3. no duplicate output column names (driver compare sorts by name).
    """
    import re

    from .conftest import register_duck_views

    register_duck_views(duck, SF_SMOKE)
    reserved = {
        r[0].lower()
        for r in duck.execute(
            "SELECT keyword_name FROM duckdb_keywords() "
            "WHERE keyword_category = 'reserved'"
        ).fetchall()
    }
    # type_function / column_name categories are context-reserved in some
    # engine versions; ban the high-risk ones that name SQL clauses too.
    reserved |= {"offset", "order", "limit", "rows", "values", "group", "by"}
    ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    bad = []
    for name, sql in sorted(ORACLES.items()):
        body = sql.strip().rstrip(";")
        try:
            res = duck.execute(f"SELECT * FROM ({body}) AS __lint LIMIT 0")
        except Exception as e:  # pragma: no cover - lint clarity
            bad.append(f"{name}: oracle does not parse as a subquery: {e}")
            continue
        cols = [d[0] for d in res.description]
        for c in cols:
            if c.lower() in reserved:
                bad.append(f"{name}: output column {c!r} is a reserved keyword")
            if not ident.match(c):
                bad.append(f"{name}: output column {c!r} is not a plain identifier")
        if len(set(cols)) != len(cols):
            bad.append(f"{name}: duplicate output columns {cols}")
    assert not bad, "\n".join(bad)


# Every registered query must carry an oracle (SQL or golden VALUES).
# The ONLY sanctioned exceptions are the seeded iterative kernels whose
# outputs have no ANSI-SQL form AND whose digest successors are oracled
# (VERDICT r8: 'the only never-green are the two rows-only kernels whose
# digest successors ARE green').  Adding a query without an oracle must
# be a deliberate, reviewed decision — extend this list in the same
# commit or the lint fails.
ROWS_ONLY_SANCTIONED = {
    "combat_adjust",      # combat_adjust_digest is golden-oracled
    "methylmix_states",   # methylmix_states_digest is golden-oracled
}


def test_every_query_oracled_or_sanctioned():
    """Registry-consistency lint: no query silently lands with only the
    weak rows-only check."""
    missing = set(QUERIES) - set(ORACLES) - ROWS_ONLY_SANCTIONED
    assert not missing, (
        f"queries without an oracle and not in ROWS_ONLY_SANCTIONED: "
        f"{sorted(missing)}"
    )
    stale = ROWS_ONLY_SANCTIONED - set(QUERIES) | (
        ROWS_ONLY_SANCTIONED & set(ORACLES)
    )
    assert not stale, f"stale ROWS_ONLY_SANCTIONED entries: {sorted(stale)}"


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
