"""Independent replicas re-deriving two pinned golden-VALUES oracles.

``drivernet_significance`` and ``k14_dag_break`` are golden-pinned
(plans/golden_oracles.py) with property tests but — until r7 — no
independent-implementation parity the way PCA has its prcomp replica.
These tests recompute the EXACT pinned rows at sf0.01 from the parquet
inputs using duckdb + numpy + plain Python only: no SparkSession, and no
import of the kernels under test (analytics/drivernet.py,
analytics/graph.py).  With this, each pin is derivable from two disjoint
code paths, closing the self-pinning circularity caveat.

Reference semantics: DriverNet/SignificanceTest.R:28-74 +
ResultSummary.R:104-129; integrative_omics/gizmos.py:567-630.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import numpy as np
import pytest

from .conftest import SF_CORRECTNESS

pytestmark = pytest.mark.slow

# must track analytics/drivernet.py PERM_SEED (the pin encodes it); kept
# as a literal here on purpose — a seed change must break this test
PERM_SEED = 20260813


def _duck():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "part", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECTNESS}/{t}.parquet')"
        )
    return con


def _pinned(sql: str):
    cur = duckdb.connect().execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, sorted(cur.fetchall())


# ---------------------------------------------------------------- K14 --


def _find_cycle_recursive(adj: dict) -> list | None:
    """Sorted-order DFS cycle finder, written recursively (the engine's
    is an explicit-stack loop).  The visitation SPEC — start nodes and
    neighbors in ascending order, first GRAY hit wins — fully determines
    the found cycle, so both implementations must agree."""
    color: dict = {}
    nodes = sorted({n for n in adj} | {v for vs in adj.values() for v in vs})

    def visit(u, path):
        color[u] = 1
        path.append(u)
        for v in sorted(adj.get(u, ())):
            if color.get(v, 0) == 1:
                i = path.index(v)
                ring = path[i:] + [v]
                return [(ring[j + 1], ring[j]) for j in range(len(ring) - 1)]
            if color.get(v, 0) == 0:
                found = visit(v, path)
                if found:
                    return found
        color[u] = 2
        path.pop()
        return None

    for s in nodes:
        if color.get(s, 0) == 0:
            found = visit(s, [])
            if found:
                return found
    return None


def test_k14_dag_break_pin_reproduces_without_spark():
    con = _duck()
    rows = con.execute(
        """
        SELECT CAST(user_id % 20 AS VARCHAR) AS src,
               CAST((user_id * 7 + 3) % 20 AS VARCHAR) AS dst,
               count(*) AS weight
        FROM events
        GROUP BY 1, 2
        HAVING src != dst
        """
    ).fetchall()
    kept = {(s, d): int(w) for s, d, w in rows}
    while True:
        adj: dict = defaultdict(set)
        for (s, d) in kept:
            adj[s].add(d)
        cycle = _find_cycle_recursive(adj)
        if cycle is None:
            break
        # the victim is a SET property of the cycle (min by weight, then
        # lexicographic edge), so edge orientation bookkeeping cancels out
        edge_set = {(a, b) if (a, b) in kept else (b, a) for a, b in cycle}
        victim = min(edge_set, key=lambda e: (kept[e], e))
        del kept[victim]

    from omics_data_integration_utilities_spark.plans.golden_oracles import SQL_GOLDEN_K14_DAG_BREAK

    cols, want = _pinned(SQL_GOLDEN_K14_DAG_BREAK)
    got = sorted((s, d, w) for (s, d), w in kept.items())
    assert cols == ["src", "dst", "weight"]
    assert got == want


# ------------------------------------------------- DriverNet A8 + K7 --

# the same 3-table construction SQL_DRIVERNET_GREEDY uses (that CTE text
# is itself an accepted hash-green oracle for the observed greedy)
_EVENTS_SQL = """
WITH joined AS (
  SELECT o.o_custkey, p.p_brand, p.p_type, l.l_extendedprice
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                  JOIN part p ON l.l_partkey = p.p_partkey
),
mut AS (SELECT DISTINCT o_custkey AS patient, p_brand AS mut_gene FROM joined),
edges AS (SELECT DISTINCT p_brand AS src, p_type AS dst FROM part),
st AS (
  SELECT o_custkey, p_type, l_extendedprice,
         avg(l_extendedprice) OVER (PARTITION BY p_type) AS mu,
         stddev(l_extendedprice) OVER (PARTITION BY p_type) AS sd
  FROM joined
),
outl AS (
  SELECT DISTINCT o_custkey AS patient, p_type AS out_gene FROM st
  WHERE sd IS NOT NULL AND sd > 0 AND abs(l_extendedprice - mu) >= 1.5 * sd
)
"""


def _greedy(sets: dict, k: int | None) -> list[tuple[str, int]]:
    """Greedy set cover, min-key-achieving-max-gain formulation (the
    engine iterates ascending keys with a strictly-greater test — same
    tie semantics, different shape)."""
    covered: set = set()
    out: list[tuple[str, int]] = []
    rounds = len(sets) if k is None else k
    for _ in range(rounds):
        gains = {g: len(s - covered) for g, s in sets.items()}
        best_gain = max(gains.values(), default=0)
        if best_gain <= 0:
            break
        gene = min(g for g, v in gains.items() if v == best_gain)
        covered |= sets[gene]
        out.append((gene, best_gain))
    return out


def test_drivernet_significance_pin_reproduces_without_spark():
    con = _duck()
    obs_rows = con.execute(
        _EVENTS_SQL
        + """
        SELECT DISTINCT m.patient, m.mut_gene, e.dst AS out_gene
        FROM mut m JOIN edges e ON e.src = m.mut_gene
                   JOIN outl o ON o.patient = m.patient AND o.out_gene = e.dst
        """
    ).fetchall()
    obs_sets: dict = defaultdict(set)
    for patient, gene, out_gene in obs_rows:
        obs_sets[gene].add((patient, out_gene))
    picks = _greedy(obs_sets, k=5)

    mut = con.execute(_EVENTS_SQL + "SELECT DISTINCT patient, mut_gene FROM mut").fetchall()
    edg = con.execute(_EVENTS_SQL + "SELECT DISTINCT src, dst FROM edges").fetchall()
    outl = con.execute(_EVENTS_SQL + "SELECT DISTINCT patient, out_gene FROM outl").fetchall()
    universe = sorted(
        {g for _, g in mut} | {g for _, g in outl}
        | {s for s, _ in edg} | {d for _, d in edg}
    )
    edges_by_src: dict = defaultdict(set)
    for s, d in edg:
        edges_by_src[s].add(d)
    outl_set = set(outl)

    pool: list[int] = []
    for run_id in range(20):
        rng = np.random.default_rng(PERM_SEED + run_id)
        mut_names = sorted({g for _, g in mut})
        outl_names = sorted({g for _, g in outl})
        # call order matters: mutation names are drawn first (kernel spec)
        new_mut = dict(zip(mut_names, rng.choice(universe, size=len(mut_names), replace=False)))
        new_outl = dict(zip(outl_names, rng.choice(universe, size=len(outl_names), replace=False)))
        relabeled_outl = {(p, new_outl[g]) for p, g in outl_set}
        null_sets: dict = defaultdict(set)
        for patient, g in mut:
            for dst in edges_by_src[new_mut[g]]:
                if (patient, dst) in relabeled_outl:
                    null_sets[new_mut[g]].add((patient, dst))
        pool.extend(c for _, c in _greedy(null_sets, k=None))

    n_null = len(pool)
    got = sorted(
        (
            i + 1,
            gene,
            cov,
            sum(1 for c in pool if c > cov),
            n_null,
            round(sum(1 for c in pool if c > cov) / n_null, 6),
        )
        for i, (gene, cov) in enumerate(picks)
    )

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_DRIVERNET_SIGNIFICANCE,
    )

    cols, want = _pinned(SQL_GOLDEN_DRIVERNET_SIGNIFICANCE)
    assert cols == ["pick", "mut_gene", "covered", "null_gt", "n_null", "p_value"]
    assert got == want
