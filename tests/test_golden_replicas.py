"""Independent replicas re-deriving pinned golden-VALUES oracles.

``drivernet_significance``, ``drivernet_permutation``, ``k14_dag_break``,
``combat_adjust_digest``, ``clusterone_modules``,
``methylmix_states_digest``, ``k10_knn_impute``, ``k11_cluster_probes``
and ``k12_partial_corr`` are golden-pinned (plans/golden_oracles.py);
these tests recompute the EXACT pinned rows at sf0.01 from the parquet
inputs using duckdb + numpy + plain Python only: no SparkSession, and no
import of the kernels under test.  With this, each pin is derivable from
two disjoint code paths, closing the self-pinning circularity caveat
(the r6 standard: no golden pin without independent replica evidence).
The remaining four pins carry their independent evidence elsewhere:
``k10_pca_batch`` (prcomp replica, tests/test_kernels.py),
``methylmix_em``/``plan_methylmix`` (sample-level golden parity there),
``k13_count_glm`` (closed-form NB parity + the hash-checked
``k13_poisson_2group`` SQL route through the same IRLS).

Reference semantics: DriverNet/SignificanceTest.R:28-74 +
ResultSummary.R:104-129; integrative_omics/gizmos.py:567-630;
MethylMix/ComBat_NoFiles.R:30-297 + MethylMix.R:405-419;
integrative_omics/wcModules.py:219-227.
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


# ------------------------------------------------ ComBat EB digest --


def test_combat_adjust_digest_pin_reproduces_without_spark():
    """Re-derives the combat_adjust_digest golden from events.parquet via
    duckdb aggregation + a numpy EB shrinkage loop — no Spark, no import
    of analytics/combat.py.  Reference: ComBat_NoFiles.R:30-297."""
    con = _duck()
    cells = con.execute(
        """
        SELECT event_type AS feature, CAST(event_id AS VARCHAR) AS sample,
               CAST(user_id % 3 AS VARCHAR) AS batch, value AS v
        FROM events
        """
    ).fetchall()
    import math
    from collections import defaultdict as dd

    by_feat: dict = dd(list)
    for f, s, b, v in cells:
        by_feat[f].append((b, float(v)))
    gstats = {}
    for f, rows in by_feat.items():
        vs = np.array([v for _, v in rows])
        gstats[f] = (float(vs.mean()), float(vs.var()))  # var_pop
    # standardized effects per (feature, batch)
    eff: dict = {}
    for f, rows in by_feat.items():
        gm, gv = gstats[f]
        sd = math.sqrt(max(gv, 1e-12))
        zb: dict = dd(list)
        for b, v in rows:
            zb[b].append((v - gm) / sd)
        for b, zs in zb.items():
            z = np.array(zs)
            eff[(f, b)] = (float(z.mean()), max(float(z.var(ddof=1)), 1e-12), len(z))
    # EB shrink per batch across features (the kernel's eb_shrink, rewritten)
    shrunk = {}
    for batch in sorted({b for _, b in eff}):
        keys = sorted(k for k in eff if k[1] == batch)
        g = np.array([eff[k][0] for k in keys])
        d = np.array([eff[k][1] for k in keys])
        n = np.array([float(eff[k][2]) for k in keys])
        gbar, t2 = float(np.mean(g)), float(np.var(g)) + 1e-12
        dbar, s2 = float(np.mean(d)), float(np.var(d)) + 1e-12
        a_prior = (2 * s2 + dbar**2) / s2
        b_prior = (dbar * s2 + dbar**3) / s2
        g_star, d_star = g.copy(), d.copy()
        for _ in range(30):
            g_new = (n * t2 * g + d_star * gbar) / (n * t2 + d_star)
            sum2 = (n - 1) * d + n * (g - g_new) ** 2
            d_new = (0.5 * sum2 + b_prior) / (n / 2.0 + a_prior - 1.0)
            done = (
                np.max(np.abs(g_new - g_star)) < 1e-10
                and np.max(np.abs(d_new - d_star)) < 1e-10
            )
            g_star, d_star = g_new, d_new
            if done:
                break
        for k, gs, ds in zip(keys, g_star, d_star):
            shrunk[k] = (round(float(gs), 10), max(round(float(ds), 10), 1e-12))
    # adjusted values -> per-(feature, batch) digest
    agg: dict = dd(lambda: [0, 0.0, 0.0])
    for f, rows in by_feat.items():
        gm, gv = gstats[f]
        sd = math.sqrt(max(gv, 1e-12))
        for b, v in rows:
            z = (v - gm) / sd
            gs, ds = shrunk[(f, b)]
            adj = round(((z - gs) / math.sqrt(ds)) * sd + gm, 6)
            a = agg[(f, b)]
            a[0] += 1
            a[1] += adj
            a[2] += v
    got = sorted(
        (f, b, c, round(sa, 3), round(sv, 3))
        for (f, b), (c, sa, sv) in agg.items()
    )

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_COMBAT_ADJUST_DIGEST,
    )

    cols, want = _pinned(SQL_GOLDEN_COMBAT_ADJUST_DIGEST)
    assert cols == ["feature", "batch", "n", "adjusted_sum", "raw_sum"]
    assert got == sorted(want)


# ------------------------------------------- ClusterOne modules --


def _cohesiveness_greedy(adj: dict, penalty: float = 2.0):
    """Independent rewrite of the ClusterOne grow loop: INCREMENTAL
    w_in/w_bound updates per step (the engine recomputes from scratch),
    same spec — best add-or-remove by cohesiveness gain, seed protected,
    node-key tie ascending."""
    degree = {u: sum(nb.values()) for u, nb in adj.items()}
    clustered: set = set()
    out = []
    for seed in sorted(degree, key=lambda u: (-degree[u], u)):
        if seed in clustered:
            continue
        members = {seed}
        w_in, w_bound = 0.0, degree[seed]

        def f(wi, wb, size):
            den = wi + wb + penalty * size
            return wi / den if den > 0 else 0.0

        best = f(w_in, w_bound, 1)
        while True:
            step = None
            frontier = sorted({v for u in members for v in adj[u]} - members)
            for v in frontier:
                din = sum(w for t, w in adj[v].items() if t in members)
                wi, wb = w_in + din, w_bound - din + (degree[v] - din)
                fv = f(wi, wb, len(members) + 1)
                if fv > best + 1e-12 and (step is None or fv > step[0] + 1e-12):
                    step = (fv, "add", v, wi, wb)
            if len(members) > 1:
                for v in sorted(members):
                    if v == seed:
                        continue
                    din = sum(w for t, w in adj[v].items() if t in members and t != v)
                    wi, wb = w_in - din, w_bound + din - (degree[v] - din)
                    fv = f(wi, wb, len(members) - 1)
                    if fv > best + 1e-12 and (step is None or fv > step[0] + 1e-12):
                        step = (fv, "del", v, wi, wb)
            if step is None:
                break
            best, op, v, w_in, w_bound = step
            members = members | {v} if op == "add" else members - {v}
        out.append(frozenset(members))
        clustered |= members
    return out


def test_clusterone_modules_pin_reproduces_without_spark():
    """Re-derives the clusterone_modules golden: duckdb builds the
    planted-block edge list, an independently-written incremental greedy
    recovers the clusters, and the digest matches the pinned VALUES.
    Reference: integrative_omics/wcModules.py:219-227."""
    con = _duck()
    rows = con.execute(
        """
        WITH e AS (
          -- user_id // 12: Spark's double-division + cast TRUNCATES while
          -- DuckDB's double->bigint cast rounds, so use integer division
          SELECT user_id % 12 AS s, user_id // 12 AS j FROM events
        ), lab AS (
          SELECT CAST(s AS VARCHAR) AS src,
                 CAST(CASE WHEN j % 10 = 0 THEN (s + 4) % 12
                      ELSE (s // 4) * 4 + ((s + 1 + j % 3) % 4) END AS VARCHAR) AS dst
          FROM e
        )
        SELECT src, dst, count(*) AS w FROM lab WHERE src != dst GROUP BY 1, 2
        """
    ).fetchall()
    from collections import defaultdict as dd

    adj: dict = dd(dict)
    # pool duplicate directions like the engine's undirected groupBy
    pooled: dict = dd(float)
    for s, d, w in rows:
        a, b = (s, d) if s < d else (d, s)
        pooled[(a, b)] += float(w)
    for (a, b), w in pooled.items():
        adj[a][b] = w
        adj[b][a] = w

    clusters = _cohesiveness_greedy(adj)
    # merge omega >= 0.8 (none expected for the planted blocks), filter
    final = []
    for c in clusters:
        if len(c) < 3:
            continue
        w_in = sum(w for u in c for v, w in adj[u].items() if v in c) / 2.0
        w_bound = sum(w for u in c for v, w in adj[u].items() if v not in c)
        n_in = sum(1 for u in c for v in adj[u] if v in c) // 2
        density = n_in / (len(c) * (len(c) - 1) / 2.0)
        if density < 0.5:
            continue
        coh = w_in / (w_in + w_bound + 2.0 * len(c))
        final.append((round(coh, 6), sorted(c), len(c), round(density, 6)))
    final.sort(key=lambda t: (-t[0], t[1]))
    got = sorted(
        (cid, m, size, density, coh)
        for cid, (coh, members, size, density) in enumerate(final)
        for m in members
    )

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_CLUSTERONE_MODULES,
    )

    cols, want = _pinned(SQL_GOLDEN_CLUSTERONE_MODULES)
    assert cols == ["cluster_id", "member", "size", "density", "cohesiveness"]
    assert got == sorted(want)


# ------------------------------------------- MethylMix states digest --


def test_methylmix_states_digest_pin_reproduces_without_spark():
    """Re-derives the methylmix_states_digest golden from events.parquet
    with duckdb + numpy only (no analytics/methylmix import).

    The pin contains ONLY classification=1 rows — the kernel selected a
    single beta component for every gene — and in the 1-component
    no-normal-mode branch (MethylMix.R:405-419) the states matrix is
    pure arithmetic: classification 1 everywhere and
    methylation_state = mean(cancer) − mean(normal) for every sample.
    The replica recomputes the digest from those semantics; had the
    kernel chosen >1 component anywhere, classification=2 rows would
    exist and this arithmetic form could not reproduce the pin."""
    con = _duck()
    rows = con.execute(
        """
        SELECT event_type, event_id, user_id, value / 500.0 AS beta_v
        FROM events
        """
    ).fetchall()
    from collections import defaultdict as dd

    cancer: dict = dd(list)
    normal: dict = dd(list)
    for et, eid, uid, bv in rows:
        (normal if uid % 7 == 0 else cancer)[et].append((int(eid), float(bv)))
    got = []
    for et in sorted(cancer):
        xs = np.array([bv for _, bv in cancer[et]])
        fin = np.isfinite(xs)
        xs = xs[fin]
        ids = np.array([eid for eid, _ in cancer[et]])[fin]
        assert len(xs) >= 5  # the kernel's min_n gate
        xn = np.array([bv for _, bv in normal[et]])
        xn = xn[np.isfinite(xn)]
        state = round(float(xs.mean() - xn.mean()), 6)
        got.append(
            (
                et,
                1,
                len(xs),
                round(float(np.round(xs, 6).sum()), 4),
                round(len(xs) * state, 4),
                round(float(ids.sum()), 0),
            )
        )

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_METHYLMIX_STATES_DIGEST,
    )

    cols, want = _pinned(SQL_GOLDEN_METHYLMIX_STATES_DIGEST)
    assert cols == ["event_type", "classification", "n", "value_sum", "state_sum", "id_sum"]
    assert sorted(got) == sorted(want)


# -------------------------------------- DriverNet permutation (A8) --


def test_drivernet_permutation_pin_reproduces_without_spark():
    """Re-derives the drivernet_permutation golden — per-rank null
    coverage of the 20 seeded randomized runs — from the parquet inputs
    with duckdb + numpy + the local ``_greedy`` rewrite only
    (SignificanceTest.R:28-74 name-relabeling upstream of the join)."""
    con = _duck()
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
    mut_names = sorted({g for _, g in mut})
    outl_names = sorted({g for _, g in outl})

    got = []
    for run_id in range(20):
        rng = np.random.default_rng(PERM_SEED + run_id)
        new_mut = dict(zip(mut_names, rng.choice(universe, size=len(mut_names), replace=False)))
        new_outl = dict(zip(outl_names, rng.choice(universe, size=len(outl_names), replace=False)))
        relabeled_outl = {(p, new_outl[g]) for p, g in outl_set}
        null_sets: dict = defaultdict(set)
        for patient, g in mut:
            for dst in edges_by_src[new_mut[g]]:
                if (patient, dst) in relabeled_outl:
                    null_sets[new_mut[g]].add((patient, dst))
        for rank, (_, cov) in enumerate(_greedy(null_sets, k=None), start=1):
            got.append((run_id, rank, cov))

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_DRIVERNET_PERMUTATION,
    )

    cols, want = _pinned(SQL_GOLDEN_DRIVERNET_PERMUTATION)
    assert cols == ["run_id", "rank", "coverage"]
    assert sorted(got) == sorted(want)


# ------------------------------------------------ K10 kNN impute --


def test_k10_knn_impute_pin_reproduces_without_spark():
    """Re-derives the k10_knn_impute golden (Download_Preprocess.R:791-819
    impute path) with duckdb + numpy only — no analytics/kernels import.
    The replica follows the kernel's SPEC: per block, pivot
    (row, col) -> matrix with lexicographic key order, then impute nan
    cells row-major from the mean of the k=3 nearest donor rows by RMS
    distance over mutually ORIGINALLY-observed columns, ties on donor
    position; earlier-imputed cells are live donors for later cells
    (the in-place update is part of the spec)."""
    con = _duck()
    cells = con.execute(
        """
        SELECT CAST(user_id % 5 AS VARCHAR) AS block,
               CAST(user_id % 17 AS VARCHAR) AS row,
               event_type AS col,
               round(avg(CASE WHEN value < 5.0 THEN NULL ELSE value END), 6) AS v
        FROM events GROUP BY 1, 2, 3
        """
    ).fetchall()
    by_block: dict = defaultdict(dict)
    for b, r, c, v in cells:
        by_block[b][(r, c)] = float(v) if v is not None else np.nan

    got = []
    for b in sorted(by_block):
        cmap = by_block[b]
        rows_ = sorted({r for r, _ in cmap})
        cols_ = sorted({c for _, c in cmap})
        a = np.full((len(rows_), len(cols_)), np.nan)
        for (r, c), v in cmap.items():
            a[rows_.index(r), cols_.index(c)] = v
        observed = ~np.isnan(a)
        for i in range(a.shape[0]):
            for j in np.where(np.isnan(a[i]))[0]:
                dists = []
                for other in range(a.shape[0]):
                    if other == i or np.isnan(a[other, j]):
                        continue
                    mask = observed[i] & observed[other]
                    if not mask.any():
                        continue
                    d = float(np.sqrt(np.mean((a[i, mask] - a[other, mask]) ** 2)))
                    dists.append((d, other))
                dists.sort()
                if dists:
                    a[i, j] = float(np.mean([a[o, j] for _, o in dists[:3]]))
        for i, r in enumerate(rows_):
            for j, c in enumerate(cols_):
                if not np.isnan(a[i, j]):
                    got.append((b, r, c, round(float(a[i, j]), 6), not observed[i, j]))

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_K10_KNN_IMPUTE,
    )

    cols, want = _pinned(SQL_GOLDEN_K10_KNN_IMPUTE)
    assert cols == ["block", "row", "col", "v", "imputed"]
    assert sorted(got) == sorted(want)


# ------------------------------------------- K11 probe clustering --


def test_k11_cluster_probes_pin_reproduces_without_spark():
    """Re-derives the k11_cluster_probes golden (MethylMix
    Download_Preprocess.R:1350-1482: 1-corr distance, complete linkage,
    cut 0.6) with duckdb + numpy only.  The linkage replica recomputes
    the full inter-cluster distance table each round and merges the
    minimum (same spec as the engine's incremental list surgery); labels
    are assigned by smallest member over lexicographic probe order."""
    con = _duck()
    cells = con.execute(
        """
        SELECT CAST(user_id % 4 AS VARCHAR) AS gene, event_type AS probe,
               CAST(user_id AS VARCHAR) AS sample, avg(value) AS beta
        FROM events GROUP BY 1, 2, 3
        """
    ).fetchall()
    by_gene: dict = defaultdict(dict)
    for g, p, s, v in cells:
        by_gene[g][(p, s)] = float(v)

    got = []
    for g in sorted(by_gene):
        cmap = by_gene[g]
        probes = sorted({p for p, _ in cmap})
        samples = sorted({s for _, s in cmap})
        # pivot + dropna: keep probes observed on every sample
        full = [p for p in probes if all((p, s) in cmap for s in samples)]
        m = np.array([[cmap[(p, s)] for s in samples] for p in full])
        # correlation from the centered Gram matrix (corrcoef restated)
        xc = m - m.mean(axis=1, keepdims=True)
        gram = xc @ xc.T
        dd = np.sqrt(np.diag(gram))
        corr = gram / np.outer(dd, dd)
        corr = np.clip(np.nan_to_num(corr, nan=0.0), -1.0, 1.0)
        dist = 1.0 - corr
        clusters = [[i] for i in range(len(full))]
        while len(clusters) > 1:
            best = (np.inf, -1, -1)
            for i in range(len(clusters)):
                for j in range(i + 1, len(clusters)):
                    cd = max(dist[a, b] for a in clusters[i] for b in clusters[j])
                    if cd < best[0] or (cd == best[0] and (i, j) < (best[1], best[2])):
                        best = (cd, i, j)
            if best[0] > 0.6:
                break
            _, i, j = best
            clusters[i] = clusters[i] + clusters[j]
            del clusters[j]
        for lbl, members in enumerate(sorted(clusters, key=min)):
            for mbr in members:
                got.append((g, full[mbr], lbl))

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_K11_CLUSTER_PROBES,
    )

    cols, want = _pinned(SQL_GOLDEN_K11_CLUSTER_PROBES)
    assert cols == ["gene", "probe", "cluster"]
    assert sorted(got) == sorted(want)


# ---------------------------------------- K12 partial correlations --


def test_k12_partial_corr_pin_reproduces_without_spark():
    """Re-derives the k12_partial_corr golden (Gohs partial-correlation
    screen, shrinkage 0.1) with duckdb + numpy only: correlation from
    the centered Gram matrix, precision via solve against the identity
    (the engine uses corrcoef + inv), pcor = -prec_ij / sqrt(prec_ii
    prec_jj) over the upper triangle of lexicographic var order."""
    con = _duck()
    cells = con.execute(
        """
        SELECT CAST(user_id % 4 AS VARCHAR) AS block,
               CAST(user_id AS VARCHAR) AS sample,
               event_type AS var, avg(value) AS v
        FROM events GROUP BY 1, 2, 3
        """
    ).fetchall()
    by_block: dict = defaultdict(dict)
    for b, s, vr, v in cells:
        by_block[b][(s, vr)] = float(v)

    got = []
    for b in sorted(by_block):
        cmap = by_block[b]
        variables = sorted({vr for _, vr in cmap})
        samples = sorted({s for s, _ in cmap})
        full = [s for s in samples if all((s, vr) in cmap for vr in variables)]
        if len(variables) < 3 or len(full) < 3:
            continue
        m = np.array([[cmap[(s, vr)] for vr in variables] for s in full])
        xc = m - m.mean(axis=0, keepdims=True)
        gram = xc.T @ xc
        dd = np.sqrt(np.diag(gram))
        r = np.clip(gram / np.outer(dd, dd), -1.0, 1.0)
        r = 0.9 * r + 0.1 * np.eye(len(variables))
        prec = np.linalg.solve(r, np.eye(len(variables)))
        d = np.sqrt(np.diag(prec))
        pc = -prec / np.outer(d, d)
        for i in range(len(variables)):
            for j in range(i + 1, len(variables)):
                got.append((b, variables[i], variables[j], round(float(pc[i, j]), 6)))

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_K12_PARTIAL_CORR,
    )

    cols, want = _pinned(SQL_GOLDEN_K12_PARTIAL_CORR)
    assert cols == ["block", "var_a", "var_b", "pcor"]
    assert sorted(got) == sorted(want)


# --------------------------------------------- SemDeDup digest --


def test_sim_semantic_dedup_digest_pin_reproduces_without_spark():
    """Re-derives the sim_semantic_dedup_digest golden (SemDeDup, Abbas
    et al. 2023) with duckdb + numpy only: normalize each embedding,
    then the order-sequential greedy — ids ascending, drop when cosine
    to any already-KEPT item reaches the threshold — restated as a plain
    loop over the parquet rows (the engine's is a sorted-pandas GEMM
    inside applyInPandas)."""
    rows = duckdb.connect().execute(
        f"""
        SELECT vec_id, embedding
        FROM read_parquet('{SF_CORRECTNESS}/embeddings.parquet')
        ORDER BY vec_id
        """
    ).fetchall()
    ids = [int(r[0]) for r in rows]
    m = np.array([r[1] for r in rows], dtype="float64")
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0.0] = 1.0
    u = m / norms[:, None]

    kept_rows: list[int] = []
    agg = {False: [0, 0, 0.0], True: [0, 0, 0.0]}
    for i in range(len(ids)):
        # mirror the engine exactly: the keep/drop DECISION uses the raw
        # max cosine; only the stored per-item sim is rounded to 6 (and
        # the aggregated sim_sum to 3 below) — deciding on the rounded
        # value could flip a keep within 5e-7 of the threshold
        raw_max = float((u[kept_rows] @ u[i]).max()) if kept_rows else 0.0
        verdict = not (kept_rows and raw_max >= 0.35)
        if verdict:
            kept_rows.append(i)
        a = agg[verdict]
        a[0] += 1
        a[1] += ids[i]
        a[2] += float(np.round(raw_max, 6))
    got = sorted((k, n, s, round(ss, 3)) for k, (n, s, ss) in agg.items())

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_SIM_SEMANTIC_DEDUP_DIGEST,
    )

    cols, want = _pinned(SQL_GOLDEN_SIM_SEMANTIC_DEDUP_DIGEST)
    assert cols == ["keep", "n", "id_sum", "sim_sum"]
    assert got == sorted(want)


def test_sim_semantic_dedup_bucketed_digest_pin_reproduces_without_spark():
    """Re-derives the BUCKETED SemDeDup golden (n_lists=4,
    sample_fraction=1.0) with duckdb + numpy only — the full chain the
    engine runs: id-sorted full-corpus quantizer training (evenly-spaced
    seeds, 2 Lloyd iterations, squared-euclidean assignment), one
    assignment pass, then the per-cluster order-sequential greedy
    (decision on the raw max cosine; per-item sims rounded to 6, the
    aggregated sim_sum to 3 — mirroring operators/similarity.py
    exactly)."""
    rows = duckdb.connect().execute(
        f"""
        SELECT vec_id, embedding
        FROM read_parquet('{SF_CORRECTNESS}/embeddings.parquet')
        ORDER BY vec_id
        """
    ).fetchall()
    ids = np.array([int(r[0]) for r in rows])
    m = np.array([r[1] for r in rows], dtype="float64")

    n_lists = 4
    cents = m[np.linspace(0, len(m) - 1, n_lists).astype(int)].copy()
    for _ in range(2):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_lists):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    lists = d2.argmin(axis=1)

    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0.0] = 1.0
    u = m / norms[:, None]
    agg: dict[tuple[int, bool], list] = {}
    for c in range(n_lists):
        idx = np.where(lists == c)[0]
        idx = idx[np.argsort(ids[idx], kind="stable")]
        kept: list[int] = []
        for i in idx:
            raw = float((u[kept] @ u[i]).max()) if kept else 0.0
            verdict = not (kept and raw >= 0.35)
            if verdict:
                kept.append(i)
            a = agg.setdefault((c, verdict), [0, 0, 0.0])
            a[0] += 1
            a[1] += int(ids[i])
            a[2] += float(np.round(raw, 6))
    got = sorted(
        (c, k, n, s, round(ss, 3)) for (c, k), (n, s, ss) in agg.items()
    )

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_SIM_SEMANTIC_DEDUP_BUCKETED_DIGEST,
    )

    cols, want = _pinned(SQL_GOLDEN_SIM_SEMANTIC_DEDUP_BUCKETED_DIGEST)
    assert cols == ["list_id", "keep", "n", "id_sum", "sim_sum"]
    assert got == sorted(want)


def test_text_compression_ratio_digest_pin_reproduces_without_spark():
    """Re-derives the compression-ratio golden with duckdb + zlib only:
    per document, deflate(level 6) bytes over utf-8 bytes, rounded to 6;
    keep = rounded ratio > 0.4 (empty/null -> ratio null, keep false);
    digest per verdict with ratio_sum rounded to 3 — mirroring
    operators/text.py compression_ratio exactly."""
    import zlib

    rows = duckdb.connect().execute(
        f"""
        SELECT doc_id, text
        FROM read_parquet('{SF_CORRECTNESS}/documents.parquet')
        """
    ).fetchall()
    agg: dict[bool, list] = {}
    for did, text in rows:
        raw = text.encode("utf-8") if text is not None else b""
        ratio = round(len(zlib.compress(raw, 6)) / len(raw), 6) if raw else None
        keep = ratio is not None and ratio > 0.4
        a = agg.setdefault(keep, [0, 0, 0, 0.0])
        a[0] += 1
        a[1] += int(did)
        a[2] += len(raw)
        a[3] += ratio if ratio is not None else 0.0
    got = sorted((k, n, s, b, round(rs, 3)) for k, (n, s, b, rs) in agg.items())

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_TEXT_COMPRESSION_RATIO_DIGEST,
    )

    cols, want = _pinned(SQL_GOLDEN_TEXT_COMPRESSION_RATIO_DIGEST)
    assert cols == ["keep", "n", "id_sum", "bytes_sum", "ratio_sum"]
    assert got == sorted(want)


def test_sim_diversity_digest_pin_reproduces_without_spark():
    """Re-derives the sim_diversity_digest golden (greedy k-center
    coreset, n=60, n_lists=4, full-corpus quantizer training) with
    duckdb + numpy only — the full chain the engine runs: id-sorted
    quantizer training (evenly-spaced seeds, 2 Lloyd iterations,
    squared-euclidean assignment), size-proportional largest-remainder
    quotas (re-implemented inline, not imported), then per cluster the
    farthest-point greedy on unit vectors (seed = lowest id, cosine
    distance, first-max tie-break, per-pick distance rounded to 6, the
    aggregated dist_sum to 3 — mirroring operators/similarity.py
    diversity_sample exactly)."""
    rows = duckdb.connect().execute(
        f"""
        SELECT vec_id, embedding
        FROM read_parquet('{SF_CORRECTNESS}/embeddings.parquet')
        ORDER BY vec_id
        """
    ).fetchall()
    ids = np.array([int(r[0]) for r in rows])
    m = np.array([r[1] for r in rows], dtype="float64")

    n_lists, total = 4, 60
    cents = m[np.linspace(0, len(m) - 1, n_lists).astype(int)].copy()
    for _ in range(2):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_lists):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    lists = d2.argmin(axis=1)

    # largest-remainder apportionment, inline (weights = cluster sizes,
    # key order = zero-padded list_id — numeric order on remainder ties,
    # mirroring diversity_sample's f"{k:09d}" keying)
    sizes = {int(c): int((lists == c).sum()) for c in range(n_lists)}
    wsum = float(sum(sizes.values()))
    exact = {f"{c:09d}": total * v / wsum for c, v in sizes.items()}
    base = {d: int(exact[d]) for d in exact}
    for d in sorted(exact, key=lambda d: (-(exact[d] - base[d]), d))[
        : total - sum(base.values())
    ]:
        base[d] += 1
    quotas = {int(d): q for d, q in base.items()}

    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0.0] = 1.0
    u = m / norms[:, None]
    got = []
    for c in range(n_lists):
        idx = np.where(lists == c)[0]
        idx = idx[np.argsort(ids[idx], kind="stable")]
        quota = min(quotas.get(c, 0), len(idx))
        if quota <= 0:
            continue
        sel = [0]
        dist_sum = 0.0
        mind = 1.0 - u[idx] @ u[idx[0]]
        mind[0] = -np.inf
        for _ in range(1, quota):
            i = int(np.argmax(mind))
            sel.append(i)
            dist_sum += float(np.round(mind[i], 6))
            np.minimum(mind, 1.0 - u[idx] @ u[idx[i]], out=mind)
            mind[i] = -np.inf
        got.append(
            (c, quota, int(ids[idx][sel].sum()), round(dist_sum, 3))
        )

    from omics_data_integration_utilities_spark.plans.golden_oracles import (
        SQL_GOLDEN_SIM_DIVERSITY_DIGEST,
    )

    cols, want = _pinned(SQL_GOLDEN_SIM_DIVERSITY_DIGEST)
    assert cols == ["list_id", "n_sel", "id_sum", "dist_sum"]
    assert sorted(got) == sorted(want)
