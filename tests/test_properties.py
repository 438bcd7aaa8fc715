"""Property-based tests (hypothesis) — the reference has no property
testing (SURVEY §5); the engine adds it for the algebraic operators."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from omics_data_integration_utilities_spark.functions.stats import (
    betainc,
    student_t_sf_two_sided,
)


@given(
    t=st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
    df=st.floats(min_value=1.0, max_value=1000.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_t_tail_in_unit_interval_and_symmetric(t, df):
    p = float(student_t_sf_two_sided(t, df))
    p_neg = float(student_t_sf_two_sided(-t, df))
    assert 0.0 <= p <= 1.0
    assert abs(p - p_neg) < 1e-12  # two-sided: symmetric in t


@given(df=st.floats(min_value=1.0, max_value=100.0))
@settings(max_examples=50, deadline=None)
def test_t_tail_monotone_decreasing(df):
    ts = np.array([0.0, 0.5, 1.0, 2.0, 4.0, 8.0])
    ps = student_t_sf_two_sided(ts, np.full_like(ts, df))
    assert ps[0] > 0.99  # P(|T|>=0) = 1
    assert np.all(np.diff(ps) < 0)


@given(
    a=st.floats(min_value=0.1, max_value=50.0),
    b=st.floats(min_value=0.1, max_value=50.0),
    # keep x away from the representability cliff: for x < ~1e-16 the
    # complement 1-x rounds to exactly 1.0 and the identity cannot hold
    x=st.floats(min_value=1e-12, max_value=1.0 - 1e-12),
)
@settings(max_examples=200, deadline=None)
def test_betainc_bounds_and_complement(a, b, x):
    v = float(betainc(a, b, x))
    assert -1e-12 <= v <= 1 + 1e-12
    # I_x(a,b) + I_{1-x}(b,a) = 1 — tolerance dominated by the
    # representation error of 1-x near the interval ends (log-amplified),
    # not by the continued fraction itself
    comp = float(betainc(b, a, 1.0 - x))
    assert abs(v + comp - 1.0) < 5e-7


def test_band_join_random_instances(spark):
    """Randomized (seeded) equivalence of the grid-bucketed band join and
    the naive theta join across bucket widths — heavier than the unit test,
    one spark round-trip per width."""
    rng = np.random.RandomState(11)
    pts = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(rng.uniform(-100, 100, 300))],
        "pid long, x double",
    )
    lo = rng.uniform(-110, 100, 80)
    width = rng.exponential(5.0, 80)
    iv = spark.createDataFrame(
        [(int(j), float(a), float(a + w)) for j, (a, w) in enumerate(zip(lo, width))],
        "iid long, lo double, hi double",
    )
    from omics_data_integration_utilities_spark.operators.joins import band_join

    naive = (
        pts.crossJoin(iv)
        .where((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .select("pid", "iid")
    )
    expected = sorted(tuple(r) for r in naive.collect())
    for w in (0.7, 3.0, 17.0):
        got = band_join(pts, iv, "x", "lo", "hi", bucket_width=w).select("pid", "iid")
        assert sorted(tuple(r) for r in got.collect()) == expected
    # the small-interval-side broadcast variant joins the same pairs
    from omics_data_integration_utilities_spark.operators.joins import (
        band_join_broadcast,
    )

    bc = band_join_broadcast(pts, iv, "x", "lo", "hi").select("pid", "iid")
    assert sorted(tuple(r) for r in bc.collect()) == expected


def test_minhash_signature_properties(spark):
    """Identical texts hash identically; disjoint-shingle texts share no
    signature positions only by coincidence (bounded below)."""
    from omics_data_integration_utilities_spark.operators.dedup import (
        with_minhash_signature,
    )

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, t1), (2, t1), (3, t2)], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["__sig"] for r in with_minhash_signature(df, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    assert len(sigs[1]) == 16


def test_jaccard_identical_docs_is_one(spark):
    from omics_data_integration_utilities_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    t = "a b c d e f g h i j"
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    row = ngram_jaccard_pairs(df, "text", "doc_id", min_jaccard=0.0).collect()[0]
    assert row["jaccard"] == 1.0


# --------------------------------------------------------------------------
# round-3 kernel invariants
# --------------------------------------------------------------------------

@given(
    ps=st.lists(st.floats(min_value=1e-6, max_value=1.0), min_size=1, max_size=30),
)
@settings(max_examples=50, deadline=None)
def test_bh_adjust_invariants_driver_side(ps):
    """BH on the numpy side of the window formula: adjusted values are in
    [p, 1], monotone in the p-ordering, and idempotent-safe (a second
    adjust of adjusted values never decreases them)."""
    import numpy as np

    def bh(pvec):
        m = len(pvec)
        order = np.argsort(pvec, kind="mergesort")
        raw = pvec[order] * m / (np.arange(m) + 1)
        adj = np.minimum.accumulate(raw[::-1])[::-1]
        out = np.empty(m)
        out[order] = np.minimum(adj, 1.0)
        return out

    p = np.array(ps)
    adj = bh(p)
    assert np.all(adj >= p - 1e-12)
    assert np.all(adj <= 1.0 + 1e-12)
    # monotone: sorting by p sorts adj (ties aside)
    order = np.argsort(p, kind="mergesort")
    assert np.all(np.diff(adj[order]) >= -1e-12)


@given(
    a=st.floats(min_value=0.2, max_value=50.0),
    b=st.floats(min_value=0.2, max_value=50.0),
)
@settings(max_examples=30, deadline=None)
def test_beta_est_recovers_moments_roundtrip(a, b):
    """The weighted beta MLE lands near the true parameters' mean for
    large samples (consistency smoke over the parameter space)."""
    import numpy as np

    from omics_data_integration_utilities_spark.analytics.methylmix import _beta_est

    rng = np.random.RandomState(int(a * 1000 + b * 7) % (2**31))
    y = rng.beta(a, b, 4000)
    ones = np.ones(len(y))
    ah, bh_ = _beta_est(y, ones, ones)
    assert ah > 0 and bh_ > 0
    # fitted mean close to empirical mean
    assert abs(ah / (ah + bh_) - y.mean()) < 0.02


@given(
    n=st.integers(min_value=2, max_value=12),
    m=st.integers(min_value=2, max_value=12),
    u_frac=st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=60, deadline=None)
def test_wilcox_exact_p_bounds_and_symmetry(n, m, u_frac):
    import math

    from omics_data_integration_utilities_spark.analytics.methylmix import (
        _wilcox_exact_p,
    )

    u = round(u_frac * n * m)
    p = _wilcox_exact_p(float(u), n, m)
    assert 0.0 < p <= 1.0
    # U and nm-U are symmetric: same two-sided p
    p_sym = _wilcox_exact_p(float(n * m - u), n, m)
    assert math.isclose(p, p_sym, rel_tol=1e-9) or abs(p - p_sym) < 1e-9


@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=4, max_size=4),
)
@settings(max_examples=30, deadline=None)
def test_nb_deviance_zero_at_saturation(counts):
    """NB deviance of y against mu=y is exactly 0; against any other mu
    it is positive."""
    import numpy as np

    from omics_data_integration_utilities_spark.analytics.kernels import _nb_deviance

    y = np.array(counts, dtype=float)
    assert abs(_nb_deviance(y, y.copy(), 0.05)) < 1e-9
    assert _nb_deviance(y, y * 1.5, 0.05) > 0


# ---- K1 graph writer: serializer round-trip + rewrite stability ----

_ATOM_TOKENS = ["C", "N", "O", "S", "c", "n", "Cl", "Br", "[CH3]", "[N+]", "[O-]", "*"]
_BONDS = ["", "=", "#"]


@st.composite
def _smiles_subset(draw):
    """Random chain/branch/ring strings inside the parser subset — up to
    TWO rings (possibly fused/nested) so ring-crossing rewrites and
    multi-ring serializations get generator coverage."""
    n = draw(st.integers(min_value=1, max_value=8))
    out = [draw(st.sampled_from(_ATOM_TOKENS))]
    open_branches = 0
    rings_opened = 0
    ring_open: list[str] = []
    for _ in range(n - 1):
        op = draw(st.integers(min_value=0, max_value=6))
        if op == 0:
            out.append("(")
            open_branches += 1
        elif op == 1 and open_branches > 0:
            out.append(")")
            open_branches -= 1
        if op == 2 and rings_opened < 2 and len(out) > 1:
            # open a ring digit on the previous atom position
            rings_opened += 1
            d = str(rings_opened)
            out.append(d)
            ring_open.append(d)
        elif op == 3 and ring_open and len(out) > 1:
            # close an open ring early (not self-pairing: an atom token
            # is always appended right after the digit below)
            out.append(ring_open.pop(0))
        out.append(draw(st.sampled_from(_BONDS)))
        out.append(draw(st.sampled_from(_ATOM_TOKENS)))
    out.extend(")" * open_branches)
    out.extend(ring_open)
    return "".join(out)


@given(s=_smiles_subset())
@settings(max_examples=200, deadline=None)
def test_serialize_graph_is_parse_fixed_point(s):
    """serialize(parse(x)) reaches a fixed point after one application:
    the writer's output is inside the parser subset and re-serializes
    bit-identically — so rewritten products are stable under re-parsing
    (content-hash product ids never flap)."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        parse_graph,
        serialize_graph,
    )

    try:
        atoms, edges = parse_graph(s)
    except ValueError:
        return  # generated string fell outside the subset; nothing to check
    once = serialize_graph([a.raw for a in atoms], edges)
    atoms2, edges2 = parse_graph(once)  # must not raise
    twice = serialize_graph([a.raw for a in atoms2], edges2)
    assert twice == once
    # the graph itself survives: same atom token multiset, same edge count
    assert sorted(a.raw for a in atoms2) == sorted(a.raw for a in atoms)
    assert len(edges2) == len(edges)


@given(s=_smiles_subset())
@settings(max_examples=100, deadline=None)
def test_graph_rewrite_products_reparse(s):
    """Every product of an atom-mapped rewrite stays inside the parser
    subset (it can feed the next reaction round, the K4/K5 loop shape)."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        apply_reaction,
        parse_graph,
    )

    for prod in apply_reaction(s, "[C:1]O", "[C:1]N"):
        parse_graph(prod)  # must not raise


@given(s=_smiles_subset())
@settings(max_examples=100, deadline=None)
def test_canonical_form_invariant_under_branch_reorder(s):
    """canonical_form is a molecule identity: every branch-order
    linearization of the same tree (a different WRITING of the same
    graph) must canonicalize to the same string — the property the
    graph-path product dedup relies on."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        _linearizations,
        canonical_form,
        parse_graph,
    )

    try:
        parse_graph(s)
    except ValueError:
        return
    forms = {canonical_form(lin) for lin in _linearizations(s)}
    assert len(forms) == 1


@given(s=_smiles_subset())
@settings(max_examples=150, deadline=None)
def test_substructure_identity_embedding(s):
    """Every parseable molecule embeds in itself (the identity assignment
    satisfies the matcher), and in itself with any linearized rewriting —
    the K3 matcher can never reject a molecule as its own substructure."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        _linearizations,
        has_substructure,
        parse_graph,
    )

    try:
        parse_graph(s)
    except ValueError:
        return
    assert has_substructure(s, s)
    for lin in _linearizations(s):
        assert has_substructure(s, lin) and has_substructure(lin, s)


@given(s=_smiles_subset())
@settings(max_examples=100, deadline=None)
def test_splice_and_graph_paths_agree_on_molecules(s):
    """Differential check between the two rewrite engines: for an
    atom-mapped rule, the graph writer run over ALL embeddings (empty
    skip set) must produce exactly the molecule set of the full
    apply_reaction composition — the splice path only changes WRITINGS,
    never molecules."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        _apply_graph,
        apply_reaction,
        canonical_form,
        parse_graph,
    )

    try:
        parse_graph(s)
    except ValueError:
        return
    for pat, tpl in (
        ("[C:1]O", "[C:1]N"),          # substitution
        ("[C:1]O[C:2]", "[C:1][C:2]"),  # interior deletion
        ("[O:1]", "[O:1]C"),            # boundary insertion
        ("[N:1]", "[N:1]=O"),           # boundary insertion, bond order
        # r8 query primitives: both paths must still agree when the
        # pattern matches via alternation / negation / atomic number
        ("[C,N:1]O", "[C:1]S"),
        ("[!O:1]O", "[C:1]N"),
        ("[#6:1][O:2]", "[C:1]=[O:2]"),
        # r8 fuzz regressions: a pattern whose last atom sits inside a
        # branch (trailing ')' outside the splice window) must decline
        # the splice, and a template that rebuilds the span verbatim
        # (identity product) must not key-block the graph path
        ("[C,N:1](=O)", "[C:1]"),
        ("[A:1]O", "[N:1]O"),
        # ring-forming / ring-opening / heavy-deletion shapes (fuzzed at
        # 31k checks in r8, clean; kept here as cheap regression cover)
        ("[C:1]CC[C:2]", "[C:1]1CC[C:2]1"),
        ("[C:1]1CC[C:2]1", "[C:1]CC[C:2]"),
        ("C[C:1]C", "[C:1]"),
        ("[!R:1]O[A:2]", "[C:1][C:2]"),
        # ';'-conjunct and recursive shapes (late r8)
        ("[C;!R:1]O", "[C:1]N"),
        ("[$(CO):1]O", "[N:1]O"),
        # r9 per-alternative modifier shapes ([CH2,NH]-class): the mod
        # binds to its alternative, so [C+,C:1] matches any neutral C
        # while [CH3,N:1] needs an explicit-H3 carbon OR any N
        ("[C+,C:1]O", "[C:1]P"),
        ("[CH3,N:1]", "[C:1]O"),
        ("[O-,OH,O:1]C", "[N:1]C"),
    ):
        composed = {canonical_form(p) for p in apply_reaction(s, pat, tpl)}
        graph_only = {canonical_form(p) for p in _apply_graph(s, pat, tpl, set())}
        assert composed == graph_only, f"{pat}>>{tpl}"


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=200),
)
@settings(max_examples=10, deadline=None)
def test_pack_and_chunk_covers_stream_exactly(spark, sizes, budget):
    """Packing invariants under random token counts and budgets: per
    shard the offsets tile the stream with no gap or overlap, and every
    document's chunk span contains exactly its own tokens."""
    from omics_data_integration_utilities_spark.operators.sampling import pack_and_chunk

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n long"
    )
    rows = sorted(
        (r["shard"], r["doc_id"], r["token_count"], r["tok_offset"],
         r["chunk_first"], r["chunk_last"])
        for r in pack_and_chunk(df, "doc_id", "n", budget=budget, n_shards=2).collect()
    )
    nxt: dict = {}
    for shard, _doc, n, off, cf, cl in rows:
        assert off == nxt.get(shard, 0)          # no gap, no overlap
        nxt[shard] = off + n
        assert cf == off // budget
        assert cl == max((off + n - 1) // budget, cf)
        assert cl >= cf


@given(s=_smiles_subset(), p=_smiles_subset())
@settings(max_examples=150, deadline=None)
def test_substructure_matches_brute_force(s, p):
    """K3 independent verification: the backtracking subgraph
    monomorphism agrees with an exhaustive permutation search on small
    substrate/pattern pairs — same atom/bond predicates, structurally
    different search."""
    from itertools import permutations

    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        _atom_matches,
        _bond_ok,
        has_substructure,
        parse_graph,
    )

    try:
        sa, se = parse_graph(s)
        pa, pe = parse_graph(p)
    except ValueError:
        return
    if len(sa) > 8 or len(pa) > 5 or not pa:
        return

    def brute() -> bool:
        if len(pa) > len(sa):
            return False
        for combo in permutations(range(len(sa)), len(pa)):
            if not all(_atom_matches(pa[i], sa[combo[i]]) for i in range(len(pa))):
                continue
            if all(
                (min(combo[a], combo[b]), max(combo[a], combo[b])) in se
                and _bond_ok(lab, se[(min(combo[a], combo[b]), max(combo[a], combo[b]))])
                for (a, b), lab in pe.items()
            ):
                return True
        return False

    assert has_substructure(s, p) == brute()


@given(s=_smiles_subset())
@settings(max_examples=100, deadline=None)
def test_rewrite_conserves_atom_counts(s):
    """Chemical bookkeeping: every product has exactly |substrate| minus
    the rule's deleted atoms plus its inserted atoms — no rewrite path
    may drop or duplicate atoms."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        apply_reaction,
        parse_graph,
    )

    try:
        sa, _ = parse_graph(s)
    except ValueError:
        return
    for pat, tpl, ndel, nins in (
        ("[C:1]O", "[C:1]N", 1, 1),
        ("[C:1]O[C:2]", "[C:1][C:2]", 1, 0),
        ("[O:1]", "[O:1]C", 0, 1),
        ("Cl", "O", 1, 1),
    ):
        for prod in apply_reaction(s, pat, tpl):
            pa2, _ = parse_graph(prod)
            assert len(pa2) == len(sa) - ndel + nins, (pat, tpl, prod)


@given(a=_smiles_subset(), b=_smiles_subset())
@settings(max_examples=100, deadline=None)
def test_canonical_form_coincides_with_isomorphism(a, b):
    """Soundness AND completeness of the molecule identity: two small
    molecules share a canonical form IFF their graphs are isomorphic
    (brute-force permutation check) — a false collision would silently
    drop real reaction products, a false split would emit duplicates."""
    from itertools import permutations

    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        canonical_form,
        parse_graph,
    )

    try:
        aa, ae = parse_graph(a)
        ba, be = parse_graph(b)
    except ValueError:
        return
    if len(aa) > 6 or len(ba) > 6 or not aa or not ba:
        return

    def norm(lab):
        return "-" if lab in (None, "", "-") else lab

    def iso() -> bool:
        if len(aa) != len(ba) or len(ae) != len(be):
            return False
        want = {(x, y): norm(lab) for (x, y), lab in be.items()}
        for perm in permutations(range(len(aa))):
            if any(aa[i].raw != ba[perm[i]].raw for i in range(len(aa))):
                continue
            mapped = {
                (min(perm[x], perm[y]), max(perm[x], perm[y])): norm(lab)
                for (x, y), lab in ae.items()
            }
            if mapped == want:
                return True
        return False

    assert (canonical_form(a) == canonical_form(b)) == iso()


# ------------------------- query-primitive matching (r8 widened grammar) --

_QUERY_PRIMS = [
    "C", "N", "O", "S", "c", "n", "Cl", "Br", "*",
    "#6", "#7", "#8", "#1", "#16", "a", "A",
]

_NUM_TO_SYM = {1: "H", 6: "C", 7: "N", 8: "O", 16: "S", 17: "Cl", 35: "Br"}


def _ref_prim_pred(p: str, elem: str, aromatic: bool) -> bool:
    """Independent restatement of SMARTS primitive semantics (Daylight
    theory manual): element symbols carry aromaticity, #n atomic numbers
    do not, a/A are the aromatic/aliphatic wildcards, * matches
    anything."""
    if p == "*":
        return True
    if p.startswith("#"):
        sym = elem if len(elem) > 1 else elem.upper()
        return _NUM_TO_SYM.get(int(p[1:])) == sym
    if p == "a":
        return aromatic
    if p == "A":
        return not aromatic
    return p.upper() == elem.upper() and p.islower() == aromatic


@st.composite
def _query_bracket(draw):
    """A random query bracket: alternation of 2-3 primitives, negation
    of 1-2, or a single #n."""
    form = draw(st.integers(min_value=0, max_value=2))
    if form == 0:
        prims = draw(st.lists(st.sampled_from(_QUERY_PRIMS), min_size=2, max_size=3, unique=True))
        return "[" + ",".join(prims) + "]", ("alt", prims)
    if form == 1:
        prims = draw(st.lists(st.sampled_from(_QUERY_PRIMS), min_size=1, max_size=2, unique=True))
        return "[" + "".join("!" + p for p in prims) + "]", ("neg", prims)
    p = draw(st.sampled_from([q for q in _QUERY_PRIMS if q.startswith("#")]))
    return f"[{p}]", ("alt", [p])


@given(s=_smiles_subset(), qb=_query_bracket())
@settings(max_examples=300, deadline=None)
def test_query_bracket_matches_exhaustive_single_atom(s, qb):
    """has_substructure with a single-atom query pattern must equal the
    EXHAUSTIVE scan: some atom of the molecule satisfies the primitive
    predicate (restated independently above) — alternation = any-of,
    negation = none-of."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        parse_graph,
    )

    pattern, (kind, prims) = qb
    try:
        atoms, _ = parse_graph(s)
    except ValueError:
        return

    def atom_ok(a):
        hits = any(_ref_prim_pred(p, a.elem, a.aromatic) for p in prims)
        return hits if kind == "alt" else not hits

    want = any(atom_ok(a) for a in atoms)
    assert has_substructure(s, pattern) == want


_MOD_ALT_ITEMS = [
    # (item text, prim, hcount, charge) — per-alternative modifier forms;
    # a leading '!' negates the item's PRIMITIVE only (Daylight binding)
    ("CH3", "C", 3, None),
    ("CH2", "C", 2, None),
    ("NH", "N", 1, None),
    ("NH2", "N", 2, None),
    ("OH", "O", 1, None),
    ("O-", "O", None, -1),
    ("N+", "N", None, 1),
    ("C", "C", None, None),
    ("O", "O", None, None),
    ("#7", "#7", None, None),
    ("a", "a", None, None),
    ("!C", "!C", None, None),
    ("!NH", "!N", 1, None),
    ("!O-", "!O", None, -1),
    ("!#6", "!#6", None, None),
]


@st.composite
def _mod_alt_bracket(draw):
    """An alternation bracket where alternatives may carry their own
    H-count/charge modifiers ([CH2,NH] — the r9 grammar extension)."""
    items = draw(
        st.lists(st.sampled_from(_MOD_ALT_ITEMS), min_size=2, max_size=3,
                 unique_by=lambda t: t[0])
    )
    return "[" + ",".join(t[0] for t in items) + "]", items


@given(
    s=_smiles_subset(),
    prims=st.lists(st.sampled_from(_QUERY_PRIMS), min_size=1, max_size=2, unique=True),
    mod=st.sampled_from(["H1", "H2", "H3", "+", "-", "H3+", ""]),
)
@settings(max_examples=300, deadline=None)
def test_neg_bracket_trailing_mods_daylight_semantics(s, prims, mod):
    """Daylight precedence for negation brackets with trailing mods
    ([!CH3], [!O-] — r9): '!' binds exactly ONE primitive, so the
    pattern means (no listed primitive matches) AND (the explicit
    H-count/charge mods hold) — NOT a negation of (prim AND mods).
    Independent exhaustive scan restating that precedence."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        parse_graph,
    )

    pattern = "[" + "".join("!" + p for p in prims) + mod + "]"
    try:
        atoms, _edges = parse_graph(s)
    except ValueError:
        return

    h = None
    chg = None
    mh = __import__("re").match(r"(H(\d*))?([+-])?$", mod)
    if mh.group(1):
        h = int(mh.group(2)) if mh.group(2) else 1
    if mh.group(3):
        chg = 1 if mh.group(3) == "+" else -1

    def atom_ok(a):
        if any(_ref_prim_pred(p, a.elem, a.aromatic) for p in prims):
            return False
        if h is not None and a.hcount != h:
            return False
        return chg is None or (a.charge or 0) == chg

    want = any(atom_ok(a) for a in atoms)
    assert has_substructure(s, pattern) == want, pattern


@given(s=_smiles_subset(), mb=_mod_alt_bracket())
@settings(max_examples=300, deadline=None)
def test_mod_alternation_matches_exhaustive_single_atom(s, mb):
    """Per-alternative modifiers: [CH2,NH] matches an atom iff SOME
    alternative's primitive AND its own H/charge modifiers all hold —
    the modifier binds to its alternative, not the whole bracket.
    Exhaustive independent scan over every substrate atom (explicit-H
    semantics: an H modifier requires the substrate atom's EXPLICIT
    hcount to equal it, matching the engine's no-implicit-valence
    model; charge compares against 0 when unwritten)."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        parse_graph,
    )

    pattern, items = mb
    try:
        atoms, _ = parse_graph(s)
    except ValueError:
        return

    def alt_ok(a, prim, h, chg):
        hit = _ref_prim_pred(prim.lstrip("!"), a.elem, a.aromatic)
        if prim.startswith("!"):
            hit = not hit
        if not hit:
            return False
        if h is not None and a.hcount != h:
            return False
        return chg is None or (a.charge or 0) == chg

    want = any(
        any(alt_ok(a, prim, h, chg) for _, prim, h, chg in items)
        for a in atoms
    )
    assert has_substructure(s, pattern) == want


@given(s=_smiles_subset(), qb=_query_bracket())
@settings(max_examples=300, deadline=None)
def test_query_bracket_matches_exhaustive_edge(s, qb):
    """Two-atom pattern `[query]-C`: the engine verdict must equal the
    exhaustive scan over every substrate bond in both orientations —
    one endpoint satisfying the query predicate, the other an aliphatic
    carbon, joined by a single (or any-ring) bond."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        parse_graph,
    )

    pattern, (kind, prims) = qb
    try:
        atoms, edges = parse_graph(s)
    except ValueError:
        return

    def atom_ok(a):
        hits = any(_ref_prim_pred(p, a.elem, a.aromatic) for p in prims)
        return hits if kind == "alt" else not hits

    def is_c(a):
        return a.elem == "C" and not a.aromatic

    want = any(
        lab in (None, "-")
        and ((atom_ok(atoms[i]) and is_c(atoms[j])) or (atom_ok(atoms[j]) and is_c(atoms[i])))
        for (i, j), lab in edges.items()
    )
    assert has_substructure(s, pattern + "C") == want


@given(s=_smiles_subset())
@settings(max_examples=300, deadline=None)
def test_ring_membership_matches_bruteforce(s):
    """The engine's per-atom in_ring flag (Tarjan bridge analysis inside
    parse_graph, backing the [R]/[!R] primitives) must equal the
    brute-force definition: an atom is in a ring iff it has an incident
    edge whose removal leaves its endpoints still connected."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        parse_graph,
    )

    try:
        atoms, edges = parse_graph(s)
    except ValueError:
        return

    def connected_without(a, b, skip):
        seen = {a}
        frontier = [a]
        while frontier:
            u = frontier.pop()
            if u == b:
                return True
            for (x, y) in edges:
                if (x, y) == skip:
                    continue
                if x == u and y not in seen:
                    seen.add(y)
                    frontier.append(y)
                elif y == u and x not in seen:
                    seen.add(x)
                    frontier.append(x)
        return False

    cyclic_edges = {e for e in edges if connected_without(e[0], e[1], e)}
    want = [any(i in e for e in cyclic_edges) for i in range(len(atoms))]
    got = [a.in_ring for a in atoms]
    assert got == want
    assert has_substructure(s, "[R]") == any(want)
    assert has_substructure(s, "[!R]") == (not all(want) and len(atoms) > 0)


@given(s=_smiles_subset())
@settings(max_examples=300, deadline=None)
def test_ring_counts_match_independent_min_basis(s):
    """r10 [R<n>] ring counts: the engine's per-atom canonical-minimum-
    cycle-basis counts (rooted-DFS cycle enumeration + int-bitmask GF(2)
    greedy inside parse_graph) must equal an INDEPENDENT reconstruction:
    cycles enumerated by per-edge simple-path search, eliminated by
    frozenset-symmetric-difference Gaussian reduction, selected under
    the same canonical (length, sorted-atom-indices) order.  Also pins
    in_ring == (count > 0) and the [R0]/[R1]/[R2] bracket verdicts."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        _ensure_ring_counts,
        has_substructure,
        parse_graph,
    )

    try:
        atoms, edges = parse_graph(s)
    except ValueError:
        return
    _ensure_ring_counts(atoms, edges)  # lazy fill (matcher chokepoint)

    adj: dict[int, list[int]] = {i: [] for i in range(len(atoms))}
    for (a, b) in edges:
        adj[a].append(b)
        adj[b].append(a)

    # independent enumeration: every simple cycle = a simple u→v path
    # plus the edge (u,v), deduped by its edge set
    seen_cycles: dict[frozenset, tuple] = {}
    for (u, v) in edges:
        stack = [(u, (u,))]
        while stack:
            node, path = stack.pop()
            if node == v:
                if len(path) >= 3:
                    es = frozenset(
                        (min(a, b), max(a, b)) for a, b in zip(path, path[1:])
                    ) | {(min(u, v), max(u, v))}
                    seen_cycles.setdefault(es, tuple(sorted(set(path))))
                continue
            for w in adj[node]:
                if node == u and w == v and len(path) == 1:
                    continue  # that IS the closing edge
                if w in path:
                    continue
                stack.append((w, path + (w,)))

    # canonical greedy over frozenset-XOR Gaussian reduction
    order = sorted(
        seen_cycles.items(), key=lambda kv: (len(kv[0]), kv[1])
    )
    pivots: dict[tuple, frozenset] = {}
    want = [0] * len(atoms)
    for es, atoms_of in order:
        m = es
        while m:
            h = max(m)
            if h in pivots:
                m = m ^ pivots[h]
            else:
                pivots[h] = m
                break
        if not m:
            continue
        for i in atoms_of:
            want[i] += 1

    got = [a.ring_count for a in atoms]
    assert got == want, f"{s}: engine {got} != independent {want}"
    assert [a.in_ring for a in atoms] == [c > 0 for c in want]
    for k in (0, 1, 2):
        assert has_substructure(s, f"[R{k}]") == any(c == k for c in want)


@given(
    s=_smiles_subset(),
    prims=st.lists(st.sampled_from(_QUERY_PRIMS), min_size=2, max_size=3, unique=True),
    neg_form=st.booleans(),
    conj=st.sampled_from([";R", ";!R", ";a", ";A", ";R;A"]),
)
@settings(max_examples=300, deadline=None)
def test_list_conjunct_matches_exhaustive(s, prims, neg_form, conj):
    """r9 list-level ';'-conjuncts: [C,N;R] / [!C!N;R] match an atom iff
    the OR/none-of list verdict AND every conjunct hold.  Exhaustive
    independent scan with brute-force ring membership (an atom is in a
    ring iff it touches an edge whose removal leaves its endpoints
    connected) — fully independent of the engine's Tarjan analysis."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        parse_graph,
    )

    try:
        atoms, edges = parse_graph(s)
    except ValueError:
        return

    def connected_without(a, b, skip):
        seen = {a}
        frontier = [a]
        while frontier:
            u = frontier.pop()
            if u == b:
                return True
            for (x, y) in edges:
                if (x, y) == skip:
                    continue
                if x == u and y not in seen:
                    seen.add(y)
                    frontier.append(y)
                elif y == u and x not in seen:
                    seen.add(x)
                    frontier.append(x)
        return False

    cyclic_edges = {e for e in edges if connected_without(e[0], e[1], e)}
    in_ring = [any(i in e for e in cyclic_edges) for i in range(len(atoms))]

    if neg_form:
        pattern = "[" + "".join("!" + p for p in prims) + conj + "]"
    else:
        pattern = "[" + ",".join(prims) + conj + "]"

    def conj_ok(i, a):
        for t in conj.lstrip(";").split(";"):
            want = not t.startswith("!")
            t = t.lstrip("!")
            v = in_ring[i] if t == "R" else (a.aromatic if t == "a" else not a.aromatic)
            if v != want:
                return False
        return True

    def atom_ok(i, a):
        hits = any(_ref_prim_pred(p, a.elem, a.aromatic) for p in prims)
        base = (not hits) if neg_form else hits
        return base and conj_ok(i, a)

    want = any(atom_ok(i, a) for i, a in enumerate(atoms))
    assert has_substructure(s, pattern) == want, pattern


@given(s=_smiles_subset())
@settings(max_examples=250, deadline=None)
def test_nested_recursive_bracket_matches_bruteforce(s):
    """Nested recursive SMARTS: [$([$(CO)]N)] anchors at an atom x
    iff x itself anchors a C–O embedding (x is an aliphatic C with an O
    neighbor, any bond) AND x has an aliphatic-N neighbor — restated
    here directly from the adjacency, independent of the engine's
    recursive anchor machinery.  The depth-3 spelling
    [$([$([$(C)]O)]N)] is semantically identical ([$(C)] = an aliphatic
    C, so [$([$(C)]O)] = C single-bonded to aliphatic O = [$(CO)]) and
    must agree with the same reconstruction (r10: the depth bound is
    _MAX_REC_NESTING = 8; r9 shipped 2).  Also pins the bound: depth-9
    nesting must raise while depth-8 parses."""
    import pytest

    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        parse_graph,
    )

    try:
        atoms, edges = parse_graph(s)
    except ValueError:
        return

    # single-bond adjacency only: a bare pattern bond means single, so
    # CO must NOT anchor at C=O (Daylight default-bond semantics)
    adj: dict = {}
    for (a, b), lab in edges.items():
        if lab in (None, "-"):
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)

    def is_elem(i, sym):
        return atoms[i].elem == sym and not atoms[i].aromatic

    def anchors_co(i):
        return is_elem(i, "C") and any(is_elem(j, "O") for j in adj.get(i, []))

    want = any(
        anchors_co(i) and any(is_elem(j, "N") for j in adj.get(i, []))
        for i in range(len(atoms))
    )
    assert has_substructure(s, "[$([$(CO)]N)]") == want
    assert has_substructure(s, "[$([$([$(C)]O)]N)]") == want

    deep8 = "C"
    for _ in range(8):
        deep8 = f"[$({deep8})]"
    parse_graph(deep8)  # depth 8: inside the subset
    with pytest.raises(ValueError):
        parse_graph(f"[$({deep8})]")  # depth 9: outside


@st.composite
def _charge_bracket(draw):
    mag = draw(st.integers(min_value=1, max_value=2))
    sign = draw(st.sampled_from(["+", "-"]))
    txt = sign if mag == 1 else f"{sign}{mag}"
    return f"[{txt}]", (1 if sign == "+" else -1) * mag


@given(s=_smiles_subset(), cb=_charge_bracket())
@settings(max_examples=200, deadline=None)
def test_charge_bracket_matches_exhaustive(s, cb):
    """Elem-less charge queries: [+]/[-]/[+2] match exactly the atoms
    carrying that formal charge (neutral atoms count as charge 0)."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        parse_graph,
    )

    pattern, chg = cb
    try:
        atoms, _ = parse_graph(s)
    except ValueError:
        return
    want = any((a.charge or 0) == chg for a in atoms)
    assert has_substructure(s, pattern) == want


@given(s=_smiles_subset(), sp=_smiles_subset())
@settings(max_examples=150, deadline=None)
def test_recursive_bracket_matches_brute_force(s, sp):
    """Recursive [$(SP)] against an independent exhaustive anchored
    search: the anchor set is every substrate atom x such that SOME
    injective bond-preserving mapping sends SP's first atom to x —
    computed here by raw permutation enumeration, not the engine's
    candidate-pruned backtracking."""
    from itertools import permutations

    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        _atom_matches,
        _bond_ok,
        has_substructure,
        parse_graph,
    )

    try:
        sa, se = parse_graph(s)
        pa, pe = parse_graph(sp)
    except ValueError:
        return
    if len(sa) > 7 or len(pa) > 4 or not pa:
        return

    anchors = set()
    if len(pa) <= len(sa):
        for combo in permutations(range(len(sa)), len(pa)):
            if not all(_atom_matches(pa[i], sa[combo[i]]) for i in range(len(pa))):
                continue
            if all(
                (min(combo[a], combo[b]), max(combo[a], combo[b])) in se
                and _bond_ok(lab, se[(min(combo[a], combo[b]), max(combo[a], combo[b]))])
                for (a, b), lab in pe.items()
            ):
                anchors.add(combo[0])

    assert has_substructure(s, f"[$({sp})]") == (len(anchors) > 0)
    assert has_substructure(s, f"[!$({sp})]") == (len(anchors) < len(sa))


@given(s=_smiles_subset(), p=_smiles_subset(), data=st.data())
@settings(max_examples=200, deadline=None)
def test_stereo_decoration_never_changes_verdict(s, p, data):
    """Random tetrahedral decoration of a pattern's bracket atoms is
    match-invariant (parse-and-ignore = RDKit useChirality=False), and
    strip_stereo recovers the plain pattern exactly."""
    import re

    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        strip_stereo,
    )

    marks = iter(
        data.draw(
            st.lists(
                st.sampled_from(
                    # extended chirality classes strip like @/@@ (late
                    # r10), including the @OH-vs-@+H-count trap and
                    # two-digit class ids
                    ["", "@", "@@", "@TH1", "@AL2", "@SP3", "@TB13",
                     "@OH1", "@OH30"]
                ),
                min_size=16,
                max_size=16,
            )
        )
    )
    decorated = re.sub(
        r"\[([A-Z][a-z]?|[a-z])",
        lambda m: "[" + m.group(1) + next(marks, ""),
        p,
    )
    assert strip_stereo(decorated) == p
    assert has_substructure(s, decorated) == has_substructure(s, p)


@given(s=_smiles_subset(), p=_smiles_subset(), data=st.data())
@settings(max_examples=100, deadline=None)
def test_out_of_range_chirality_ids_decline_conservatively(s, p, data):
    """An OUT-OF-RANGE extended chirality id (@TH3, @SP9, @TB21, @OH31,
    @AL5...) is not valid Daylight SMARTS: strip_stereo must fall back
    to bare-@ stripping (never half-consume a shorter valid class — the
    r10-ADVICE partial-strip bug), leaving a class residue the bracket
    parser rejects, so the decorated pattern DECLINES (verdict False)
    rather than silently matching something."""
    import re

    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        strip_stereo,
    )

    bad = data.draw(
        st.sampled_from(
            ["@TH3", "@TH12", "@AL5", "@SP4", "@TB21", "@TB99",
             "@OH31", "@OH99", "@SP31"]
        )
    )
    # decorate the FIRST bracket atom only (one poisoned atom is enough
    # to invalidate the whole pattern)
    decorated, n = re.subn(
        r"\[([A-Z][a-z]?|[a-z])", "[" + "\\1" + bad, p, count=1
    )
    if n == 0:
        return  # pattern had no bracket atom to poison
    stripped = strip_stereo(decorated)
    # the class token must survive bare-@ stripping as a residue...
    assert bad[1:] in stripped
    # ...and the poisoned pattern must decline, never match
    assert has_substructure(s, decorated) is False


# ---- bond expressions: independent-evaluator parity (late r10) ----

_BEXPR_PRIMS = ["-", "=", "#", ":", "~", "@", "/"]


@st.composite
def _bond_expr(draw):
    """A random RAW Daylight bond expression: 1-2 ';'-terms, each 1-3
    ','-alternatives, each 1-2 optionally-negated factors joined by '&'
    or by ADJACENCY (the implicit high-precedence AND)."""
    def factor():
        neg = "!" if draw(st.booleans()) else ""
        return neg + draw(st.sampled_from(_BEXPR_PRIMS))

    def and_term():
        k = draw(st.integers(min_value=1, max_value=2))
        parts = [factor()]
        for _ in range(k - 1):
            joiner = draw(st.sampled_from(["&", ""]))
            parts.append(joiner + factor())
        return "".join(parts)

    def or_term():
        k = draw(st.integers(min_value=1, max_value=3))
        return ",".join(and_term() for _ in range(k))

    k = draw(st.integers(min_value=1, max_value=2))
    return ";".join(or_term() for _ in range(k))


def _ref_cycle_edges(edges: dict) -> set:
    """Brute-force ring-bond set, independent of the engine's Tarjan
    bridge finder: an edge is cyclic iff its endpoints stay connected
    after removing it (BFS per edge)."""
    keys = list(edges)
    cyc = set()
    for drop in keys:
        adj: dict[int, list[int]] = {}
        for (a, b) in keys:
            if (a, b) == drop:
                continue
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        start, goal = drop
        seen = {start}
        queue = [start]
        while queue:
            cur = queue.pop()
            for nb in adj.get(cur, []):
                if nb not in seen:
                    seen.add(nb)
                    queue.append(nb)
        if goal in seen:
            cyc.add(drop)
    return cyc


def _ref_bond_expr_eval(expr: str, sb, in_ring: bool) -> bool:
    """Independent recursive-descent evaluator over the RAW expression
    text (the engine normalizes to '&' labels and splits; this walks
    the source with a cursor).  Unknown-order substrate edges (label
    None — ring closures) satisfy any order factor, positive or
    negated; '~' is order-independent truth, so '!~' stays False."""
    pos = 0
    n = len(expr)

    def fac() -> bool:
        nonlocal pos
        neg = False
        if expr[pos] == "!":
            neg = True
            pos += 1
        p = expr[pos]
        pos += 1
        if p == "@":
            v = in_ring
        elif p == "~":
            v = True
        elif sb is None:
            return True
        else:
            eq = {"/": "-", "\\": "-"}
            v = eq.get(p, p) == eq.get(sb, sb)
        return (not v) if neg else v

    def and_term() -> bool:
        nonlocal pos
        v = fac()
        while pos < n and (expr[pos] == "&" or expr[pos] in "-=#:~@/!\\"):
            if expr[pos] == "&":
                pos += 1
            v = fac() and v
        return v

    def or_term() -> bool:
        nonlocal pos
        v = and_term()
        while pos < n and expr[pos] == ",":
            pos += 1
            v = and_term() or v
        return v

    v = or_term()
    while pos < n and expr[pos] == ";":
        pos += 1
        v = or_term() and v
    return v


@given(s=_smiles_subset(), expr=_bond_expr(),
       ends=st.tuples(st.sampled_from(["C", "N", "O", "c", "*"]),
                      st.sampled_from(["C", "N", "O", "c", "*"])))
@settings(max_examples=400, deadline=None)
def test_bond_expr_matches_exhaustive_edge(s, expr, ends):
    """Two-atom pattern `A<expr>B`: the engine verdict must equal the
    exhaustive scan over every substrate edge in both orientations,
    with the expression decided by an INDEPENDENT recursive-descent
    evaluator and ring membership by an independent remove-and-reconnect
    cycle finder."""
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
        parse_graph,
    )

    ea, eb = ends
    try:
        atoms, edges = parse_graph(s)
    except ValueError:
        return
    cyc = _ref_cycle_edges(edges)

    def atom_ok(a, p):
        return _ref_prim_pred(p, a.elem, a.aromatic)

    want = any(
        _ref_bond_expr_eval(expr, lab, key in cyc)
        and (
            (atom_ok(atoms[key[0]], ea) and atom_ok(atoms[key[1]], eb))
            or (atom_ok(atoms[key[1]], ea) and atom_ok(atoms[key[0]], eb))
        )
        for key, lab in edges.items()
    )
    assert has_substructure(s, ea + expr + eb) == want, (s, expr, ends)


@given(s=_smiles_subset(), expr=_bond_expr(),
       ends=st.sampled_from(["C", "N", "O", "c", "*"]))
@settings(max_examples=300, deadline=None)
def test_closure_bond_expr_equals_inline_writing(s, expr, ends):
    """Expression-qualified ring closures (late r10): qualifying the
    CLOSURE digit must label the closure edge exactly as the same
    expression written on an INLINE bond of the identical pattern graph.

    ``{A}{expr}1CC1`` (triangle, expr on the 0-2 closure) and
    ``C1{A}{expr}C-1`` (same labeled triangle, expr inline, '-' on the
    closure both ends) are one graph — edges {A-C '-', C-C '-', A-C
    expr} — so every substrate must give the same verdict.  Also pins
    open-side vs close-side qualification equivalence:
    ``{A}{expr}1CC1`` == ``{A}1CC{expr}1``.
    """
    from omics_data_integration_utilities_spark.operators.smarts_engine import (
        has_substructure,
    )

    closure_q = f"{ends}{expr}1CC1"
    inline_q = f"C1{ends}{expr}C-1"
    close_side = f"{ends}1CC{expr}1"
    got = has_substructure(s, closure_q)
    assert got == has_substructure(s, inline_q), (s, closure_q, inline_q)
    assert got == has_substructure(s, close_side), (s, closure_q, close_side)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=14),
        min_size=1,
        max_size=12,
    ),
    width=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=10, deadline=None)
def test_gram_novelty_matches_brute_force(spark, docs, width):
    """doc_novelty independent verification: novelty from plain Python
    sets (first-seen in doc_id order) must equal the engine's
    distinct+min-id-owner plan on random corpora, including short docs
    (NULL) and fully-duplicated ones (0.0)."""
    from omics_data_integration_utilities_spark.operators.dedup import gram_novelty

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in gram_novelty(df, "text", "doc_id", width=width).collect()
    }
    seen: set = set()
    for i, toks in enumerate(docs):
        grams = {
            " ".join(toks[j : j + width]) for j in range(len(toks) - width + 1)
        }
        novel = grams - seen
        seen |= grams
        want = (
            len(grams),
            len(novel),
            round(len(novel) / len(grams), 6) if grams else None,
        )
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


@given(
    lengths=st.lists(
        st.tuples(st.sampled_from(["s1", "s2"]), st.integers(1, 40)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_length_quantiles_match_numpy_linear(spark, lengths):
    """text_length_quantiles independent verification: Spark's exact
    percentile must agree with numpy's linear interpolation (the same
    p*(n-1) rule DuckDB's quantile_cont uses) on random groups."""
    import numpy as np

    from omics_data_integration_utilities_spark.operators.text import length_quantiles

    rows = [(i, grp, " ".join(["t"] * n)) for i, (grp, n) in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["grp"]: r.asDict()
        for r in length_quantiles(df, "text", "doc_id", "source").collect()
    }
    by_grp: dict = {}
    for _, (grp, n) in zip(rows, lengths):
        by_grp.setdefault(grp, []).append(n)
    for grp, ns in by_grp.items():
        r = got[grp]
        assert r["n_docs"] == len(ns)
        assert r["mean_tokens"] == round(float(np.mean(ns)), 6)
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                       (0.95, "p95"), (0.99, "p99")):
            want = round(float(np.percentile(ns, p * 100, method="linear")), 6)
            assert r[col] == want, f"{grp} {col}: {r[col]} != {want}"


@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=25
    ),
)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_duckdb_native(spark, lrows, rrows):
    """asof_join differential vs DuckDB's native ASOF LEFT JOIN on random
    (key, ts) instances — including equal-timestamp ties and keys with
    no right rows.  The right side is deduped to one row per (key, ts)
    on both engines (the operator's uniqueness contract)."""
    import duckdb

    left = spark.createDataFrame(
        [(i, k, t, float(i)) for i, (k, t) in enumerate(lrows)],
        "event_id long, k long, us long, value double",
    )
    rd = {}
    for j, (k, t) in enumerate(rrows):
        rd[(k, t)] = float(100 + j)  # last write wins = deterministic dedup
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rd.items()] or [(99, -1, 0.0)],
        "k long, us long, rv double",
    )
    from omics_data_integration_utilities_spark.operators.joins import asof_join

    got = {
        r["event_id"]: (r["matched_us"], r["matched_rv"])
        for r in asof_join(left, right, ["k"], "us", ["rv"]).collect()
    }

    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE l(event_id BIGINT, k BIGINT, us BIGINT, value DOUBLE)"
    )
    duck.executemany(
        "INSERT INTO l VALUES (?, ?, ?, ?)",
        [(i, k, t, float(i)) for i, (k, t) in enumerate(lrows)],
    )
    duck.execute("CREATE TABLE r(k BIGINT, us BIGINT, rv DOUBLE)")
    duck.executemany(
        "INSERT INTO r VALUES (?, ?, ?)",
        [(k, t, v) for (k, t), v in rd.items()] or [(99, -1, 0.0)],
    )
    want = {
        row[0]: (row[1], row[2])
        for row in duck.execute(
            "SELECT l.event_id, r.us, r.rv FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.us >= r.us"
        ).fetchall()
    }
    assert got == want


@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=20
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.booleans()),
        min_size=0,
        max_size=20,
    ),
)
@settings(max_examples=10, deadline=None)
def test_asof_join_null_values_match_duckdb_native(spark, lrows, rrows):
    """r12 regression property (the r11-advice defect class): right rows
    whose VALUE is randomly NULL — the matched row must surface its NULL
    instead of carrying an older row's value.  Differential vs DuckDB's
    native ASOF LEFT JOIN, same uniqueness contract as the base test."""
    import duckdb

    from omics_data_integration_utilities_spark.operators.joins import asof_join

    rd = {}
    for j, (k, t, isnull) in enumerate(rrows):
        rd[(k, t)] = None if isnull else float(100 + j)
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "event_id long, k long, us long",
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rd.items()] or [(99, -1, 0.0)],
        "k long, us long, rv double",
    )
    got = {
        r["event_id"]: (r["matched_us"], r["matched_rv"])
        for r in asof_join(left, right, ["k"], "us", ["rv"]).collect()
    }
    duck = duckdb.connect()
    duck.execute("CREATE TABLE l(event_id BIGINT, k BIGINT, us BIGINT)")
    duck.executemany(
        "INSERT INTO l VALUES (?, ?, ?)",
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
    )
    duck.execute("CREATE TABLE r(k BIGINT, us BIGINT, rv DOUBLE)")
    duck.executemany(
        "INSERT INTO r VALUES (?, ?, ?)",
        [(k, t, v) for (k, t), v in rd.items()] or [(99, -1, 0.0)],
    )
    want = {
        row[0]: (row[1], row[2])
        for row in duck.execute(
            "SELECT l.event_id, r.us, r.rv FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.us >= r.us"
        ).fetchall()
    }
    assert got == want


@given(
    members=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 4)), min_size=1, max_size=30
    ),
    scored=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 3)), min_size=0, max_size=30
    ),
)
@settings(max_examples=10, deadline=None)
def test_keep_best_matches_python_replica(spark, members, scored):
    """keep_best_per_component vs an independent Python replica on random
    components with STRING doc ids, duplicate score rows deduped upstream,
    and randomly missing scores — covering both r11-advice defects
    (string-id tie-break, missing-score policy) plus the all-unscored
    fallback, against the documented policy: scored beats unscored,
    highest score wins, ties to lowest id, min-id when all unscored."""
    from omics_data_integration_utilities_spark.operators.dedup import (
        keep_best_per_component,
    )

    comp_of = {f"d{m:02d}": c for m, c in members}          # unique ids
    score_of = {f"d{m:02d}": s / 4.0 for m, s in scored if f"d{m:02d}" in comp_of}
    comps = spark.createDataFrame(
        sorted(comp_of.items()), "id string, component long"
    )
    scores = spark.createDataFrame(
        sorted(score_of.items()) or [("zz", 0.0)], "doc_id string, quality double"
    )
    got = {
        r["id"]: (r["component"], r["quality"], r["keep"])
        for r in keep_best_per_component(comps, scores).collect()
    }

    # replica: per component pick (has_score desc, score desc, id asc)
    by_comp = {}
    for i, c in comp_of.items():
        by_comp.setdefault(c, []).append(i)
    want = {}
    for c, ids in by_comp.items():
        best = min(
            ids,
            key=lambda i: (score_of.get(i) is None, -(score_of.get(i) or 0.0), i),
        )
        for i in ids:
            want[i] = (c, score_of.get(i), i == best)
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.integers(0, 6), min_size=0, max_size=12),
        min_size=1,
        max_size=25,
    ),
    capacity=st.integers(2, 40),
)
@settings(max_examples=12, deadline=None)
def test_heavy_hitters_always_exact(spark, docs, capacity):
    """heavy_hitters is EXACT for any corpus and any capacity — the
    certificate only chooses between the sketch path and the groupBy
    fallback, never the answer.  Verified against a pure-Python count
    over random token streams at capacities small enough to force MG
    trims."""
    from collections import Counter

    from omics_data_integration_utilities_spark.operators.text import heavy_hitters

    rows = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    got = [
        (r["ngram"], r["n_occurrences"])
        for r in heavy_hitters(df, "text", n=2, k=5, capacity=capacity).collect()
    ]
    want = Counter()
    for toks in docs:
        toks = [f"t{t}" for t in toks]
        for i in range(len(toks) - 1):
            want[" ".join(toks[i : i + 2])] += 1
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == expect


def test_heavy_hitters_partitioning_invariant_skewed(spark):
    """Certified path under real trims: a skewed corpus (one hot phrase,
    long unique tail) at capacity 64 — the result must equal the exact
    groupBy answer and be identical at 1 and 16 partitions (candidate
    sets differ by partitioning; the recount + certificate make the
    OUTPUT partitioning-independent)."""
    from omics_data_integration_utilities_spark.operators.text import (
        heavy_hitters,
        top_ngrams,
    )

    hot = "the same boiler plate line here"
    rows = [(i, hot) for i in range(400)] + [
        (400 + i, f"u{i}a u{i}b u{i}c u{i}d") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = [
        (r["ngram"], r["n_occurrences"])
        for r in top_ngrams(df, "text", n=3, k=8).collect()
    ]
    for parts in (1, 16):
        got = [
            (r["ngram"], r["n_occurrences"])
            for r in heavy_hitters(
                df.repartition(parts), "text", n=3, k=8, capacity=64
            ).collect()
        ]
        assert got == want, f"parts={parts}"


def test_frequent_items_generic_key_types_and_nulls(spark):
    """frequent_items is the generic MG core: exact on a LONG key (the
    hot-join-key detector use), NULL keys excluded in both the sketch
    and fallback paths, certified and fallback plans agree."""
    from omics_data_integration_utilities_spark.operators.sketches import (
        frequent_items,
    )

    rows = (
        [(7,)] * 500
        + [(13,)] * 200
        + [(None,)] * 50
        + [(1000 + i,) for i in range(400)]
    )
    df = spark.createDataFrame(rows, "uid long").repartition(6)
    want = [
        (r["uid"], r["cnt"])
        for r in df.where("uid IS NOT NULL")
        .groupBy("uid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("uid").asc())
        .limit(2)
        .collect()
    ]
    assert want == [(7, 500), (13, 200)]
    # certified path (capacity 16 trims the unique tail; top-2 are heavy:
    # 200*17 > 1100) and fallback path (capacity 2: 200*3 < 1100) must
    # both return the exact answer
    for cap in (16, 2):
        got = [
            tuple(r)
            for r in frequent_items(
                df, "uid", k=2, capacity=cap, count_col="cnt"
            ).collect()
        ]
        assert got == want, f"capacity={cap}"


def test_frequent_items_keys_above_2_53_exact(spark):
    """64-bit keys beyond float64's exact-integer range (2^53) must
    survive the sketch verbatim: the per-partition sentinel row appends
    a NULL key, and a naive list-of-ints + [None] column coerces to
    float64, silently rounding snowflake-style ids to a NEARBY WRONG KEY
    under a still-valid certificate.  The object-dtype sentinel emit
    keeps them exact on both the certified and fallback paths."""
    from omics_data_integration_utilities_spark.operators.sketches import (
        frequent_items,
    )

    base = 2**60
    # adjacent huge ids one apart — any float64 round-trip collapses them
    hot_a, hot_b = base + 1, base + 2
    rows = (
        [(hot_a,)] * 300
        + [(hot_b,)] * 200
        + [(base + 10_000 + 2 * i,) for i in range(150)]
    )
    df = spark.createDataFrame(rows, "uid long").repartition(5)
    want = [(hot_a, 300), (hot_b, 200)]
    # capacity 16: certified sketch path (300*17 > 650); capacity 2:
    # exact-groupBy fallback — both must preserve the 64-bit keys
    for cap in (16, 2):
        got = [
            tuple(r)
            for r in frequent_items(
                df, "uid", k=2, capacity=cap, count_col="cnt"
            ).collect()
        ]
        assert got == want, f"capacity={cap}"


def test_frequent_items_key_dtype_coverage(spark):
    """The object-dtype sentinel emit must round-trip EVERY practical
    key type through Arrow unchanged — string, double, date and
    timestamp keys (the generic-key contract the hot-join-key detector
    relies on), on both the certified and fallback paths."""
    import datetime

    from omics_data_integration_utilities_spark.operators.sketches import (
        frequent_items,
    )

    cases = [
        ("string", ["hot", "warm"], [f"cold{i}" for i in range(120)]),
        ("double", [1.5, -2.25], [1000.0 + i for i in range(120)]),
        (
            "date",
            [datetime.date(2026, 1, 1), datetime.date(2026, 1, 2)],
            [datetime.date(2000, 1, 1) + datetime.timedelta(days=i) for i in range(120)],
        ),
        (
            "timestamp",
            [
                datetime.datetime(2026, 1, 1, 12, 0, 0),
                datetime.datetime(2026, 1, 2, 12, 0, 30),
            ],
            [
                datetime.datetime(2000, 1, 1) + datetime.timedelta(hours=i)
                for i in range(120)
            ],
        ),
    ]
    for typ, hot, tail in cases:
        rows = [(hot[0],)] * 90 + [(hot[1],)] * 60 + [(t,) for t in tail]
        df = spark.createDataFrame(rows, f"k {typ}").repartition(4)
        want = [(hot[0], 90), (hot[1], 60)]
        for cap in (16, 2):  # certified sketch / exact fallback
            got = [
                tuple(r)
                for r in frequent_items(
                    df, "k", k=2, capacity=cap, count_col="cnt"
                ).collect()
            ]
            assert got == want, f"type={typ} capacity={cap}: {got}"


def test_frequent_items_weight_dtype_contract(spark):
    """The integral-weight contract is ENFORCED: a float weight column
    raises TypeError at plan time (it would otherwise be silently
    truncated per-candidate, corrupting masses AND the certificate);
    negative integral weights raise inside the sketch."""
    import pytest as _pytest

    from omics_data_integration_utilities_spark.operators.sketches import (
        frequent_items,
    )

    fdf = spark.createDataFrame([(1, 1.5), (2, 2.0)], "key long, w double")
    with _pytest.raises(TypeError, match="integral type"):
        frequent_items(fdf, "key", k=1, weight_col="w")
    ndf = spark.createDataFrame([(1, 5), (2, -3)], "key long, w long")
    with _pytest.raises(Exception, match="non-negative"):
        frequent_items(ndf, "key", k=1, capacity=4, weight_col="w").collect()


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    ),
    capacity=st.integers(2, 30),
)
@settings(max_examples=10, deadline=None)
def test_frequent_items_weighted_always_exact(spark, rows, capacity):
    """Weighted MG is exact for any weights and any capacity: top-3 keys
    by SUM(weight) must equal the brute-force answer (a weight-w arrival
    is w unit arrivals, so the unit-mass bound carries over)."""
    from collections import Counter

    from omics_data_integration_utilities_spark.operators.sketches import (
        frequent_items,
    )

    df = spark.createDataFrame(rows, "key long, w long").repartition(4)
    got = [
        tuple(r)
        for r in frequent_items(
            df, "key", k=3, capacity=capacity, count_col="mass", weight_col="w"
        ).collect()
    ]
    want = Counter()
    for key, w in rows:
        want[key] += w
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 100)),
        min_size=1,
        max_size=60,
    ),
    n_salts=st.integers(2, 9),
    threshold=st.sampled_from([0.0, 0.05, 0.3, 0.9]),
)
@settings(max_examples=10, deadline=None)
def test_skew_aware_join_routing_invariant(spark, rows, n_salts, threshold):
    """skew_aware_join == plain join for ANY key distribution, salt
    count and hotness threshold (the threshold only moves keys between
    the salted and plain branches — never changes the result)."""
    from omics_data_integration_utilities_spark.operators.skew import (
        skew_aware_join,
    )

    left = spark.createDataFrame(rows, "k long, payload long").repartition(3)
    right = spark.createDataFrame(
        [(k, f"v{k}") for k in range(0, 5)], "k long, v string"
    )
    got = sorted(
        tuple(r)
        for r in skew_aware_join(
            left, right, ["k"], n_salts=n_salts, hot_threshold=threshold
        ).collect()
    )
    want = sorted(tuple(r) for r in left.join(right, ["k"]).collect())
    assert got == want


@given(
    train_docs=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=10),
        min_size=1,
        max_size=12,
    ),
    test_docs=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=10),
        min_size=1,
        max_size=5,
    ),
)
@settings(max_examples=10, deadline=None)
def test_contamination_report_matches_bruteforce(spark, train_docs, test_docs):
    """contamination_report == a pure-Python recount for ANY corpus:
    per-test distinct-gram overlap counting, worst offender by (shared
    desc, id asc), zeros + NULL offender for clean docs."""
    from omics_data_integration_utilities_spark.operators.text import (
        contamination_report,
    )

    def grams(toks, n=3):
        toks = [f"t{t}" for t in toks]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    train_rows = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(train_docs)]
    test_rows = [
        (100 + i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(test_docs)
    ]
    tr = spark.createDataFrame(train_rows, "doc_id long, text string").repartition(3)
    te = spark.createDataFrame(test_rows, "doc_id long, text string")
    got = {
        r["test_id"]: (r["n_train_docs"], r["worst_train_id"], r["worst_shared"])
        for r in contamination_report(tr, te, "text", "doc_id", n=3).collect()
    }
    want = {}
    tg = {i: grams(toks) for i, toks in enumerate(train_docs)}
    for i, toks in enumerate(test_docs):
        qg = grams(toks)
        overlaps = {tid: len(qg & g) for tid, g in tg.items() if qg & g}
        if overlaps:
            worst = min(overlaps, key=lambda t: (-overlaps[t], t))
            want[100 + i] = (len(overlaps), worst, overlaps[worst])
        else:
            want[100 + i] = (0, None, 0)
    assert got == want
