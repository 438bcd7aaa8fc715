"""Pure-Python structural reaction engine for a SMARTS/SMILES subset —
the K1 chemistry kernel slot without RDKit (SURVEY §2 K1; reference
``integrative_omics/gizmos.py:193-234`` generate_virtual_molecule /
RunReactant).

The reference applies a reaction (pattern ``>>`` product template, atom
maps linking the two sides) to a substrate molecule and collects the
DISTINCT products, one per embedding site.  This module restates that
structurally — parse the substrate into an atom token stream, find every
embedding of the pattern's atom sequence, rewrite the matched span from
the product template (atom-map aware), serialize — instead of the string
regexp rewrite the default JVM kernel uses.  It is intentionally a
SUBSET engine; the honest scope is:

- **Substructure matching** (:func:`has_substructure`) is a real graph
  embedding: substrate and pattern parse into atoms + bonds (branch
  parentheses and ring closures build edges), and a backtracking
  subgraph-monomorphism search finds the pattern wherever it sits in
  the tree — branched patterns match in any branch order, and chain
  patterns match across a substrate branch point.
- **Rewrite patterns** (:func:`apply_reaction`): two engines compose.
  The LINEAR splice rewrites embeddings that are consecutive token runs
  with identical bond text, with branched patterns matched in every
  branch-order linearization (``[C:1](=O)[OH]`` finds an acid written
  ``C(=O)O`` *or* ``C(O)=O``) — it owns the simple cases so the
  substrate's own writing survives.  The GRAPH writer
  (:func:`_apply_graph`) rewrites every other embedding the subgraph
  matcher finds — substrate-branch-interrupted spans, matches across
  ring closures, ring-forming templates, deletions/insertions at span
  boundaries with external bonds — with RunReactants deletion and
  attachment semantics, re-serialized via :func:`serialize_graph`.  A
  differential property (tests/test_properties.py) locks the two to
  the same molecule sets on their shared domain.
- **Atom matching**: element + aromaticity must agree (``*`` matches
  any); explicit H-count and charge constraints must agree when the
  pattern specifies them; connectivity/valence specs (``&X3``/``&v4``)
  are IGNORED, exactly as the reference's own
  ``remove_valence_from_smarts`` strips them (gizmos.py:237-239).
  Query primitives (pattern-side only): atomic numbers ``[#6]``
  (aromaticity-agnostic), any-aromatic/any-aliphatic ``[a]`` / ``[A]``,
  ring membership ``[R]`` / ``[!R]``, elem-less charge ``[+]`` / ``[-]``
  / ``[+2]``, recursive environments ``[$(C=O)]`` / ``[!$(CO)]`` (nesting to
  depth 8 since r10, depth 2 in r9; anchor = the sub-pattern's first
  atom), alternation of
  primitives ``[C,N]`` / ``[#6,#7]`` / ``[a,Cl]`` — each alternative
  optionally carrying its OWN H-count/charge modifiers (``[CH2,NH]``,
  ``[O-,OH]``; r9) — negation
  ``[!O]`` / ``[!#1]`` / ``[!C!N]`` (none may match; Daylight
  precedence — ``!`` binds ONE primitive, so trailing H/charge mods
  AND with the none-of verdict: ``[!CH3]`` = not-carbon WITH 3
  explicit H, ``[!O-]`` = not-oxygen carrying −1; r9), and
  ``;``-conjuncts on concrete atoms (``[C;R]`` / ``[c;!R]``; ``;`` and
  ``&`` are both AND for H/charge/X/v mods) AND on whole
  alternation/negation lists (``[C,N;R]`` / ``[!C!N;R]`` — SMARTS
  precedence: ``,`` binds tighter than ``;``; r9).  Recursive
  environments nest to ``_MAX_REC_NESTING`` = 8 levels
  (``[$([$(CO)]N)]``, ``[$([$([$(C)]O)]N)]``; depth 2 r9, generalized
  r10 — the matcher was always depth-generic, each level one capped
  sub-search, cost linear in depth).  An
  alternation item may negate its primitive (``[C,!N]`` — ``!`` binds
  the item's one primitive; r9).  Ring COUNTS ``[R1]`` / ``[R2]`` /
  ``[R0]`` (standalone, conjunct ``[c;R1]``, or negated ``[!R2]``;
  r10): an atom matches ``R<n>`` iff it lies in exactly ``n`` rings of
  a canonical minimum cycle basis — the SSSR notion RDKit's
  ``NumAtomRings`` implements — computed per molecule as: enumerate
  every simple cycle, sort by (length, sorted atom indices), greedily
  keep the GF(2)-independent ones (a matroid greedy, so the selection
  is a true minimum cycle basis; the length-tie ORDER is this engine's
  canonical choice, the same caveat RDKit's own SSSR carries on
  degenerate symmetric ring systems).  ``[R0]`` ≡ ``[!R]``.  The
  enumeration is LAZY (first ringcount-carrying pattern matched against
  the molecule; no-[R<n>] workloads never pay it) and carries a step
  budget: a pathological fused mega-system past the budget leaves
  counts undefined, and a ring-count query against it gets the same
  outside-subset verdict as a parse failure (``has_substructure`` →
  False, rewrites → no products; internally :class:`RingCountBudget`),
  while bare ``[R]``/``[!R]`` still work from bridge analysis.  Stereo
  marks (r10) are IGNORED at match time — exactly RDKit's default
  ``useChirality=False`` substructure/reaction matching, which is how
  the reference calls it: pattern-side tetrahedral ``@``/``@@`` strips
  before parsing (:func:`strip_stereo`), and directional ``/`` ``\\``
  bond marks — accepted by BOTH parsers as labels, so every side's
  writing survives into products — compare equal to the single bond
  they decorate (:func:`_bond_ok`).  Bond QUERY
  expressions in PATTERN bond position (late r10) cover the full
  Daylight bond grammar: primitives ``-``/``=``/``#``/``:``/``/``/
  ``\\``/``~`` (any bond) and ``@`` (non-bridge = RDKit ``IsInRing``
  membership; ``C@C`` finds a ring C–C bond), combined with ``!``
  negation > ``&``/ADJACENCY (high AND — ``=@`` ≡ ``=&@``) > ``,``
  (OR) > ``;`` (low AND): ``C!@Cl`` an acyclic C–Cl, ``-,=``
  single-or-double, ``=;@`` a double ring bond, ``!=`` not-double —
  including inside recursive environments.  Substrate ring-CLOSURE
  edges keep their order-wildcard semantics (they satisfy any
  satisfiable order constraint; ring primitives consult real
  membership, and ``!~`` never matches).  A query bond between
  two mapped atoms kept bonded by a product template DECLINES the
  rewrite (RDKit preserves the matched bond there; overwriting with
  the template's written bond would be a silently different product).
  Bond expressions also qualify pattern RING CLOSURES (late r10):
  ``C-,=1CCCC1`` / ``C~1ccccc1`` / ``c:1ccccc1`` parse with the
  expression as the closure edge's label, evaluated by the same
  compiled machinery (a pattern closure matched onto an UNQUALIFIED
  substrate closure edge meets the order-wildcard rule above — any
  satisfiable order constraint passes); closure bonds written on BOTH
  digits must agree textually (``C-1CCCC=1`` is RDKit's closure-bond
  mismatch error; an equivalent-but-reordered query pair declines
  conservatively).  Extended chirality classes (``@TH1``/``@AL2``/
  ``@SP3``/``@TB13``/``@OH30``…) on PATTERN atoms strip as whole
  tokens like ``@``/``@@`` (late r10 — the same useChirality=False
  default; ``[C@OH1]`` is octahedral-class-1, not ``@``+H-count).
  MOLECULE-side tetrahedral marks and query bonds,
  double bond negation (``!!=``), and recursion past
  depth 8 remain OUTSIDE the subset; a
  product template carrying a query primitive yields no products
  (nothing concrete to write — RDKit errors on such templates).
  Molecule-side stereo is moreover OUT OF SCOPE at the reference's
  operating point, not merely out of subset (r11 closing measurement):
  the reference reads RetroRules rules through exactly TWO SQL entry
  points, and both filter ``isStereo=0``
  (getMassTransitions.py:85 — ``WHERE diameter=16 and isStereo=0``;
  validateRulesWithOrigins.py:50 — ``WHERE isStereo=0``); every other
  consumer (heraldPathways.py:169,647) reads the CSVs those two
  produce, inheriting the filter.  So the number of rules at the
  reference's operating point that could ever exercise
  chirality-aware matching is structurally zero — no rule with stereo
  semantics survives ingestion, and the matching RDKit would run on
  the survivors is the ``useChirality=False`` default this engine
  already implements.  Declining molecule-side ``[C@H]`` substrates
  is therefore a conservative guard against inputs the reference
  pipeline itself never produces.
- **Ring closures**: a match requires the pattern's internal ring-bond
  pairing to be reproduced inside the matched span (digit labels are
  arbitrary, the pairing topology is what must agree), and a match is
  refused if it would delete an atom whose ring bond leaves the span —
  a dangling closure is not a molecule.
- **Rewrite**: template atoms carrying an atom map inherit the matched
  substrate atom's token (and its ring closures) when the template atom
  is bare, else the template's own spec (map stripped, substrate
  closures kept); unmapped substrate atoms in the span are deleted;
  unmapped template atoms are inserted verbatim.

One product per embedding (1→N — the fan-out the regexp kernel cannot
express), deduplicated per substrate × rule like the reference's
``cur_smiles in smiles_list`` guard (gizmos.py:219-224).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache
from hashlib import md5 as _md5

import pandas as pd

_TWO_LETTER = ("Cl", "Br")
_SINGLE = set("BCNOSPFI")
_AROMATIC = set("bcnosp")
_BOND_CHARS = set("-=#:/\\.")
# pattern-side bond QUERY labels (parse_graph(..., bond_queries=True)):
# any-bond, ring-bond, not-ring-bond — one place, consulted by every
# parser guard and the rewrite decline below.  Full Daylight bond
# EXPRESSIONS (late r10: '!' negation > '&'/adjacency AND > ',' OR >
# ';' AND, e.g. '=;@' double-in-ring, '-,=' single-or-double, '!='
# not-double) are also query bonds: the normalized label carries one of
# ',&;!', which _is_query_bond covers.
_QUERY_BONDS = ("~", "@", "!@")
# primitives a bond expression may combine ('.' is a separator, never
# a primitive); '/' and '\' compare as the single bond they decorate
# (_BOND_MATCH_EQUIV), matching their plain-label treatment
_BOND_PRIMS = set("-=#:/\\~@")


def _is_query_bond(lab: str | None) -> bool:
    return lab is not None and (
        lab in _QUERY_BONDS or any(c in lab for c in ",&;!")
    )


def _parse_bond_expr(s: str, i: int) -> tuple[str, int]:
    """Parse a full Daylight bond expression at ``i`` (PATTERN side
    only): precedence ``!`` (negate a primitive) > ``&`` / adjacency
    (high AND — ``=@`` ≡ ``=&@``) > ``,`` (OR) > ``;`` (low AND).
    Returns the NORMALIZED label (implicit adjacency written out as
    ``&``) and the index one past the expression.  Raises ValueError on
    malformed forms — ``!`` with no primitive, a trailing operator,
    double negation — which RDKit's SMARTS parser also rejects."""
    n = len(s)

    def factor(j: int) -> tuple[str, int]:
        neg = ""
        if s[j : j + 1] == "!":
            neg = "!"
            j += 1
            if s[j : j + 1] == "!":
                raise ValueError(f"double bond negation at {j}")
        c = s[j : j + 1]
        if c not in _BOND_PRIMS:
            raise ValueError(f"bond primitive expected at {j}")
        return neg + c, j + 1

    tok, i = factor(i)
    parts = [tok]
    while i < n:
        c = s[i]
        if c in ",;&":
            tok, j = factor(i + 1)
            parts.append(c)
            parts.append(tok)
            i = j
        elif c in _BOND_PRIMS or c == "!":
            tok, j = factor(i)
            parts.append("&")
            parts.append(tok)
            i = j
        else:
            break
    return "".join(parts), i


def _compile_bond_expr(label: str):
    """Evaluator ``fn(sb, in_cyc) -> bool`` for a normalized bond
    expression: AND over ``;``-terms of OR over ``,``-alternatives of
    AND over ``&``-factors, each factor an optionally ``!``-negated
    primitive.  A substrate ring-closure edge carries label ``None`` =
    unknown bond order (the topology-only ring semantics): it satisfies
    any satisfiable ORDER constraint — positive AND negated — while
    ring primitives consult actual membership and ``!~`` (not any bond)
    stays unsatisfiable everywhere."""
    terms: list[list[list[tuple[bool, str]]]] = []
    for t in label.split(";"):
        alts: list[list[tuple[bool, str]]] = []
        for a in t.split(","):
            fs: list[tuple[bool, str]] = []
            for f in a.split("&"):
                neg = f.startswith("!")
                fs.append((neg, f[1:] if neg else f))
            alts.append(fs)
        terms.append(alts)

    def fac(neg: bool, prim: str, sb: str | None, in_cyc: bool) -> bool:
        if prim == "@":
            v = in_cyc
        elif prim == "~":
            v = True
        elif sb is None:
            return True
        else:
            v = _bond_ok(prim, sb)
        return (not v) if neg else v

    def ev(sb: str | None, in_cyc: bool) -> bool:
        return all(
            any(
                all(fac(neg, prim, sb, in_cyc) for neg, prim in fs)
                for fs in alts
            )
            for alts in terms
        )

    return ev

# ';' is SMARTS low-precedence AND — for this subset (no OR mixing
# inside a component) it is equivalent to '&', so [N;X3] == [N&X3] and
# [c;H1] == [cH1]; ';R' / ';!R' / ';a' / ';A' add ring/aromaticity
# conjuncts ([C;R] = aliphatic carbon in a ring)
_BRACKET_RE = re.compile(
    r"\[(?P<isotope>\d+)?(?P<elem>\*|#\d+|R\d+|[A-Z][a-z]?|[a-z])"
    r"(?P<mods>(?:[&;]?[Xv]\d+|[&;]?H\d*|[&;]?\+\d*|[&;]?-\d*|;!?(?:R\d*|[aA]))*)"
    r"(?::(?P<map>\d+))?\]"
)
# SMARTS query brackets (pattern-side only): alternation of primitives
# ([C,N], [#6,#7]; each alternative may carry its own H/charge mods —
# [CH2,NH], r9) and negation ([!O], [!#1], [!C!N] = none
# may match).  Recursive [$(...)] brackets are hand-parsed (balanced
# parens — see _match_recursive_bracket); mixing forms and nesting
# past depth 8 stay outside the subset; pattern-side stereo marks are
# stripped before these regexes run (strip_stereo — RDKit-default
# useChirality=False semantics; module docstring).  RDKit's
# ReactionFromSmarts accepts the wider grammar
# (/root/reference/integrative_omics/gizmos.py:193-234).
_PRIM_SRC = r"(?:\*|#\d+|R\d+|[A-Z][a-z]?|[a-z])"
# r9: each alternative may carry its own H-count / charge modifiers
# ([CH2,NH], [CH3,NH2,OH], [O-,OH] — the common RetroRules shapes); the
# modifier applies to ITS alternative only, unlike the concrete form's
# global mods.  An alternative may also negate ITS primitive ([C,!N] —
# Daylight: ',' separates complete exprs and '!' binds one primitive,
# so "!CH3" as an item means (!C) AND H3).
_ALT_ITEM_SRC = rf"!?{_PRIM_SRC}(?:H\d*)?(?:\+\d*|-\d*)?"
# r9: the whole alternation/negation may carry ';'-conjuncts ([C,N;R],
# [!C!N;R] — SMARTS precedence: ',' binds tighter than ';', so the
# conjunct ANDs with the whole OR/none-of list)
_CONJ_SRC = r"(?:;!?(?:R\d*|[aA]))*"
_BRACKET_ALT_RE = re.compile(
    rf"\[(?P<alist>{_ALT_ITEM_SRC}(?:,{_ALT_ITEM_SRC})+)"
    rf"(?P<conj>{_CONJ_SRC})(?::(?P<map>\d+))?\]"
)
_ALT_ITEM_RE = re.compile(
    rf"(?P<neg>!)?(?P<prim>{_PRIM_SRC})(?P<h>H\d*)?(?P<chg>\+\d*|-\d*)?$"
)
# Daylight precedence: '!' binds to exactly ONE primitive, so in
# [!CH3] the tokens are !C and H3 — (not carbon) AND (3 explicit H).
# The negation list may therefore be followed by bracket-level H/charge
# mods that AND with the none-of verdict ([!CH3], [!O-], [!C!NH2] —
# r9; per-ITEM mods would be the wrong semantics for negation, unlike
# the alternation form where ',' separates complete atom exprs)
_BRACKET_NEG_RE = re.compile(
    rf"\[(?P<nlist>(?:!{_PRIM_SRC})+)(?P<mods>(?:H\d*|\+\d*|-\d*)*)"
    rf"(?P<conj>{_CONJ_SRC})(?::(?P<map>\d+))?\]"
)
# elem-less charge query: [+] / [-] / [+2] — any atom carrying exactly
# that formal charge (pattern-side only; nothing concrete to write)
_BRACKET_CHG_RE = re.compile(r"\[(?P<chg>\+\d*|-\d*)(?::(?P<map>\d+))?\]")

# bound on the per-sub-pattern embedding enumeration behind a
# recursive [$(...)] anchor-set computation (see _all_embeddings)
_REC_EMBED_CAP = 4096

# maximum total nesting of recursive environments ($(...) inside $(...)):
# the matcher is depth-generic (anchor sets re-enter _all_embeddings, so
# each level costs one extra capped sub-search over the substrate — cost
# linear in depth), and this bound exists only to keep a pathological
# pattern from stacking unbounded sub-searches.  RetroRules-shaped rules
# rarely exceed depth 1; 8 is far past anything real.
_MAX_REC_NESTING = 8

# atomic numbers for the parser subset's elements (for #n primitives;
# aromaticity-agnostic, as in SMARTS)
_ATOMIC_NUM = {
    "H": 1, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9,
    "P": 15, "S": 16, "Cl": 17, "Br": 35, "I": 53,
}


@dataclass
class Atom:
    elem: str           # element symbol as written (case carries aromaticity)
    aromatic: bool
    hcount: int | None  # explicit H spec only (no implicit-H valence model)
    charge: int | None
    amap: int | None
    raw: str            # token text, ring digits and atom map stripped
    start: int          # source offsets: token start / end before ring digits
    end: int
    ring_end: int       # end after trailing ring-closure digits
    rings: list[str] = field(default_factory=list)
    # query primitives (pattern-side only; mutually exclusive by grammar):
    # alts — substrate must match ONE ("elem"/"num"/"any"/"arom"/"ring"/
    # "rec" prims); negs — substrate must match NONE.  Concrete
    # [#6]/[a]/[R]/[$(SP)] parse as single-alt queries.
    alts: tuple | None = None
    negs: tuple | None = None
    # ';'-conjuncts from the concrete bracket form ([C;R], [c;!R]):
    # (negated, prim) pairs that must ALL hold in ADDITION to the
    # element/mod checks
    conj: tuple | None = None
    # set by parse_graph only (bridge analysis); parse_chain atoms keep
    # False — the linear matcher declines ring-primitive patterns
    in_ring: bool = False
    # number of canonical-minimum-cycle-basis rings containing the atom
    # (backs [R<n>]).  parse_graph marks in-ring atoms _RC_PENDING; the
    # basis is computed LAZILY (and idempotently) by
    # _ensure_ring_counts at the graph-matcher chokepoint, only when a
    # pattern actually carries a ringcount primitive — the common
    # no-[R<n>] workload never pays for it.  None = the molecule's ring
    # system exceeded the enumeration budget (a ringcount query on it
    # gets outside-subset semantics via RingCountBudget)
    ring_count: int | None = 0


def _parse_mods(mods: str) -> tuple[int | None, int | None, tuple | None]:
    """H-count, charge, and ring/aromaticity conjuncts from a
    bracket-atom modifier string ('&' and ';' are both AND here; X/v
    specs are parsed over but ignored, per remove_valence_from_smarts).
    Conjuncts are (negated, prim) pairs that must ALL hold."""
    h: int | None = None
    charge: int | None = None
    conj: list = []
    for m in re.finditer(r"[&;]?(!?(?:R\d*|[aA])|H\d*|\+\d*|-\d*|[Xv]\d+)", mods):
        t = m.group(1)
        if t.startswith("H"):
            h = int(t[1:]) if len(t) > 1 else 1
        elif t.startswith("+"):
            charge = int(t[1:]) if len(t) > 1 else 1
        elif t.startswith("-"):
            charge = -(int(t[1:]) if len(t) > 1 else 1)
        elif re.fullmatch(r"R\d*|[aA]", t.lstrip("!")):
            conj.append((t.startswith("!"), _prim(t.lstrip("!"))))
    return h, charge, tuple(conj) or None


def _prim(p: str):
    """One bare primitive of a query bracket → matcher tuple."""
    if p == "*":
        return ("any", None)
    if p.startswith("#"):
        return ("num", int(p[1:]))
    if p in ("a", "A"):
        # SMARTS any-aromatic / any-aliphatic wildcards ('a'/'A' are not
        # element symbols in the subset, so this claims dead grammar)
        return ("arom", p == "a")
    if p == "R":
        # SMARTS ring membership (bare R = in at least one ring).
        # 'R' is not an element symbol in the subset.
        return ("ring", True)
    if p[0] == "R" and p[1:].isdigit():
        # ring COUNT (r10): atom in exactly n rings of the canonical
        # minimum cycle basis (module docstring); R0 ≡ !R
        return ("ringcount", int(p[1:]))
    return ("elem", (p, p.islower()))


def _parse_conj(cstr: str | None) -> tuple | None:
    """';'-conjunct string of an alternation/negation bracket (';R',
    ';!R;a' — r9) → (negated, prim) pairs, None when absent."""
    if not cstr:
        return None
    return tuple(
        (t.startswith("!"), _prim(t.lstrip("!")))
        for t in re.findall(r";(!?(?:R\d*|[aA]))", cstr)
    ) or None


def _alt_item(item: str):
    """One alternative of an alternation bracket → matcher tuple.  A bare
    primitive stays a bare prim; one carrying its own H/charge modifiers
    ([CH2,NH] — r9) wraps as ("mod", (base_prim, hcount, charge)) so the
    modifier binds to ITS alternative only; a '!' on the item ([C,!N] —
    r9) negates the item's PRIMITIVE (Daylight: '!' binds one
    primitive), wrapping the base as ("not", base_prim)."""
    m = _ALT_ITEM_RE.match(item)
    if not m:  # pragma: no cover — the bracket regex pre-validates
        raise ValueError(f"unsupported alternation item {item!r}")
    base = _prim(m.group("prim"))
    if m.group("neg"):
        base = ("not", base)
    h = chg = None
    if m.group("h"):
        h = int(m.group("h")[1:]) if len(m.group("h")) > 1 else 1
    if m.group("chg"):
        c = m.group("chg")
        mag = int(c[1:]) if len(c) > 1 else 1
        chg = mag if c[0] == "+" else -mag
    if h is None and chg is None:
        return base
    return ("mod", (base, h, chg))


def _rec_nesting(s: str) -> int:
    """Maximum ``$(...)`` nesting depth inside ``s`` (0 = none)."""
    mx = cur = 0
    stack: list[bool] = []  # True where the '(' was opened by '$('
    i, n = 0, len(s)
    while i < n:
        if s.startswith("$(", i):
            stack.append(True)
            cur += 1
            mx = max(mx, cur)
            i += 2
        elif s[i] == "(":
            stack.append(False)
            i += 1
        elif s[i] == ")":
            if stack and stack.pop():
                cur -= 1
            i += 1
        else:
            i += 1
    return mx


def _match_recursive_bracket(s: str, i: int):
    """Parse a recursive-SMARTS bracket ``[$(SP)]`` / ``[!$(SP)]`` /
    ``[$(SP):n]`` starting at ``s[i]``.  Returns (neg, subpat, amap,
    end) or None when the text is not a recursive bracket.  The
    sub-pattern may itself carry ``[$(...)]`` atoms to any depth up to
    ``_MAX_REC_NESTING`` (r10; r9 shipped depth 2 — the matcher was
    already depth-generic, anchor sets re-entering the embedding search,
    so the bound is purely the parse-time guard below); deeper raises
    (documented subset bound)."""
    neg = s.startswith("[!$(", i)
    if not neg and not s.startswith("[$(", i):
        return None
    start = i + (4 if neg else 3)
    depth, j = 1, start
    n = len(s)
    while j < n and depth:
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
        j += 1
    if depth:
        raise ValueError(f"unbalanced recursive SMARTS at {i}")
    subpat = s[start : j - 1]
    if _rec_nesting(subpat) > _MAX_REC_NESTING - 1:
        raise ValueError(
            f"recursive SMARTS nested deeper than {_MAX_REC_NESTING} at {i} "
            "is outside the subset"
        )
    m = re.compile(r"(?::(\d+))?\]").match(s, j)
    if not m:
        raise ValueError(f"malformed recursive bracket at {i}")
    amap = int(m.group(1)) if m.group(1) else None
    return neg, subpat, amap, m.end()


def _parse_bracket_atom(s: str, i: int) -> Atom:
    """Parse one bracket atom starting at ``s[i]`` (concrete, #n,
    alternation, negation, charge, or recursive form) into an Atom with
    source offsets set.  Raises ValueError outside the subset."""
    rec = _match_recursive_bracket(s, i)
    if rec is not None:
        neg, subpat, amap, end = rec
        prim = (("rec", subpat),)
        raw = re.sub(r":\d+\]$", "]", s[i:end])
        return Atom(
            "*", False, None, None, amap, raw, i, end, end,
            alts=None if neg else prim, negs=prim if neg else None,
        )
    m = _BRACKET_RE.match(s, i)
    if m:
        elem = m.group("elem")
        h, charge, conj = _parse_mods(m.group("mods") or "")
        raw = re.sub(r":\d+\]$", "]", m.group(0))
        if (
            elem.startswith("#")
            or elem in ("a", "A", "R")
            or (elem[0] == "R" and elem[1:].isdigit())
        ):
            alts = (_prim(elem),)
        else:
            alts = None
        return Atom(
            elem,
            elem.islower() and elem not in ("*", "a") and not elem.startswith("#"),
            h, charge,
            int(m.group("map")) if m.group("map") else None,
            raw, i, m.end(), m.end(), alts=alts, conj=conj,
        )
    m = _BRACKET_ALT_RE.match(s, i)
    if m:
        raw = re.sub(r":\d+\]$", "]", m.group(0))
        return Atom(
            "*", False, None, None,
            int(m.group("map")) if m.group("map") else None,
            raw, i, m.end(), m.end(),
            alts=tuple(_alt_item(p) for p in m.group("alist").split(",")),
            conj=_parse_conj(m.group("conj")),
        )
    m = _BRACKET_NEG_RE.match(s, i)
    if m:
        raw = re.sub(r":\d+\]$", "]", m.group(0))
        h, charge, _ = _parse_mods(m.group("mods") or "")
        return Atom(
            "*", False, h, charge,
            int(m.group("map")) if m.group("map") else None,
            raw, i, m.end(), m.end(),
            negs=tuple(_prim(p) for p in m.group("nlist")[1:].split("!")),
            conj=_parse_conj(m.group("conj")),
        )
    m = _BRACKET_CHG_RE.match(s, i)
    if m:
        chg = m.group("chg")
        mag = int(chg[1:]) if len(chg) > 1 else 1
        raw = re.sub(r":\d+\]$", "]", m.group(0))
        # alts=("any",) marks this a query atom (template guard) while
        # matching any element; the charge mod carries the constraint
        return Atom(
            "*", False, None, mag if chg[0] == "+" else -mag,
            int(m.group("map")) if m.group("map") else None,
            raw, i, m.end(), m.end(), alts=(("any", None),),
        )
    raise ValueError(f"unsupported bracket atom at {i}: {s[i:i + 12]!r}")


def _match_bracket_end(s: str, i: int) -> int | None:
    """End offset of the bracket token at ``s[i]`` (any accepted form),
    or None."""
    rec = _match_recursive_bracket(s, i)
    if rec is not None:
        return rec[3]
    for rx in (_BRACKET_RE, _BRACKET_ALT_RE, _BRACKET_NEG_RE, _BRACKET_CHG_RE):
        m = rx.match(s, i)
        if m:
            return m.end()
    return None


def _is_query(a: Atom) -> bool:
    """True when the atom carries pattern-only primitives that cannot be
    WRITTEN into a product (alternation, negation, #n, a/A, R, $(),
    ';'-conjuncts)."""
    return a.alts is not None or a.negs is not None or a.conj is not None


def _flatten_prim(prim):
    """Yield ``prim`` and every base under its wrappers ("mod"/"not") so
    ring/rec detection sees wrapped primitives."""
    yield prim
    if prim[0] == "mod":
        yield from _flatten_prim(prim[1][0])
    elif prim[0] == "not":
        yield from _flatten_prim(prim[1])


def _atom_prims(a: Atom):
    for prim in (*(a.alts or ()), *(a.negs or ())):
        yield from _flatten_prim(prim)
    for _, prim in a.conj or ():
        yield prim


def _has_ring_prim(atoms: list[Atom]) -> bool:
    """True when any atom carries an [R]/[!R] (incl. ';R' conjuncts) or
    recursive [$(...)] primitive — both evaluable only with graph
    context (parse_chain atoms keep in_ring=False; rec anchor sets come
    from the graph matcher), so the linear splice path declines such
    patterns and the graph path owns every embedding."""
    return any(
        prim[0] in ("ring", "ringcount", "rec")
        for a in atoms
        for prim in _atom_prims(a)
    )


# chirality mark directly after a bracket atom's element token (the
# '[' anchor is what distinguishes it from the RING-BOND '@' between
# chain atoms); matches '@'/'@@' AND full extended class tokens, which
# strip as atomic units — [C@OH1] is octahedral-class-1 (→ [C]), never
# '@' + an H1 count, while plain [C@H]/[C@H1] strips to [CH]/[CH1]
# (bare 'H' is the hydrogen-count mod: classes need their digit).  An
# OUT-OF-RANGE class id (e.g. @TH3, @OH31, @TB21) matches only the
# bare '@' — each class alternative carries a (?!\d) guard so a longer
# digit run never half-strips a valid shorter class (without it,
# '@OH31' would consume 'OH3' and leave '[C1]') — leaving the class
# token as a residue the bracket parser still rejects.
_TETRAHEDRAL_RE = re.compile(
    # after the bracket-atom element: '@' / '@@' (tetrahedral) or a full
    # extended chirality class token (Daylight ranges: TH1-2, AL1-2,
    # SP1-3, TB1-20, OH1-30; two-digit alternatives first so 'TB13'
    # never half-matches as 'TB1')
    r"(\[(?:\d+)?(?:#\d+|[A-Z][a-z]?|[a-z]|\*))"
    r"@(?:TH[12](?!\d)|AL[12](?!\d)|SP[1-3](?!\d)"
    r"|TB(?:1[0-9]|20|[1-9])(?!\d)|OH(?:[12][0-9]|30|[1-9])(?!\d)|@|)"
)


def strip_stereo(pattern: str) -> str:
    """Drop TETRAHEDRAL marks from a PATTERN (or product template) —
    RDKit's DEFAULT matching semantics: ``GetSubstructMatch`` /
    ``RunReactants`` template matching run with ``useChirality=False``
    unless asked otherwise (the reference calls both through the
    defaults, gizmos.py:193-234, mapBaseRetroRules.py:37-53), so
    ``@``/``@@`` after a bracket atom's element constrains nothing at
    match time: ``[C@H]`` ≡ ``[CH]``.  Directional bond marks ``/``
    ``\\`` are NOT text-stripped — both parsers accept them as bond
    labels (preserving each side's writing) and :func:`_bond_ok`
    equates them with the single bond at match time, the other half of
    the same defaults.

    Scope guards:
    - ``@`` BETWEEN atoms (``C@C``, including inside a recursive
      environment) is the SMARTS ring-bond query, not tetrahedral
      stereo — never stripped; it parses on the pattern side as a
      query-bond edge label (``parse_graph(..., bond_queries=True)``)
      the matcher resolves by ring membership;
    - extended chirality classes (``@TH1``, ``@SP3``, ``@TB13``,
      ``@OH30``, …) strip as whole tokens (late r10) — the same
      useChirality=False semantics as ``@``/``@@``; the token is
      consumed atomically so ``[C@OH1]`` is octahedral-class-1 (→
      ``[C]``), NOT ``@`` + an H1 count, matching the Daylight read;
    - MOLECULE-side tetrahedral marks stay outside the subset: a
      substrate ``[C@H]`` is parsed verbatim and rejected — RDKit
      would preserve its marks in product writings where this engine
      cannot, and honest rejection beats a silently different product.
    """
    if "@" not in pattern:
        return pattern
    return _TETRAHEDRAL_RE.sub(r"\1", pattern)


def parse_chain(s: str) -> list[Atom]:
    """Tokenize a linear SMILES/SMARTS-subset string into atoms carrying
    their source offsets (separator text is recovered by slicing the
    source).  Raises ValueError on syntax outside the subset."""
    atoms: list[Atom] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "[":
            a = _parse_bracket_atom(s, i)
            atoms.append(a)
            i = a.end
        elif s.startswith(_TWO_LETTER, i):
            atoms.append(Atom(s[i : i + 2], False, None, None, None, s[i : i + 2], i, i + 2, i + 2))
            i += 2
        elif ch in _SINGLE or ch in _AROMATIC or ch == "*":
            atoms.append(Atom(ch, ch in _AROMATIC, None, None, None, ch, i, i + 1, i + 1))
            i += 1
        elif ch.isdigit() or ch == "%":
            # a ring digit attaches directly after the atom, or after one
            # bond char that qualifies the ring bond ("C=1...1" notation —
            # what serialize_graph emits for non-single ring closures)
            bonded = (
                i > 0 and s[i - 1] in _BOND_CHARS and atoms and atoms[-1].ring_end == i - 1
            )
            if not atoms or (atoms[-1].ring_end != i and not bonded):
                raise ValueError(f"ring digit not attached to an atom at {i}")
            d = s[i : i + 3] if ch == "%" else ch
            atoms[-1].rings.append(d)
            atoms[-1].ring_end = i + len(d)
            i += len(d)
        elif ch in "()" or ch in _BOND_CHARS:
            i += 1
        else:
            raise ValueError(f"unsupported character {ch!r} at {i}")
    return atoms


def _sep(src: str, a: Atom, b: Atom) -> str:
    """Separator text between two consecutive atoms in their source."""
    return src[a.ring_end : b.start]


def _ring_pairing_digits(span: list[Atom]) -> dict[tuple[int, int], str]:
    """Internal ring pairs of the span → the digit label joining them."""
    open_: dict[str, int] = {}
    pairs: dict[tuple[int, int], str] = {}
    for idx, a in enumerate(span):
        for d in a.rings:
            if d in open_:
                pairs[(open_.pop(d), idx)] = d
            else:
                open_[d] = idx
    return pairs


def _ring_pairing(span: list[Atom]) -> tuple[set[tuple[int, int]], set[int]]:
    """Ring-bond pairs internal to the span (relative index pairs) and the
    indices of atoms whose closure digit pairs OUTSIDE the span."""
    open_: dict[str, int] = {}
    pairs: set[tuple[int, int]] = set()
    for idx, a in enumerate(span):
        for d in a.rings:
            if d in open_:
                pairs.add((open_.pop(d), idx))
            else:
                open_[d] = idx
    return pairs, set(open_.values())


def _prim_matches(prim, sub: Atom) -> bool:
    kind, val = prim
    if kind == "mod":  # per-alternative H/charge modifiers ([CH2,NH])
        base, h, chg = val
        if not _prim_matches(base, sub):
            return False
        if h is not None and sub.hcount != h:
            return False
        return chg is None or (sub.charge or 0) == chg
    if kind == "not":  # negated item primitive inside an alternation
        return not _prim_matches(val, sub)
    if kind == "any":
        return True
    if kind == "num":
        sym = sub.elem if len(sub.elem) > 1 else sub.elem.upper()
        return _ATOMIC_NUM.get(sym) == val
    if kind == "arom":
        return sub.aromatic == val
    if kind == "ring":
        return sub.in_ring == val
    if kind == "ringcount":
        if sub.ring_count is None:
            raise RingCountBudget(
                "ring-count query on a molecule whose ring system exceeded "
                "the cycle-enumeration budget is outside the subset"
            )
        if sub.ring_count == _RC_PENDING:  # pragma: no cover — fill missed
            # loud, not a silent False: every graph-matcher entry runs
            # _ensure_ring_counts, so reaching here is an engine bug
            raise RuntimeError("ring counts not materialized before match")
        return sub.ring_count == val
    sym, arom = val
    return sym.upper() == sub.elem.upper() and arom == sub.aromatic


def _atom_matches(
    pat: Atom,
    sub: Atom,
    sub_idx: int | None = None,
    rec_anchor: dict | None = None,
) -> bool:
    """``sub_idx``/``rec_anchor`` carry graph context for recursive
    ``[$(...)]`` primitives (anchor sets precomputed per substrate by
    :func:`_all_embeddings`); without context a rec primitive never
    matches — the linear splice path declines such patterns anyway."""

    def prim_ok(prim) -> bool:
        if prim[0] == "rec":
            if rec_anchor is None or sub_idx is None:
                return False
            return sub_idx in rec_anchor.get(prim[1], ())
        return _prim_matches(prim, sub)

    if pat.negs is not None:
        if any(prim_ok(p) for p in pat.negs):
            return False
    elif pat.alts is not None:
        if not any(prim_ok(p) for p in pat.alts):
            return False
    elif pat.elem != "*":
        if pat.elem.upper() != sub.elem.upper() or pat.aromatic != sub.aromatic:
            return False
    if pat.conj is not None:
        for negated, prim in pat.conj:
            if prim_ok(prim) == negated:
                return False
    if pat.hcount is not None and sub.hcount != pat.hcount:
        return False
    if pat.charge is not None and (sub.charge or 0) != pat.charge:
        return False
    return True


@lru_cache(maxsize=4096)
def parse_graph(
    s: str, bond_queries: bool = False
) -> tuple[list[Atom], dict[tuple[int, int], str | None]]:
    """Parse into atoms + bond edges: branch parentheses attach following
    atoms to the branch point, ring-closure digit pairs become edges.

    Edge labels: the bond text as written ('' normalized to '-'); ring
    edges carry ``None`` = matches any bond (the linear matcher's
    topology-only ring semantics).  A ``.`` separator produces NO edge
    (disconnected components).  Raises ValueError outside the subset.

    ``bond_queries=True`` (PATTERN side only — r10) additionally accepts
    the SMARTS bond query primitives ``~`` (any bond), ``@`` (bond in a
    ring) and ``!@`` (bond not in a ring) in bond position, carried as edge labels
    the matcher resolves against the substrate's non-bridge edge set
    (RDKit ``IsInRing`` bond semantics).  MOLECULE strings must never
    carry them, so the default rejects — a substrate with a query bond
    stays honestly outside the subset.  A ring-closure digit qualified
    by a bond expression (``C-,=1...1``, ``C~1...1``; late r10) carries
    the expression as the closure edge's label; closure bonds written
    on both pairing digits must agree textually.

    Memoized (as is :func:`has_substructure`): batch verification calls
    repeat the same pattern strings millions of times and the same
    substrates across patterns; the parse and verdict are pure functions
    of the strings, so the cache turns per-pair cost into per-distinct
    cost.  Results are treated as immutable by all consumers, with ONE
    sanctioned exception: :func:`_ensure_ring_counts` monotonically
    fills the lazy ``ring_count`` field (PENDING → value) on first
    ringcount-pattern match — idempotent, so shared cached atoms stay
    consistent.
    """
    atoms: list[Atom] = []
    edges: dict[tuple[int, int], str | None] = {}
    stack: list[int | None] = []
    ring_open: dict[str, tuple[int, str]] = {}
    prev: int | None = None
    bond = ""
    bond_start = -1  # index where the pending bond text begins
    i, n = 0, len(s)

    def _attach(idx: int) -> None:
        nonlocal prev, bond
        if prev is None and _is_query_bond(bond):
            # '-,=O' / '(~O)': a query bond with no prior atom to bind —
            # RDKit errors; silently dropping it would degrade the
            # pattern to the bare atom (the ~/@/!@ branch guards its own
            # leading position, but OR-lists reach here)
            raise ValueError(f"dangling bond query with no prior atom before {idx}")
        if prev is not None and bond != ".":
            edges[(min(prev, idx), max(prev, idx))] = "-" if bond == "" else bond
        prev = idx
        bond = ""

    while i < n:
        ch = s[i]
        if ch == "[":
            a = _parse_bracket_atom(s, i)
            atoms.append(a)
            _attach(len(atoms) - 1)
            i = a.end
        elif s.startswith(_TWO_LETTER, i):
            atoms.append(Atom(s[i:i + 2], False, None, None, None, s[i:i + 2], i, i + 2, i + 2))
            _attach(len(atoms) - 1)
            i += 2
        elif ch in _SINGLE or ch in _AROMATIC or ch == "*":
            atoms.append(Atom(ch, ch in _AROMATIC, None, None, None, ch, i, i + 1, i + 1))
            _attach(len(atoms) - 1)
            i += 1
        elif ch.isdigit() or ch == "%":
            # ring digit directly after the atom, or after a bond
            # qualifying the ring bond — a plain char ("C=1...1") or,
            # pattern side, a full query expression ("C-,=1...1",
            # "C~1...1"; r10): the bond then belongs to the ring
            # closure, not to the next atom.  bond_start == ring_end
            # means the bond text sits BETWEEN the atom and this digit.
            bonded = (
                bond != "" and bond != "."
                and atoms and atoms[-1].ring_end == bond_start
            )
            if prev is None or not atoms or (atoms[-1].ring_end != i and not bonded):
                raise ValueError(f"ring digit not attached to an atom at {i}")
            ring_bond = bond if bonded else ""
            if bonded:
                bond = ""
            d = s[i:i + 3] if ch == "%" else ch
            atoms[-1].rings.append(d)
            atoms[-1].ring_end = i + len(d)
            if d in ring_open:
                j, open_bond = ring_open.pop(d)
                if j == prev:
                    # "C11": a closure pairing an atom with itself is not
                    # a molecule (and a self-loop edge would crash the
                    # serializer's back-edge bookkeeping downstream)
                    raise ValueError(f"ring closure {d} pairs an atom with itself at {i}")
                if (
                    ring_bond
                    and open_bond
                    and _BOND_MATCH_EQUIV.get(ring_bond, ring_bond)
                    != _BOND_MATCH_EQUIV.get(open_bond, open_bond)
                ):
                    # "C-1CCCC=1": RDKit rejects conflicting closure
                    # bonds.  Equality is on the MATCH-equivalence class
                    # (/ and \ ≡ the single bond they decorate), because
                    # a legal SMILES directional closure writes OPPOSITE
                    # slashes at its two ends ("C/1CCCCC\\1") — raw-text
                    # comparison would reject exactly the well-formed
                    # case; direction is ignored at match time anyway
                    # (the stereo-ignored contract).  Query expressions
                    # compare textually, so an equivalent-but-reordered
                    # pair ("-,=1...=,-1") conservatively declines.
                    raise ValueError(f"ring closure {d} bond mismatch at {i}")
                lab = ring_bond or open_bond or None
                edges[(min(j, prev), max(j, prev))] = lab
            else:
                ring_open[d] = (prev, ring_bond)
            i += len(d)
        elif ch == "(":
            if _is_query_bond(bond):
                # 'C~(O)': a bond symbol must be followed by an atom or
                # ring digit — RDKit rejects this at parse
                raise ValueError(f"bond query before '(' at {i}")
            stack.append(prev)
            i += 1
        elif ch == ")":
            if not stack:
                raise ValueError(f"unbalanced ')' at {i}")
            if _is_query_bond(bond):
                # 'C(C!@)': query bond pending at branch close binds
                # nothing — RDKit errors; a plain pending bond keeps the
                # parser's existing leniency
                raise ValueError(f"dangling bond query before ')' at {i}")
            prev = stack.pop()
            bond = ""
            i += 1
        elif ch in _BOND_CHARS:
            if _is_query_bond(bond):
                # a pending query expression followed by another bond
                # token — expressions are consumed atomically below, so
                # this is '.'-adjacency ('C~.O') or a stray separator;
                # RDKit rejects both
                raise ValueError(f"bond-query conjunction at {i}")
            if bond == "." or (ch == "." and bond != ""):
                # 'C.-O' / 'C-.O': a '.' separator adjacent to a bond
                # symbol is a syntax error in RDKit; overwriting would
                # silently turn a DISCONNECTED pattern into a bonded one
                # (or vice versa)
                raise ValueError(f"'.' adjacent to a bond at {i}")
            bond_start = i
            if bond_queries and ch != ".":
                # pattern side: a full Daylight bond expression ('-,=',
                # '=;@', '-&!@', '!=', …) consumed atomically; a single
                # plain primitive comes back unchanged, preserving the
                # ring-closure qualification logic below
                bond, i = _parse_bond_expr(s, i)
            else:
                bond = ch
                i += 1
        elif bond_queries and ch in "~@!":
            if bond != "" or not atoms:
                # a query expression after a pending bond cannot occur
                # (atomic consumption) except via '.' ('C.~O'), and a
                # leading query bond has no prior atom — RDKit errors
                raise ValueError(f"bond-query conjunction or dangling {ch!r} at {i}")
            bond_start = i
            bond, i = _parse_bond_expr(s, i)
        else:
            raise ValueError(f"unsupported character {ch!r} at {i}")
    if _is_query_bond(bond):
        # trailing query bond with no atom to bind ('C!@') — RDKit errors
        raise ValueError("dangling bond query at end of pattern")
    # an unclosed ring digit = a closure pairing outside this string; keep
    # the atoms (the linear matcher tolerates it) but no edge is created
    #
    # ring membership (for the [R]/[!R] primitives): an atom is in a ring
    # iff it has an incident NON-BRIDGE edge — computed here once so the
    # flag rides the memoized parse
    cyc_edges = _cyc_edge_set(len(atoms), frozenset(edges))
    for (a, b) in cyc_edges:
        atoms[a].in_ring = True
        atoms[b].in_ring = True
    # ring COUNTS (for the [R<n>] primitives, r10): in-ring atoms are
    # marked PENDING; the canonical-minimum-cycle-basis computation runs
    # lazily in _ensure_ring_counts only when a pattern carries a
    # ringcount primitive, so the common no-[R<n>] workload never pays
    # the cycle enumeration.  (An atom outside every ring is R0 with no
    # enumeration needed — it keeps the 0 default.)
    for (a, b) in cyc_edges:
        atoms[a].ring_count = _RC_PENDING
        atoms[b].ring_count = _RC_PENDING
    return atoms, edges


def _non_bridge_edges(
    n: int, edges: dict[tuple[int, int], str | None]
) -> list[tuple[int, int]]:
    """Edges lying on a cycle (non-bridges), via one iterative DFS with
    low-link values (Tarjan bridges).  Molecules are small, but the DFS
    is iterative anyway so a pathological chain cannot blow the Python
    stack."""
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for (a, b) in edges:
        adj[a].append(b)
        adj[b].append(a)
    disc = [-1] * n
    low = [0] * n
    bridges: set[tuple[int, int]] = set()
    timer = 0
    for root in range(n):
        if disc[root] != -1:
            continue
        # stack holds (node, parent, neighbor-iterator index)
        stack = [(root, -1, 0)]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            u, parent, idx = stack.pop()
            if idx < len(adj[u]):
                stack.append((u, parent, idx + 1))
                v = adj[u][idx]
                if v == parent:
                    continue
                if disc[v] == -1:
                    disc[v] = low[v] = timer
                    timer += 1
                    stack.append((v, u, 0))
                else:
                    low[u] = min(low[u], disc[v])
            elif parent != -1:
                low[parent] = min(low[parent], low[u])
                if low[u] > disc[parent]:
                    bridges.add((min(parent, u), max(parent, u)))
    return [e for e in edges if e not in bridges]


# DFS step budget for the simple-cycle enumeration behind [R<n>] ring
# counts: real molecules have a handful of rings (a steroid's fused
# 4-ring system enumerates in tens of steps); only a pathological
# clique-like ring system can hit this, and then only ring-count
# queries on it are refused (None counts), never bare [R]/[!R]
_CYCLE_ENUM_BUDGET = 200_000

_RC_PENDING = -1  # parse_graph marks in-ring atoms; _ensure_ring_counts fills


@lru_cache(maxsize=8192)
def _cyc_edge_set(n: int, edge_keys: frozenset) -> frozenset:
    """Memoized non-bridge (ring) edge set — one Tarjan DFS per distinct
    graph, shared by parse_graph's in_ring flags, _ensure_ring_counts,
    and the @/!@ query-bond matcher (labels don't matter, so the key is
    the edge-key set alone)."""
    return frozenset(_non_bridge_edges(n, dict.fromkeys(edge_keys)))


class RingCountBudget(ValueError):
    """A ``[R<n>]`` primitive was evaluated against a molecule whose ring
    system exceeded the cycle-enumeration budget — outside-subset
    semantics: :func:`has_substructure` returns False and the rewrite
    paths yield no products for that substrate (bare ``[R]``/``[!R]``
    still work from bridge analysis)."""


class OutsideSubsetMatch(ValueError):
    """A pattern construct fell outside the subset only at MATCH time —
    e.g. a recursive environment whose sub-pattern does not parse
    (``[$(C@C)]``: ring-bond query inside the environment).  Raised
    instead of treating the anchor set as empty, because an empty set
    INVERTS under negation: ``[!$(C@C)]`` would silently match every
    atom where the contract is an outside-subset rejection of the whole
    pattern.  Same handling as :class:`RingCountBudget`."""


def _needs_ring_counts(p_atoms: list) -> bool:
    return any(
        prim[0] == "ringcount" for a in p_atoms for prim in _atom_prims(a)
    )


def _ensure_ring_counts(s_atoms: list, s_edges: dict) -> None:
    """Idempotent lazy fill of per-atom ring counts on a memoized
    parse_graph result.  Called at the graph-matcher chokepoint
    (:func:`_all_embeddings`) only when the pattern carries a ringcount
    primitive — recursive ``[$(...)]`` sub-patterns re-enter the same
    chokepoint, so an [R<n>] inside a rec environment fills too."""
    if not any(a.ring_count == _RC_PENDING for a in s_atoms):
        return
    counts = _ring_basis_counts(
        len(s_atoms), sorted(_cyc_edge_set(len(s_atoms), frozenset(s_edges)))
    )
    for i, a in enumerate(s_atoms):
        if a.ring_count == _RC_PENDING:
            a.ring_count = None if counts is None else counts[i]


def _ring_basis_counts(
    n: int, cyc_edges: list[tuple[int, int]]
) -> list[int] | None:
    """Per-atom ring counts over a canonical minimum cycle basis of the
    non-bridge subgraph — the engine's SSSR notion backing ``[R<n>]``.

    Enumerate every simple cycle (each found exactly once: rooted at its
    minimum vertex, orientation fixed by ``path[1] < path[-1]``), sort
    by ``(length, sorted atom indices)``, then greedily keep the
    GF(2)-independent ones until the cycle-space dimension
    ``|E| − |V| + components`` is reached.  Greedy-by-weight over a
    spanning candidate set is the matroid greedy, so the selection is a
    true minimum cycle basis; the sort is the deterministic tie-break
    among equal-length bases (the same degenerate-symmetry caveat
    RDKit's SSSR documents).  Returns None when the enumeration budget
    is exceeded (counts unknown)."""
    adjc: dict[int, list[int]] = {}
    for (a, b) in cyc_edges:
        adjc.setdefault(a, []).append(b)
        adjc.setdefault(b, []).append(a)
    for v in adjc:
        adjc[v].sort()
    verts = sorted(adjc)
    # components of the cyclic subgraph (for the cycle-space dimension)
    comp_seen: set[int] = set()
    n_comp = 0
    for v in verts:
        if v in comp_seen:
            continue
        n_comp += 1
        stack = [v]
        comp_seen.add(v)
        while stack:
            u = stack.pop()
            for w in adjc[u]:
                if w not in comp_seen:
                    comp_seen.add(w)
                    stack.append(w)
    dim = len(cyc_edges) - len(verts) + n_comp
    if dim <= 0:  # pragma: no cover — cyc_edges nonempty implies dim >= 1
        return [0] * n
    # enumerate all simple cycles of the cyclic subgraph
    budget = _CYCLE_ENUM_BUDGET
    cycles: list[tuple[int, ...]] = []
    for s in verts:
        stack2: list[tuple[int, int]] = [(s, 0)]
        path = [s]
        onpath = {s}
        while stack2:
            budget -= 1
            if budget < 0:
                return None
            u, i = stack2.pop()
            if i < len(adjc[u]):
                stack2.append((u, i + 1))
                v = adjc[u][i]
                if v == s and len(path) >= 3 and path[1] < path[-1]:
                    cycles.append(tuple(path))
                elif v > s and v not in onpath:
                    stack2.append((v, 0))
                    path.append(v)
                    onpath.add(v)
            else:
                path.pop()
                onpath.discard(u)
    # canonical greedy GF(2) selection
    eidx = {e: i for i, e in enumerate(sorted(cyc_edges))}
    counts = [0] * n
    pivots: dict[int, int] = {}
    chosen = 0
    for path in sorted(cycles, key=lambda p: (len(p), tuple(sorted(p)))):
        mask = 0
        for a, b in zip(path, path[1:] + (path[0],)):
            mask |= 1 << eidx[(min(a, b), max(a, b))]
        m = mask
        while m:
            h = m.bit_length() - 1
            if h in pivots:
                m ^= pivots[h]
            else:
                pivots[h] = m
                break
        if not m:
            continue  # dependent on already-chosen cycles
        for v in path:
            counts[v] += 1
        chosen += 1
        if chosen == dim:
            break
    return counts


# directional bond marks denote cis/trans ORIENTATION of a single bond;
# default-settings RDKit matching ignores the orientation, so '/' and
# '\' compare as the single bond they decorate (both sides — pattern
# marks match plain substrates AND vice versa, writings preserved)
_BOND_MATCH_EQUIV = {"/": "-", "\\": "-"}


def _bond_ok(pb: str | None, sb: str | None) -> bool:
    # fast path first: this sits in the backtracking matcher's innermost
    # edge check, and directional marks are rare — only consult the
    # equivalence map when the plain compare fails
    if pb is None or sb is None or pb == sb:
        return True
    return _BOND_MATCH_EQUIV.get(pb, pb) == _BOND_MATCH_EQUIV.get(sb, sb)


def _rewrite_token(t: Atom, src: Atom) -> str:
    """Token a mapped template atom emits for its matched substrate atom.

    A BARE template atom of the same element inherits the substrate's
    token so modifiers survive (``[N:1]`` keeps a matched ``[N&X3]``);
    any explicit spec — or an element change — imposes the template's.
    Exception on CHARGE: a product atom written ``[O:1]`` (or bare
    ``O``) is explicitly NEUTRAL in SMILES, so inheriting a charged
    substrate token would silently undo a neutralization rule
    (RunReactants sets the product template's formal charge) — the
    inherited token drops its charge spec, keeping other modifiers."""
    bare = t.raw in (t.elem, f"[{t.elem}]") and t.elem == src.elem
    if not bare:
        return t.raw
    if src.charge:
        # strip EVERY charge token in the bracket body, not just one
        # sitting immediately before ']': brackets also carry charge-first
        # orderings ([N+H3]) and multi-sign forms ([O--], [Fe++]); bond
        # symbols never appear inside a bracket raw, so a bare '-' here is
        # always a charge
        return re.sub(r"\++\d*|-+\d*", "", src.raw)
    return src.raw


def _all_embeddings(
    p_atoms: list[Atom],
    p_edges: dict[tuple[int, int], str | None],
    s_atoms: list[Atom],
    s_edges: dict[tuple[int, int], str | None],
):
    """Backtracking subgraph monomorphism, yielding EVERY injective atom
    assignment (dict pattern-idx → substrate-idx) that preserves every
    pattern bond (extra substrate bonds tolerated — the relaxed ring
    semantics of the linear matcher).  Deterministic: candidates are
    tried in substrate index order.

    Recursive ``[$(SP)]`` primitives: anchor sets (substrate atoms where
    SP embeds with its first atom) are precomputed here per sub-pattern
    by a recursive sub-search — sub-patterns parse with
    :func:`parse_graph`; a sub-pattern carrying its own ``[$(...)]``
    atoms (to ``_MAX_REC_NESTING`` levels — enforced at parse) re-enters this
    function, which computes the inner anchors first, so nesting costs
    one extra sub-search per inner pattern.  The sub-search enumerates at
    most ``_REC_EMBED_CAP`` embeddings per sub-pattern (NOT silent:
    a pathologically symmetric sub-pattern on a large substrate could
    otherwise enumerate factorially; RetroRules sub-patterns are tiny)."""
    k = len(p_atoms)
    if k > len(s_atoms):
        return
    if _needs_ring_counts(p_atoms):
        # lazy [R<n>] materialization (raises RingCountBudget past the
        # enumeration budget — callers map it to outside-subset); rec
        # sub-patterns re-enter here, so nested [$([R2]...)] fills too
        _ensure_ring_counts(s_atoms, s_edges)
    rec_anchor: dict[str, set[int]] | None = None
    rec_pats = {
        val for a in p_atoms for kind, val in _atom_prims(a) if kind == "rec"
    }
    if rec_pats:
        from itertools import islice

        rec_anchor = {}
        for sp in sorted(rec_pats):
            try:
                sp_atoms, sp_edges = parse_graph(sp, True)
            except ValueError as ex:
                # an unparseable sub-pattern makes the WHOLE pattern
                # outside-subset; an empty anchor set would invert to
                # always-true under [!$(...)] (see OutsideSubsetMatch)
                raise OutsideSubsetMatch(
                    f"recursive sub-pattern outside the subset: {sp!r}"
                ) from ex
            rec_anchor[sp] = {
                assign[0]
                for assign in islice(
                    _all_embeddings(sp_atoms, sp_edges, s_atoms, s_edges),
                    _REC_EMBED_CAP,
                )
            }
    # ring-bond query edges (pattern side): resolved against the
    # substrate's non-bridge edge set — RDKit IsInRing bond semantics;
    # computed only when the pattern carries one
    s_cyc: frozenset | None = None
    if any(lab is not None and "@" in lab for lab in p_edges.values()):
        s_cyc = _cyc_edge_set(len(s_atoms), frozenset(s_edges))
    # bond-expression edges compiled once per call: bt() re-checks the
    # same label for every candidate substrate edge in its innermost
    # loop.  The single primitives ~ / @ / !@ / plain keep their inline
    # fast paths below
    p_expr: dict[tuple[int, int], object] = {
        key: _compile_bond_expr(lab)
        for key, lab in p_edges.items()
        if lab is not None
        and (any(c in lab for c in ",&;") or ("!" in lab and lab != "!@"))
    }
    s_adj: dict[int, list[int]] = {}
    for (a, b) in s_edges:
        s_adj.setdefault(a, []).append(b)
        s_adj.setdefault(b, []).append(a)
    p_adj: dict[int, list[int]] = {}
    for (a, b) in p_edges:
        p_adj.setdefault(a, []).append(b)
        p_adj.setdefault(b, []).append(a)
    cand = [
        [
            j
            for j in range(len(s_atoms))
            if _atom_matches(p, s_atoms[j], j, rec_anchor)
        ]
        for p in p_atoms
    ]
    if any(not c for c in cand):
        return
    # order pattern atoms connectivity-first so each step is edge-pruned
    order: list[int] = []
    seen: set[int] = set()
    for start in range(k):
        if start in seen:
            continue
        queue = [start]
        seen.add(start)
        while queue:
            cur = queue.pop()
            order.append(cur)
            for nb in p_adj.get(cur, []):
                if nb not in seen:
                    seen.add(nb)
                    queue.append(nb)
    assign: dict[int, int] = {}
    used: set[int] = set()

    def bt(step: int):
        if step == k:
            yield dict(assign)
            return
        pi = order[step]
        # restrict to neighbors of an already-assigned pattern neighbor
        anchored = [q for q in p_adj.get(pi, []) if q in assign]
        pool = (
            sorted(s_adj.get(assign[anchored[0]], []))
            if anchored
            else range(len(s_atoms))
        )
        for sj in pool:
            if sj in used or not _atom_matches(p_atoms[pi], s_atoms[sj], sj, rec_anchor):
                continue
            ok = True
            for q in anchored:
                key_p = (min(pi, q), max(pi, q))
                key_s = (min(sj, assign[q]), max(sj, assign[q]))
                if key_s not in s_edges:
                    ok = False
                    break
                pl = p_edges[key_p]
                if pl == "~":
                    ok = True                      # any bond (edge exists)
                elif pl == "@":
                    ok = key_s in s_cyc            # any ring bond
                elif pl == "!@":
                    ok = key_s not in s_cyc        # any non-ring bond
                elif key_p in p_expr:
                    ok = p_expr[key_p](           # compiled expression
                        s_edges[key_s],
                        key_s in s_cyc if s_cyc is not None else False,
                    )
                else:
                    ok = _bond_ok(pl, s_edges[key_s])
                if not ok:
                    break
            if not ok:
                continue
            assign[pi] = sj
            used.add(sj)
            yield from bt(step + 1)
            del assign[pi]
            used.discard(sj)

    yield from bt(0)


def _embeds(
    p_atoms: list[Atom],
    p_edges: dict[tuple[int, int], str | None],
    s_atoms: list[Atom],
    s_edges: dict[tuple[int, int], str | None],
) -> bool:
    """Boolean form of :func:`_all_embeddings` — stops at the first
    embedding, preserving the K3 matcher's early-exit cost."""
    return next(_all_embeddings(p_atoms, p_edges, s_atoms, s_edges), None) is not None


def serialize_graph(
    tokens: list[str], edges: dict[tuple[int, int], str | None]
) -> str:
    """Write an atom/bond graph back to SMILES: per connected component a
    DFS spanning tree (root = smallest index, neighbors in index order)
    emits atoms with branch parentheses; non-tree (ring) edges get fresh
    closure digits at both endpoints; components join with ``.``.

    Deterministic — a pure function of (tokens, edges) — so product ids
    hashed from the string are stable across runs and partitionings.
    ``tokens`` are atom texts as written (``Atom.raw``); bond labels
    ``None``/``''``/``'-'`` print as the implicit single bond.
    """
    n = len(tokens)
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for (a, b) in edges:
        adj[a].append(b)
        adj[b].append(a)
    for v in adj.values():
        v.sort()

    def blab(a: int, b: int) -> str:
        lab = edges.get((min(a, b), max(a, b)))
        return "" if lab in (None, "", "-") else lab

    visited = [False] * n
    digit_counter = [0]
    comps: list[str] = []
    for root in range(n):
        if visited[root]:
            continue
        # pass 1: spanning tree + ring (back) edges, discovery order
        parent: dict[int, int | None] = {root: None}
        back: dict[frozenset[int], str] = {}
        visited[root] = True
        dfs_order = [root]
        it_stack = [(root, iter(adj[root]))]
        while it_stack:
            u, nbrs = it_stack[-1]
            advanced = False
            for v in nbrs:
                if not visited[v]:
                    visited[v] = True
                    parent[v] = u
                    dfs_order.append(v)
                    it_stack.append((v, iter(adj[v])))
                    advanced = True
                    break
                if v != parent[u] and frozenset((u, v)) not in back:
                    digit_counter[0] += 1
                    d = digit_counter[0]
                    back[frozenset((u, v))] = str(d) if d <= 9 else f"%{d:02d}"
            if not advanced:
                it_stack.pop()
        children: dict[int, list[int]] = {u: [] for u in dfs_order}
        for v, u in parent.items():
            if u is not None:
                children[u].append(v)
        for kids in children.values():
            kids.sort()

        # pass 2: write — last child is the unparenthesized tail
        def write(u: int) -> str:
            out = tokens[u]
            for e, d in back.items():
                if u in e:
                    a, b = tuple(e)
                    out += blab(a, b) + d
            kids = children[u]
            for c in kids[:-1]:
                out += f"({blab(u, c)}{write(c)})"
            if kids:
                out += blab(u, kids[-1]) + write(kids[-1])
            return out

        comps.append(write(root))
    return ".".join(comps)


@lru_cache(maxsize=65536)
def canonical_form(s: str) -> str:
    """Molecule-level identity key: a canonical re-serialization so two
    writings of the same graph compare equal (the reference dedups via
    RDKit-canonical ``MolToSmiles``, gizmos.py:219-224 — string-level
    dedup would emit the same molecule twice from symmetric embeddings).

    Weisfeiler-Lehman label refinement (seeded by the atom token, |V|
    rounds) scores every atom; the serialization tries every minimal-
    label root per component with WL-guided neighbor order and keeps the
    lexicographically smallest string.  Automorphic ties yield identical
    strings by symmetry, so the form is stable across writings; atoms
    outside the parser subset fall back to the input string itself.
    """
    try:
        atoms, edges = parse_graph(s)
    except ValueError:
        return s
    n = len(atoms)
    if n == 0:
        return s
    # identity is orientation-AGNOSTIC: the engine ignores directional
    # marks at match time (RDKit-default), so two writings of one
    # molecule differing only in '/' vs '\' vs '-' must share one key —
    # and dropping the marks from the canonical WRITING also keeps this
    # function from emitting a mark a re-rooted traversal would flip
    # into the opposite isomer's reading
    edges = {
        k: ("-" if lab in ("/", "\\") else lab) for k, lab in edges.items()
    }
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for (a, b) in edges:
        adj[a].append(b)
        adj[b].append(a)

    def elab(a: int, b: int) -> str:
        lab = edges.get((min(a, b), max(a, b)))
        return "" if lab in (None, "", "-") else lab

    labels = [a.raw for a in atoms]
    for _ in range(n):
        labels = [
            labels[i]
            + "|"
            + ",".join(sorted(elab(i, j) + labels[j] for j in adj[i]))
            for i in range(n)
        ]
        # hash down so labels don't grow quadratically (md5, NOT hash():
        # Python string hashing is per-process randomized and the form
        # must agree across executors and runs)
        labels = [
            _md5(lb.encode()).hexdigest()[:8] + atoms[i].raw
            for i, lb in enumerate(labels)
        ]

    # components, then per component the best serialization over minimal-
    # WL-label roots (neighbor order: WL label, then index for stability)
    seen = [False] * n
    comps: list[list[int]] = []
    for i in range(n):
        if seen[i]:
            continue
        comp = []
        stack = [i]
        seen[i] = True
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if not seen[v]:
                    seen[v] = True
                    stack.append(v)
        comps.append(comp)

    def serialize_from(root: int, comp: set[int]) -> str:
        order_adj = {
            u: sorted((v for v in adj[u] if v in comp), key=lambda v: (labels[v], v))
            for u in comp
        }
        sub_tokens: list[str] = []
        sub_index: dict[int, int] = {}
        for u in sorted(comp, key=lambda u: (u != root, labels[u], u)):
            sub_index[u] = len(sub_tokens)
            sub_tokens.append(atoms[u].raw)
        sub_edges = {
            (min(sub_index[a], sub_index[b]), max(sub_index[a], sub_index[b])): lab
            for (a, b), lab in edges.items()
            if a in comp and b in comp
        }
        # reuse the deterministic writer on the relabeled graph: root is
        # index 0, remaining atoms ranked by WL label
        return serialize_graph(sub_tokens, sub_edges)

    out_parts: list[str] = []
    for comp in comps:
        cset = set(comp)
        min_lab = min(labels[u] for u in comp)
        roots = [u for u in comp if labels[u] == min_lab]
        out_parts.append(min(serialize_from(r, cset) for r in roots))
    return ".".join(sorted(out_parts))


def _apply_graph(
    substrate: str,
    pattern: str,
    template: str,
    skip_keys: set,
    limit_embeddings: int = 64,
) -> list[str]:
    """Graph-based rewrite: apply ``pattern >> template`` at every graph
    embedding found by the subgraph-monomorphism matcher — including
    embeddings interrupted by substrate-side branches the pattern lacks,
    the case the linear splice engine declines (RDKit ``RunReactants``
    parity, gizmos.py:193-234).  Per embedding:

    - matched substrate atoms whose pattern atom has no atom map (or a
      map absent from the template) are DELETED with their bonds,
    - mapped atoms keep their substrate token when the template atom is
      a bare same-element spec, else take the template's token (the
      linear engine's inheritance rule),
    - bonds between two matched atoms that the pattern covers are
      replaced by the template's bond structure; extra substrate bonds
      between matched atoms (monomorphism slack, e.g. a ring bond the
      chain pattern crosses) are kept,
    - attachment bonds from mapped atoms to unmatched substrate atoms
      are kept verbatim; unmapped template atoms are inserted with the
      template's bonds,

    then the rewritten graph is serialized with :func:`serialize_graph`.
    Embeddings whose (map-assignment, deletion-set) key is in
    ``skip_keys`` were already rewritten by the linear splice path and
    are skipped — the splice output preserves the substrate's own
    writing, so it wins on the shared subset.  Requires at least one
    atom map shared by pattern and template (without an anchor the
    graph rewrite cannot know the attachment — the splice path owns
    those semantics).  Returns [] outside the parser subset.

    ``limit_embeddings`` bounds the enumeration (NOT silent: stated
    here and in the signature): a highly symmetric molecule can have
    factorially many automorphic embeddings that all collapse to the
    same few products after the key/product dedup, so the cap trades a
    pathological tail for bounded per-pair cost — RetroRules-scale
    substrates sit far below it.
    """
    from itertools import islice

    if any(c in substrate for c in "/\\") or any(c in template for c in "/\\"):
        # the graph writer re-roots its traversal, and a directional
        # mark moved into (or out of) a branch must FLIP to keep the
        # same cis/trans reading — this serializer writes marks
        # verbatim, so a re-rooted writing could denote the opposite
        # isomer.  Honest decline (the module's stereo policy): the
        # splice path still rewrites directional substrates wherever
        # the pattern's separator text matches verbatim, preserving the
        # substrate's own (correct) writing.
        return []
    try:
        s_atoms, s_edges = parse_graph(substrate)
        p_atoms, p_edges = parse_graph(pattern, True)
        t_atoms, t_edges = parse_graph(template)
    except ValueError:
        return []
    if not p_atoms or len(p_atoms) > len(s_atoms):
        return []
    if any(_is_query(a) for a in t_atoms):
        # pattern-only primitives in a product template: nothing concrete
        # to write (see _apply_linear) — no products
        return []
    t_maps = {a.amap for a in t_atoms if a.amap is not None}
    p_maps = {a.amap for a in p_atoms if a.amap is not None}
    if not (t_maps & p_maps):
        return []
    # a QUERY bond between two mapped atoms that stay bonded in the
    # template: the template's written bond would overwrite whatever
    # bond the query matched, where RDKit PRESERVES the reactant bond
    # when the product bond is the unspecified default — and an
    # explicit template bond is indistinguishable from that default
    # after parsing.  Honest decline (the module's policy) rather than
    # a silently different product; rules whose query-bonded atom is
    # deleted (unmapped) are unaffected.
    t_edge_maps = {
        frozenset((t_atoms[a].amap, t_atoms[b].amap))
        for (a, b) in t_edges
        if t_atoms[a].amap is not None and t_atoms[b].amap is not None
    }
    for (a, b), lab in p_edges.items():
        if (
            _is_query_bond(lab)
            and p_atoms[a].amap is not None
            and p_atoms[b].amap is not None
            and frozenset((p_atoms[a].amap, p_atoms[b].amap)) in t_edge_maps
        ):
            return []
    products: list[str] = []
    try:
        embeddings = list(
            islice(_all_embeddings(p_atoms, p_edges, s_atoms, s_edges), limit_embeddings)
        )
    except (RingCountBudget, OutsideSubsetMatch):
        # [R<n>] past the enumeration budget, or a match-time
        # outside-subset construct (unparseable recursive sub-pattern):
        # no products for this substrate (parse-failure contract),
        # never a job-level error
        return []
    for assign in embeddings:
        matched = set(assign.values())
        by_map = {
            p_atoms[pi].amap: si
            for pi, si in assign.items()
            if p_atoms[pi].amap is not None and p_atoms[pi].amap in t_maps
        }
        deleted = matched - set(by_map.values())
        key = (frozenset(by_map.items()), frozenset(deleted))
        if key in skip_keys:
            continue
        inv = {si: pi for pi, si in assign.items()}
        n_sub = len(s_atoms)
        new_edges: dict[tuple[int, int], str | None] = {}
        for (a, b), lab in s_edges.items():
            if a in deleted or b in deleted:
                continue
            if a in matched and b in matched:
                pa, pb = inv[a], inv[b]
                if (min(pa, pb), max(pa, pb)) in p_edges:
                    continue  # pattern covers it: template governs this bond
            new_edges[(a, b)] = lab
        node_of: dict[int, int] = {}
        inserted: list[int] = []
        for ti, t in enumerate(t_atoms):
            if t.amap is not None and t.amap in by_map:
                node_of[ti] = by_map[t.amap]
            else:
                node_of[ti] = n_sub + len(inserted)
                inserted.append(ti)
        for (ta, tb), lab in t_edges.items():
            u, v = node_of[ta], node_of[tb]
            new_edges[(min(u, v), max(u, v))] = lab
        # compact ids: retained substrate atoms in position order (mapped
        # atoms stay where the substrate put them), inserted atoms last
        keep = [i for i in range(n_sub) if i not in deleted]
        remap = {old: new for new, old in enumerate(keep)}
        for j in range(len(inserted)):
            remap[n_sub + j] = len(keep) + j
        tokens: list[str] = []
        for old in keep:
            if old in matched:
                t_idx = next(
                    ti for ti, t in enumerate(t_atoms)
                    if t.amap is not None and by_map.get(t.amap) == old
                )
                t, src = t_atoms[t_idx], s_atoms[old]
                tokens.append(_rewrite_token(t, src))
            else:
                tokens.append(s_atoms[old].raw)
        tokens.extend(t_atoms[ti].raw for ti in inserted)
        final_edges = {
            (min(remap[a], remap[b]), max(remap[a], remap[b])): lab
            for (a, b), lab in new_edges.items()
        }
        product = serialize_graph(tokens, final_edges)
        if product and product != substrate and product not in products:
            products.append(product)
    return products


_ATOM_START_RE = re.compile(r"[A-Za-z\[\*]")


@lru_cache(maxsize=4096)
def _linearizations(s: str, cap: int = 48) -> tuple[str, ...]:
    """All branch-order rewrites of ``s``: at every atom, each permutation
    of its branches + chain tail (the last-written child is the unparenthesized
    tail).  The original string is always first; parse failures and
    ``.``-separated patterns fall back to ``(s,)``.  Capped at ``cap``.

    ``ser`` is a GENERATOR so the islice cap truly bounds work — a
    many-branch atom's factorial permutation space is never materialized
    (``permutations``/``product`` are lazy; only per-branch serializations
    are materialized, each bounded to ``cap`` items).  Memoized on the
    pattern string: batch rewrites repeat the same rules across every
    substrate, and the enumeration is a pure function of ``s``."""
    if "(" not in s:
        return (s,)
    if "." in s:
        return (s,)
    try:
        roots, _ = _parse_tree(s)
    except ValueError:
        return (s,)

    from itertools import islice, permutations, product

    def ser(node):
        text, kids = node
        if not kids:
            yield text
            return
        for perm in permutations(kids):
            # cartesian across branch serializations so nested-branch
            # orderings surface in non-tail positions too; each branch
            # list is bounded to cap items, and the caller's islice
            # bounds total yields, so factorial spaces stay lazy
            branch_lists = [list(islice(ser(c), cap)) for _, c in perm[:-1]]
            for combo in product(*branch_lists):
                branches = "".join(
                    f"({b}{s})" for (b, _), s in zip(perm[:-1], combo)
                )
                for t in ser(perm[-1][1]):
                    yield f"{text}{branches}{perm[-1][0]}{t}"

    if len(roots) != 1:
        return (s,)
    out: list[str] = []
    for v in islice(ser(roots[0][1]), cap * 4):
        if v not in out:
            out.append(v)
        if len(out) >= cap:
            break
    # the original writing must be tried first (product order stability)
    if s in out:
        out.remove(s)
    return (s, *out)


def _parse_tree(s: str):
    """Tree parse for the linearization enumerator: node = (atom_text,
    [(bond_text, child), ...]) where atom_text includes brackets, atom
    maps and ring digits verbatim.  Returns (roots, total_atoms)."""
    i, n = 0, len(s)
    roots: list[tuple[str, tuple]] = []
    stack: list[tuple] = []
    cur: tuple | None = None
    bond = ""
    count = 0
    while i < n:
        ch = s[i]
        if ch == "(":
            if cur is None:
                raise ValueError("branch before first atom")
            stack.append(cur)
            i += 1
        elif ch == ")":
            if not stack:
                raise ValueError("unbalanced ')'")
            cur = stack.pop()
            bond = ""
            i += 1
        elif ch in _BOND_CHARS:
            bond = ch
            i += 1
        else:
            if ch == "[":
                j = _match_bracket_end(s, i)
                if j is None:
                    raise ValueError(f"unsupported bracket atom at {i}")
            elif s.startswith(_TWO_LETTER, i):
                j = i + 2
            elif ch in _SINGLE or ch in _AROMATIC or ch == "*":
                j = i + 1
            else:
                raise ValueError(f"unsupported character {ch!r} at {i}")
            while j < n and (s[j].isdigit() or s[j] == "%"):
                j = j + 3 if s[j] == "%" else j + 1
            node = (s[i:j], [])
            if cur is None:
                roots.append((bond, node))
            else:
                cur[1].append((bond, node))
            cur = node
            bond = ""
            count += 1
            i = j
    if stack:
        raise ValueError("unbalanced '('")
    return roots, count


@lru_cache(maxsize=65536)
def apply_reaction(substrate: str, pattern: str, template: str) -> tuple[str, ...]:
    """All distinct products of rewriting every embedding of ``pattern``
    in ``substrate`` with ``template`` (``pattern >> template`` reaction
    semantics, gizmos.py:210-224).  Two engines compose:

    1. the LINEAR splice path — branched patterns matched in every
       branch-order linearization (module docstring), rewritten by
       textual splice so the substrate's own writing survives;
    2. the GRAPH path (:func:`_apply_graph`) for embeddings the splice
       cannot express — substrate-branch-interrupted spans, matches
       across ring closures — found by the subgraph-monomorphism
       matcher and re-serialized from the rewritten graph.

    Embeddings are keyed by (atom-map assignment, deletion set); the
    graph path only rewrites keys the linear path did not, so products
    on the previously-declared subset are bit-identical to the pre-graph
    engine.  Memoized: rule tables repeat across every substrate batch.
    Returns () when the substrate falls outside the parser subset or
    nothing matches."""
    # ALL products dedupe at MOLECULE level (canonical form), matching
    # the reference's canonical-SMILES `cur_smiles in smiles_list` guard
    # (gizmos.py:219-224): symmetric embeddings produce the same molecule
    # in different writings — splice products inherit the substrate's
    # writing (ClCCCl + Cl>>O gives OCCCl and ClCCO, one molecule), graph
    # products the serializer's — and a string compare would emit twice
    # what the reference emits once.  First occurrence keeps its writing.
    pattern = strip_stereo(pattern)
    template = strip_stereo(template)
    products: list[str] = []
    seen_canon: set[str] = set()
    seen_keys: set = set()
    for lin in _linearizations(pattern):
        for prod in _apply_linear(substrate, lin, template, seen_keys):
            c = canonical_form(prod)
            if c not in seen_canon:
                seen_canon.add(c)
                products.append(prod)
    for prod in _apply_graph(substrate, pattern, template, seen_keys):
        c = canonical_form(prod)
        if c not in seen_canon:
            seen_canon.add(c)
            products.append(prod)
    return tuple(products)


def _apply_linear(
    substrate: str, pattern: str, template: str, keys_out: set | None = None
) -> list[str]:
    """One-linearization rewrite: consecutive-token-run embeddings of
    ``pattern`` spliced with ``template`` (the original chain engine).
    When ``keys_out`` is given, every rewritten embedding's
    (map-assignment, deletion-set) key — substrate atom indices, which
    coincide between :func:`parse_chain` and :func:`parse_graph` — is
    added so the graph path can skip already-spliced embeddings."""
    try:
        s_atoms = parse_chain(substrate)
        p_atoms = parse_chain(pattern)
        t_atoms = parse_chain(template)
    except ValueError:
        return []
    if not p_atoms:
        return []
    if any(_is_query(a) for a in t_atoms):
        # alternation/negation/#n are pattern-only: a product template
        # carrying one has no concrete atom to WRITE (RDKit errors on
        # such templates) — outside-subset semantics, no products
        return []
    if _has_ring_prim(p_atoms):
        # [R]/[!R] need graph context (bridge analysis); parse_chain
        # atoms carry none — the graph path owns these embeddings
        return []
    if pattern[: p_atoms[0].start] or pattern[p_atoms[-1].ring_end:]:
        # the splice replaces exactly substrate[first_atom..last_atom];
        # pattern text OUTSIDE that window (an unclosed ')' when the
        # pattern's last atom sits inside a branch, e.g. '[C,N:1](=O)')
        # has no replacement slot — splicing would orphan the matching
        # substrate text ('[CH3])').  The graph path owns these
        # embeddings (r8 fuzz finding).
        return []
    k = len(p_atoms)
    p_pairs, _ = _ring_pairing(p_atoms)
    t_maps = {a.amap for a in t_atoms if a.amap is not None}
    p_maps = {a.amap for a in p_atoms if a.amap is not None}
    # a RING-FORMING template (a ring pairing that touches a mapped atom
    # without merely repeating the pattern's own pairing between the same
    # maps — e.g. [C:1]CC[C:2] >> [C:1]1CC[C:2]1, or a closure between a
    # mapped and an inserted atom) cannot be spliced textually: the
    # splice would have to thread the NEW closure through substrate text
    # it doesn't own, and dropping the digits silently (the old behavior)
    # severed the bond.  Decline — the shared atom maps guarantee the
    # graph path can anchor, and its re-serialization writes the new
    # ring correctly.  Ring-PRESERVING templates (pairing repeated
    # between the same maps) keep the splice's priority so the
    # substrate's own writing survives, as before.
    p_pair_maps = {
        frozenset((p_atoms[a].amap, p_atoms[b].amap))
        for (a, b) in _ring_pairing_digits(p_atoms)
        if p_atoms[a].amap is not None and p_atoms[b].amap is not None
    }
    t_pairs_idx = _ring_pairing_digits(t_atoms)
    _, t_open_idx = _ring_pairing(t_atoms)
    for (a, b) in t_pairs_idx:
        ma, mb = t_atoms[a].amap, t_atoms[b].amap
        a_mapped = ma is not None and ma in p_maps
        b_mapped = mb is not None and mb in p_maps
        if a_mapped and b_mapped:
            if frozenset((ma, mb)) not in p_pair_maps:
                return []  # new bond between matched atoms → graph path
        elif a_mapped or b_mapped:
            return []  # closure between a matched and an inserted atom
    # an UNPAIRED template closure on a mapped atom has no splice meaning
    if any(
        t_atoms[i].amap is not None and t_atoms[i].amap in p_maps
        for i in t_open_idx
    ):
        return []
    # fresh digits for INSERTED ring systems: a template digit that also
    # appears in the substrate could pair with a substrate closure still
    # open across the splice point; renumbering is always safe because
    # template closures are internal to the template
    sub_digits = {d for a in s_atoms for d in a.rings}
    t_digits = {d for a in t_atoms for d in a.rings}
    digit_map: dict[str, str] = {}
    if t_digits & sub_digits:
        pool = (d for n in range(1, 100) for d in [str(n) if n <= 9 else f"%{n:02d}"]
                if d not in sub_digits and d not in t_digits)
        digit_map = {d: next(pool) for d in sorted(t_digits & sub_digits)}
    products: list[str] = []
    # span-independent: parse the substrate graph once for all candidate
    # spans (mapped rules consult it for external-bond checks below)
    if p_maps & t_maps:
        try:
            _, g_edges = parse_graph(substrate)
        except ValueError:
            g_edges = {}
    else:
        g_edges = {}
    for i0 in range(len(s_atoms) - k + 1):
        span = s_atoms[i0 : i0 + k]
        if not all(_atom_matches(p, s) for p, s in zip(p_atoms, span)):
            continue
        if any(
            _sep(pattern, p_atoms[j], p_atoms[j + 1]) != _sep(substrate, span[j], span[j + 1])
            for j in range(k - 1)
        ):
            continue
        s_pairs, s_external = _ring_pairing(span)
        if p_pairs != s_pairs:
            continue
        deleted = {
            j for j in range(k) if p_atoms[j].amap is None or p_atoms[j].amap not in t_maps
        }
        if any(j in s_external for j in deleted):
            continue
        # MAPPED rules: textual splicing re-parents the substrate text
        # around the span onto whatever the template emits at its
        # boundaries.  That is only sound when the boundary atoms
        # survive in place — so decline (and let the graph path rewrite
        # with RunReactants deletion/attachment semantics) whenever
        #   (a) a DELETED atom has a bond leaving the span (its branch/
        #       chain text would re-parent instead of severing), or
        #   (b) a span BOUNDARY atom has external bonds but the template
        #       does not put that same mapped atom at its own boundary
        #       (an insertion at the span edge would capture the
        #       neighbour text, e.g. [N:1]>>[N:1]=O splicing C[N]C to
        #       C[N]=OC instead of bonding both Cs to N).
        # UNMAPPED rules keep the declared positional-replacement
        # subset (Cl>>O rebonds in place) — no graph anchor exists.
        if p_maps & t_maps:
            span_lo, span_hi = i0, i0 + k - 1

            def _ext(abs_idx: int) -> bool:
                return any(
                    not (span_lo <= (b if a == abs_idx else a) <= span_hi)
                    for (a, b) in g_edges
                    if abs_idx in (a, b)
                )

            if any(_ext(i0 + j) for j in deleted):
                continue
            if t_atoms and (
                (_ext(span_lo) and t_atoms[0].amap != p_atoms[0].amap)
                or (_ext(span_hi) and t_atoms[-1].amap != p_atoms[-1].amap)
            ):
                continue
        embedding_key = (
            frozenset(
                (p_atoms[j].amap, i0 + j)
                for j in range(k)
                if p_atoms[j].amap is not None and p_atoms[j].amap in t_maps
            ),
            frozenset(i0 + j for j in deleted),
        )
        by_map_idx = {
            p_atoms[j].amap: j for j in range(k) if p_atoms[j].amap is not None
        }
        # ring-opening semantics: an internal ring pairing of the span is
        # re-emitted only when the TEMPLATE repeats the bond between the
        # same atom maps (its own ring pairing); otherwise the template
        # has spoken — the bond is gone, and inheriting its digits would
        # keep the ring closed in the product.  A pairing with a deleted
        # endpoint is dropped too (the survivor would dangle).
        t_pair_maps = {
            frozenset((t_atoms[a].amap, t_atoms[b].amap))
            for (a, b) in _ring_pairing_digits(t_atoms)
            if t_atoms[a].amap is not None and t_atoms[b].amap is not None
        }
        drop_digits: dict[int, set[str]] = {}
        for (a, b), d in _ring_pairing_digits(span).items():
            ma, mb = p_atoms[a].amap, p_atoms[b].amap
            if (
                ma is None or mb is None
                or ma not in t_maps or mb not in t_maps
                or frozenset((ma, mb)) not in t_pair_maps
            ):
                drop_digits.setdefault(a, set()).add(d)
                drop_digits.setdefault(b, set()).add(d)
        pieces: list[str] = []
        for t_idx, t in enumerate(t_atoms):
            if t_idx == 0:
                pieces.append(template[: t.start])
            else:
                pieces.append(_sep(template, t_atoms[t_idx - 1], t))
            if t.amap is not None and t.amap in by_map_idx:
                j = by_map_idx[t.amap]
                src = span[j]
                # a bare template atom of the SAME element inherits the
                # substrate token (its modifiers survive); any explicit
                # spec — or an element change — imposes the template's
                rings = "".join(
                    d for d in src.rings if d not in drop_digits.get(j, ())
                )
                pieces.append(_rewrite_token(t, src) + rings)
            else:
                pieces.append(t.raw + "".join(digit_map.get(d, d) for d in t.rings))
        pieces.append(template[t_atoms[-1].ring_end :] if t_atoms else "")
        product = (
            substrate[: span[0].start] + "".join(pieces) + substrate[span[-1].ring_end :]
        )
        if product != substrate:
            if product not in products:
                products.append(product)
            # the key is registered ONLY on emission: a splice whose
            # product string-equals the substrate (template rebuilt the
            # span verbatim) emits nothing here, and marking its key
            # would make the graph path skip a live embedding — losing
            # the RunReactants identity product entirely (r8 fuzz
            # finding).  The graph path emits its own writing instead.
            if keys_out is not None:
                keys_out.add(embedding_key)
    return products


@lru_cache(maxsize=65536)
def has_substructure(substrate: str, pattern: str) -> bool:
    """K3 structural substructure check (the reference's RDKit
    ``HasSubstructMatch``, ``mapBaseRetroRules.py:37-53``) over the same
    SMARTS subset, as a true GRAPH embedding: branch parentheses and
    ring closures build bond edges on both sides, and the pattern
    matches wherever its atoms + bonds embed injectively — branched
    patterns in any branch order, chain patterns across substrate
    branch points.  Extra substrate bonds are tolerated (monomorphism —
    the relaxed ring semantics: matching an atom inside a ring is fine
    when nothing is deleted).  False when either string falls outside
    the parser subset."""
    try:
        s_atoms, s_edges = parse_graph(substrate)
        p_atoms, p_edges = parse_graph(strip_stereo(pattern), True)
    except ValueError:
        return False
    if not p_atoms or len(p_atoms) > len(s_atoms):
        return False
    try:
        return _embeds(p_atoms, p_edges, s_atoms, s_edges)
    except (RingCountBudget, OutsideSubsetMatch):
        # [R<n>] past the enumeration budget, or a match-time
        # outside-subset construct (e.g. an unparseable recursive
        # sub-pattern): same contract as a parse failure
        return False


def structural_reaction_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """ReactionKernel for :func:`..operators.reactions.apply_reactions`:
    one OUTPUT ROW PER DISTINCT PRODUCT (the reference's 1→N fan-out,
    gizmos.py:210-224), with ``pattern``/``replacement`` interpreted as
    SMARTS-subset structures rather than regexes."""
    rows = []
    for r in pdf.itertuples(index=False):
        for prod in apply_reaction(r.substrate, r.pattern, r.replacement):
            rows.append(
                (r.substrate_id, r.substrate, r.rule_id, r.pattern, r.replacement, prod)
            )
    return pd.DataFrame(
        rows,
        columns=["substrate_id", "substrate", "rule_id", "pattern", "replacement", "product"],
    )
