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

- **Linear (chain) patterns**: a pattern embedding is a run of atoms
  consecutive in the substrate token stream with identical inter-atom
  bond text; branch parentheses break adjacency.  (Full VF2 subgraph
  matching is what an RDKit kernel would drop into the same slot.)
- **Atom matching**: element + aromaticity must agree (``*`` matches
  any); explicit H-count and charge constraints must agree when the
  pattern specifies them; connectivity/valence specs (``&X3``/``&v4``)
  are IGNORED, exactly as the reference's own
  ``remove_valence_from_smarts`` strips them (gizmos.py:237-239).
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

import pandas as pd

_TWO_LETTER = ("Cl", "Br")
_SINGLE = set("BCNOSPFI")
_AROMATIC = set("bcnosp")
_BOND_CHARS = set("-=#:/\\.")

_BRACKET_RE = re.compile(
    r"\[(?P<isotope>\d+)?(?P<elem>\*|[A-Z][a-z]?|[a-z])"
    r"(?P<mods>(?:&?[Xv]\d+|H\d*|\+\d*|-\d*)*)"
    r"(?::(?P<map>\d+))?\]"
)


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


def _parse_mods(mods: str) -> tuple[int | None, int | None]:
    """H-count and charge from a bracket-atom modifier string (X/v specs
    are parsed over but ignored, per remove_valence_from_smarts)."""
    h: int | None = None
    charge: int | None = None
    for m in re.finditer(r"&?(H\d*|\+\d*|-\d*|[Xv]\d+)", mods):
        t = m.group(1)
        if t.startswith("H"):
            h = int(t[1:]) if len(t) > 1 else 1
        elif t.startswith("+"):
            charge = int(t[1:]) if len(t) > 1 else 1
        elif t.startswith("-"):
            charge = -(int(t[1:]) if len(t) > 1 else 1)
    return h, charge


def parse_chain(s: str) -> list[Atom]:
    """Tokenize a linear SMILES/SMARTS-subset string into atoms carrying
    their source offsets (separator text is recovered by slicing the
    source).  Raises ValueError on syntax outside the subset."""
    atoms: list[Atom] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "[":
            m = _BRACKET_RE.match(s, i)
            if not m:
                raise ValueError(f"unsupported bracket atom at {i}: {s[i:i + 12]!r}")
            elem = m.group("elem")
            h, charge = _parse_mods(m.group("mods") or "")
            raw = re.sub(r":\d+\]$", "]", m.group(0))
            atoms.append(
                Atom(
                    elem=elem,
                    aromatic=elem.islower() and elem != "*",
                    hcount=h,
                    charge=charge,
                    amap=int(m.group("map")) if m.group("map") else None,
                    raw=raw,
                    start=i,
                    end=m.end(),
                    ring_end=m.end(),
                )
            )
            i = m.end()
        elif s.startswith(_TWO_LETTER, i):
            atoms.append(Atom(s[i : i + 2], False, None, None, None, s[i : i + 2], i, i + 2, i + 2))
            i += 2
        elif ch in _SINGLE or ch in _AROMATIC or ch == "*":
            atoms.append(Atom(ch, ch in _AROMATIC, None, None, None, ch, i, i + 1, i + 1))
            i += 1
        elif ch.isdigit() or ch == "%":
            if not atoms or atoms[-1].ring_end != i:
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


def _atom_matches(pat: Atom, sub: Atom) -> bool:
    if pat.elem != "*":
        if pat.elem.upper() != sub.elem.upper() or pat.aromatic != sub.aromatic:
            return False
    if pat.hcount is not None and sub.hcount != pat.hcount:
        return False
    if pat.charge is not None and (sub.charge or 0) != pat.charge:
        return False
    return True


def apply_reaction(substrate: str, pattern: str, template: str) -> list[str]:
    """All distinct products of rewriting every embedding of ``pattern``
    in ``substrate`` with ``template`` (``pattern >> template`` reaction
    semantics, gizmos.py:210-224).  Returns [] when the substrate falls
    outside the parser subset or nothing matches."""
    try:
        s_atoms = parse_chain(substrate)
        p_atoms = parse_chain(pattern)
        t_atoms = parse_chain(template)
    except ValueError:
        return []
    if not p_atoms:
        return []
    k = len(p_atoms)
    p_pairs, _ = _ring_pairing(p_atoms)
    t_maps = {a.amap for a in t_atoms if a.amap is not None}
    products: list[str] = []
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
        by_map = {p_atoms[j].amap: span[j] for j in range(k) if p_atoms[j].amap is not None}
        pieces: list[str] = []
        for t_idx, t in enumerate(t_atoms):
            if t_idx == 0:
                pieces.append(template[: t.start])
            else:
                pieces.append(_sep(template, t_atoms[t_idx - 1], t))
            if t.amap is not None and t.amap in by_map:
                src = by_map[t.amap]
                # a bare template atom of the SAME element inherits the
                # substrate token (its modifiers survive); any explicit
                # spec — or an element change — imposes the template's
                keep_src = t.raw in (t.elem, f"[{t.elem}]") and t.elem == src.elem
                pieces.append((src.raw if keep_src else t.raw) + "".join(src.rings))
            else:
                pieces.append(t.raw + "".join(t.rings))
        pieces.append(template[t_atoms[-1].ring_end :] if t_atoms else "")
        product = (
            substrate[: span[0].start] + "".join(pieces) + substrate[span[-1].ring_end :]
        )
        if product != substrate and product not in products:
            products.append(product)
    return products


def has_substructure(substrate: str, pattern: str) -> bool:
    """K3 structural substructure check (the reference's RDKit
    ``HasSubstructMatch``, ``mapBaseRetroRules.py:37-53``) over the same
    SMARTS subset: true when the pattern's atom sequence embeds in the
    substrate — atom constraints + inter-atom separator equality +
    internal ring-pairing topology; unlike the rewrite path there is no
    dangling-closure guard (matching an atom inside a ring is fine when
    nothing is deleted).  False when either string falls outside the
    parser subset."""
    try:
        s_atoms = parse_chain(substrate)
        p_atoms = parse_chain(pattern)
    except ValueError:
        return False
    if not p_atoms or len(p_atoms) > len(s_atoms):
        return False
    k = len(p_atoms)
    p_pairs, _ = _ring_pairing(p_atoms)
    for i0 in range(len(s_atoms) - k + 1):
        span = s_atoms[i0 : i0 + k]
        if not all(_atom_matches(p, s) for p, s in zip(p_atoms, span)):
            continue
        if any(
            _sep(pattern, p_atoms[j], p_atoms[j + 1]) != _sep(substrate, span[j], span[j + 1])
            for j in range(k - 1)
        ):
            continue
        s_pairs, _ = _ring_pairing(span)
        # substructure (unlike rewrite) tolerates EXTRA substrate ring
        # bonds — the pattern's pairing must be present, not exhaustive
        if not p_pairs <= s_pairs:
            continue
        return True
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
