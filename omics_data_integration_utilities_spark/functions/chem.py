"""K2: molecular mass from SMARTS strings, RDKit-free (SURVEY §2 K2,
reference ``integrative_omics/gizmos.py:240-291``).

The reference's workaround for SMARTS that aren't valid molecules is to
bypass valence entirely: strip the ``&``-valence annotations
(``remove_valence_and_mergeh_from_smarts``, gizmos.py:240-242) and sum
per-atom masses (``get_mm_from_mol`` with ``is_smarts=True``,
gizmos.py:253-255 — ``sum(atom.GetMass())``).

Spark restatement: the whole parse is a chain of JVM-side string
expressions (``regexp_replace`` + ``translate`` + length arithmetic) —
no UDF, whole-stage codegen, scan-speed at any scale.  Element masses
are the IUPAC standard atomic weights (what RDKit's ``GetMass`` returns
for a non-isotopic atom).

Supported SMARTS subset (documented deviation, sufficient for the
reference's rule library shapes):
- bracket atoms with ``&``-qualifiers and ``:n`` atom maps (stripped),
- ``#6``-style atomic numbers for H/B/C/N/O/P/S/halogens,
- H-count specs (``[CH3]``/``[CH]``) dropped; a leading ``[H]`` is a real
  hydrogen atom,
- aromatic lowercase atoms, two-letter Cl/Br, wildcards ``*`` mass 0,
- NOT supported: isotope masses (``[2H]`` counts as average-weight H),
  recursive SMARTS ``$(...)`` (their atoms are counted, matching the
  top-level sum only when the reference's rules avoid them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# IUPAC standard atomic weights (public, CIAAW 2021 abridged)
ATOMIC_MASS: dict[str, float] = {
    "H": 1.008,
    "B": 10.81,
    "C": 12.011,
    "N": 14.007,
    "O": 15.999,
    "F": 18.998403163,
    "P": 30.973761998,
    "S": 32.06,
    "Cl": 35.45,
    "Br": 79.904,
    "I": 126.90447,
}

# '#<atomic number>' → symbol (the subset the masses cover)
_ATOMIC_NUMBER = {
    "1": "H", "5": "B", "6": "C", "7": "N", "8": "O", "9": "F",
    "15": "P", "16": "S", "17": "Cl", "35": "Br", "53": "I",
}


def smarts_mass(col: Column | str) -> Column:
    """Sum of atom masses of a SMARTS string — the reference's
    ``get_mm_from_str(s, is_smarts=True)`` (gizmos.py:267-289), as one
    JVM expression chain.  Returns double (null only for null input)."""
    s = F.col(col) if isinstance(col, str) else col
    # 1. valence-strip: '&...' up to ':' or ']' (gizmos.py:241)
    s = F.regexp_replace(s, r"&[^:\]]*", "")
    # 2. atom maps ':<n>' inside brackets
    s = F.regexp_replace(s, r":[0-9]+", "")
    # 3. '#<n>' atomic numbers → symbols (longest numbers first)
    for num in sorted(_ATOMIC_NUMBER, key=len, reverse=True):
        s = F.regexp_replace(s, "#" + num, _ATOMIC_NUMBER[num])
    # 4. H-count specs: an 'H' preceded by another atom symbol (letter,
    #    '*' or ')') is a constraint, not an atom ([CH3], [CH]); a
    #    bracket-leading '[H]' stays a real hydrogen
    s = F.regexp_replace(s, r"(?<=[A-Za-z\*\)])H[0-9]*", "")
    # 5. two-letter elements become single placeholder chars (so 'Cl' is
    #    never counted as C, 'Br' never as B) — after this every element
    #    is exactly one character and the counts below are INDEPENDENT.
    #    The old form stripped elements progressively, so each stage
    #    re-nested the whole chain up to 3× (twice in the length diff,
    #    once in the re-assignment): an exponentially-sized expression
    #    tree that overflowed janino's 64 KB method limit and dropped
    #    the entire chain out of codegen into interpreted eval.  With
    #    placeholders the normalized string is one fixed chain and each
    #    element count references it twice — linear codegen, and the
    #    runtime subexpression elimination collapses the copies.
    s = F.regexp_replace(s, "Cl", "\x01")
    s = F.regexp_replace(s, "Br", "\x02")
    mass = F.lit(0.0)
    # same element order and same n·mass accumulation as before, so the
    # fp sum — and every grid key derived from it — is bit-identical
    counts = [("Cl", "\x01"), ("Br", "\x02")] + [
        (sym, sym + (sym.lower() if sym in "BCNOPS" else ""))
        for sym in ("H", "B", "C", "N", "O", "P", "S", "F", "I")
    ]
    for sym, chars in counts:
        n = F.length(s) - F.length(F.translate(s, chars, ""))
        mass = mass + n * F.lit(ATOMIC_MASS[sym])
    return mass
