"""R11 seeded differential sweep: the extended-chirality token family
(valid-class stereo invariance + out-of-range decline) at bulk volume,
extending the engine's cumulative differential record.

Two properties per (molecule, pattern) base pair:
- VALID class ids (@, @@, @TH1-2, @AL1-2, @SP1-3, @TB1-20, @OH1-30)
  decorated onto every bracket atom are match-INVARIANT
  (useChirality=False parse-and-ignore) and strip_stereo recovers the
  plain pattern byte-for-byte.
- OUT-OF-RANGE ids (@TH3+, @AL3+, @SP4+, @TB21+, @OH31+, incl. the
  two-digit partial-strip shapes the r10 ADVICE flagged) leave a
  residue the bracket parser rejects: the decorated pattern DECLINES
  (False), never silently matches.

Run: python probe_r11_chirality_sweep.py [n_pairs]; one JSON line out.
"""
from __future__ import annotations

import json
import os
import random
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omics_data_integration_utilities_spark.operators.smarts_engine import (  # noqa: E402
    has_substructure,
    strip_stereo,
)

ATOMS = ["C", "N", "O", "S", "c", "n", "Cl", "Br", "[CH3]", "[N+]", "[O-]", "*"]
BONDS = ["", "=", "#"]
VALID = (
    ["@", "@@", "@TH1", "@TH2", "@AL1", "@AL2", "@SP1", "@SP2", "@SP3"]
    + [f"@TB{i}" for i in (1, 2, 9, 10, 13, 19, 20)]
    + [f"@OH{i}" for i in (1, 2, 9, 10, 11, 29, 30)]
)
INVALID = ["@TH3", "@TH12", "@AL5", "@SP4", "@SP31", "@TB21", "@TB99",
           "@OH31", "@OH99", "@TH0", "@OH0", "@TB0"]
_BRACKET_RE = re.compile(r"\[([A-Z][a-z]?|[a-z])")


def gen_smiles(rng: random.Random) -> str:
    """Mirror of tests/test_properties._smiles_subset, seeded random."""
    n = rng.randint(1, 8)
    out = [rng.choice(ATOMS)]
    open_branches = 0
    rings_opened = 0
    ring_open: list[str] = []
    for _ in range(n - 1):
        op = rng.randint(0, 6)
        if op == 0:
            out.append("(")
            open_branches += 1
        elif op == 1 and open_branches > 0:
            out.append(")")
            open_branches -= 1
        if op == 2 and rings_opened < 2 and len(out) > 1:
            rings_opened += 1
            d = str(rings_opened)
            out.append(d)
            ring_open.append(d)
        elif op == 3 and ring_open and len(out) > 1:
            out.append(ring_open.pop(0))
        out.append(rng.choice(BONDS))
        out.append(rng.choice(ATOMS))
    out.extend(")" * open_branches)
    for d in ring_open:
        out.append(d)
    return "".join(out)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    seed = int(os.environ.get("SWEEP_SEED", "1101"))
    rng = random.Random(seed)
    t0 = time.perf_counter()
    checks = mismatches = declined_base = 0
    for _ in range(n_pairs):
        s, p = gen_smiles(rng), gen_smiles(rng)
        try:
            base = has_substructure(s, p)
        except Exception:
            declined_base += 1
            continue
        # valid decoration: invariance + exact strip round-trip
        marks = [rng.choice([""] + VALID) for _ in range(16)]
        it = iter(marks)
        dec = _BRACKET_RE.sub(lambda m: "[" + m.group(1) + next(it, ""), p)
        if strip_stereo(dec) != p:
            mismatches += 1
        checks += 1
        if has_substructure(s, dec) != base:
            mismatches += 1
        checks += 1
        # out-of-range decoration on the first bracket atom: decline
        bad = rng.choice(INVALID)
        dec2, n = _BRACKET_RE.subn(lambda m: "[" + m.group(1) + bad, p, count=1)
        if n:
            if bad[1:] not in strip_stereo(dec2):
                mismatches += 1
            checks += 1
            if has_substructure(s, dec2) is not False:
                mismatches += 1
            checks += 1
    print(
        json.dumps(
            {
                "seed": seed,
                "pairs": n_pairs,
                "checks": checks,
                "mismatches": mismatches,
                "declined_base_pairs": declined_base,
                "wall_s": round(time.perf_counter() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
