"""R11 bulk bond-expression sweep: the full Daylight bond grammar
(``! & adjacency , ;`` over ``- = # : / ~ @``) differentially verified
at volume against the INDEPENDENT recursive-descent evaluator +
remove-and-reconnect cycle finder from tests/test_properties.py (no
code shared with the engine's normalize/compile path).  The r10 bond
sweeps ran ~55k checks per grammar extension; this pushes the family to
the same bulk standing as the chirality sweep.

Run: python probe_r11_bond_sweep.py [n_cases]; one JSON line out.
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omics_data_integration_utilities_spark.operators.smarts_engine import (  # noqa: E402
    has_substructure,
    parse_graph,
)
from probe_r11_chirality_sweep import gen_smiles  # noqa: E402
from tests.test_properties import (  # noqa: E402
    _BEXPR_PRIMS,
    _ref_bond_expr_eval,
    _ref_cycle_edges,
    _ref_prim_pred,
)

ENDS = ["C", "N", "O", "c", "*"]


def gen_bond_expr(rng: random.Random) -> str:
    def factor() -> str:
        return ("!" if rng.random() < 0.5 else "") + rng.choice(_BEXPR_PRIMS)

    def and_term() -> str:
        parts = [factor()]
        for _ in range(rng.randint(1, 2) - 1):
            parts.append(rng.choice(["&", ""]) + factor())
        return "".join(parts)

    def or_term() -> str:
        return ",".join(and_term() for _ in range(rng.randint(1, 3)))

    return ";".join(or_term() for _ in range(rng.randint(1, 2)))


def main() -> None:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    seed = int(os.environ.get("SWEEP_SEED", "4404"))
    rng = random.Random(seed)
    t0 = time.perf_counter()
    checks = mismatches = skipped = 0
    for _ in range(n_cases):
        s = gen_smiles(rng)
        expr = gen_bond_expr(rng)
        ea, eb = rng.choice(ENDS), rng.choice(ENDS)
        try:
            atoms, edges = parse_graph(s)
        except ValueError:
            skipped += 1
            continue
        cyc = _ref_cycle_edges(edges)
        want = any(
            _ref_bond_expr_eval(expr, lab, key in cyc)
            and (
                (_ref_prim_pred(ea, atoms[key[0]].elem, atoms[key[0]].aromatic)
                 and _ref_prim_pred(eb, atoms[key[1]].elem, atoms[key[1]].aromatic))
                or (_ref_prim_pred(ea, atoms[key[1]].elem, atoms[key[1]].aromatic)
                    and _ref_prim_pred(eb, atoms[key[0]].elem, atoms[key[0]].aromatic))
            )
            for key, lab in edges.items()
        )
        got = has_substructure(s, ea + expr + eb)
        checks += 1
        if got != want:
            mismatches += 1
            print(f"# MISMATCH: {s!r} {expr!r} {ea}{eb} got={got} want={want}",
                  file=sys.stderr)
    print(
        json.dumps(
            {
                "seed": seed,
                "cases": n_cases,
                "checks": checks,
                "mismatches": mismatches,
                "skipped_unparseable": skipped,
                "wall_s": round(time.perf_counter() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
