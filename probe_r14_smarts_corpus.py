"""R14 probe (r13 verdict item 7): SMARTS-subset sufficiency scan over a
RetroRules-diameter-16-SHAPED rule corpus, at the REFERENCE'S OWN
OPERATING POINT.

What the reference actually feeds its matcher (validateRulesWithOrigins
.py:47-86 + gizmos.py:237-244): rules come from the RetroRules sqlite
with ``WHERE isStereo=0`` (stereo rules excluded UPSTREAM, by the
reference), each side is re-rendered with ``MolFromSmarts(mergeHs=True)``
(explicit ``[#1]`` leaf atoms merged into heavy-atom H counts) and then
"greedy"-stripped with ``re.sub(r'&.*?(?=[:\\]])', '', s)`` — so
``[#6&v4&H1:1]`` reaches the matcher as ``[#6:1]``.  This probe mirrors
that preprocessing, then asks of OUR engine: does each side parse under
the subset grammar (smarts_engine.parse_graph), and does it EXECUTE
(has_substructure against a substrate battery without an
outside-subset rejection)?

Corpus: the real RetroRules sqlite is not redistributable inside this
sandbox (no network; the reference reads a user-supplied file), so the
default corpus is SYNTHETIC-BUT-FAITHFUL: a deterministic generator
emitting rules in the exact published RetroRules shape — component-
paren-wrapped SMIRKS sides; every atom bracket-qualified as
``[#N&v<k>(&H<j>)?(&[+-])?(:map)?]``; bonds -/=/#/:; branches, digit
ring closures, explicit-[#1] leaves, a small dot-separated multi-
component and stereo tail (which the reference's own isStereo=0 filter
would drop — counted here to prove the classifier sees them).  Point
the probe at the real file when available:

    python probe_r14_smarts_corpus.py --sqlite retrorules.db
    python probe_r14_smarts_corpus.py --tsv rules.tsv --column smarts_string

Output: one JSON line — n_rules, n_parse_ok, n_execute_ok, and
per-construct exclusion counts (the SCALE.md table's source of truth).
"""
from __future__ import annotations

import argparse
import json
import random
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omics_data_integration_utilities_spark.operators import smarts_engine as E  # noqa: E402

# ---- the reference's preprocessing, mirrored ------------------------------

GREEDY_RE = re.compile(r"&.*?(?=[:\]])")  # gizmos.py:243-244
# mergeHs=True emulation: an explicit [#1...] LEAF bonded by a plain
# single bond collapses into its neighbor's H count, which the greedy
# strip then removes — net effect: the leaf (and its bond) disappears
MERGEH_RE = re.compile(r"\(-?\[#1(?:&[^\]:]*)?(?::\d+)?\]\)|-?\[#1(?:&[^\]:]*)?(?::\d+)?\]")


def strip_outer_parens(s: str) -> str:
    """RetroRules wraps each SMIRKS side in component parens; RDKit
    accepts them, our chain grammar doesn't need them — strip when they
    enclose the WHOLE side."""
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, c in enumerate(s):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i < len(s) - 1:
                    return s
        s = s[1:-1]
    return s


def reference_operating_point(side: str) -> str:
    side = E.strip_stereo(side)          # useChirality=False default
    side = GREEDY_RE.sub("", side)       # remove_valence_and_mergeh (regex half)
    side = MERGEH_RE.sub("", side)       # mergeHs=True (leaf-H half)
    return strip_outer_parens(side)


# ---- failure-construct classifier -----------------------------------------

CONSTRUCT_PROBES = [
    ("stereo", re.compile(r"[@/\\]")),
    ("dot_multicomponent", re.compile(r"\.")),
    ("explicit_h_atom", re.compile(r"\[#1[&:\]]")),
    ("recursive_env", re.compile(r"\$\(")),
    ("alternation", re.compile(r",")),
    ("semicolon_conj", re.compile(r";")),
    ("percent_closure", re.compile(r"%\d\d")),
    ("wildcard", re.compile(r"\*")),
]


def classify(side: str, err: str) -> str:
    for name, rx in CONSTRUCT_PROBES:
        if rx.search(side):
            return name
    return f"other: {err[:60]}"


# ---- the scan --------------------------------------------------------------

SUBSTRATE_BATTERY = [
    # execution smoke: compile every parsed side against real molecules
    # (match result irrelevant; an OutsideSubsetMatch/RingCountBudget IS
    # the signal).  Shapes: ester, aromatic ring, fused ring, amine salt.
    "CC(=O)OCC",
    "c1ccccc1O",
    "C1CC2CCC1C2",
    "C[N+](C)(C)C",
    "OC(=O)c1ccc(N)cc1",
]


def scan_rules(rules: "list[tuple[str, str]]", preprocess=None) -> dict:
    preprocess = preprocess or reference_operating_point
    out = {
        "n_rules": len(rules),
        "n_parse_ok": 0,
        "n_execute_ok": 0,
        "excluded": {},          # construct -> count (parse failures)
        "execute_failures": {},  # construct/error -> count
        "examples": {},          # construct -> one example rule id
    }
    for rid, smirks in rules:
        sides = smirks.split(">>")
        if len(sides) != 2:
            out["excluded"]["not_a_two_side_rule"] = (
                out["excluded"].get("not_a_two_side_rule", 0) + 1
            )
            continue
        ok = True
        for side in sides:
            side_op = preprocess(side)
            try:
                E.parse_graph(side_op)
            except Exception as exc:  # noqa: BLE001 — classification scan
                ok = False
                key = classify(side_op, f"{type(exc).__name__}: {exc}")
                out["excluded"][key] = out["excluded"].get(key, 0) + 1
                out["examples"].setdefault(key, rid)
                break
        if not ok:
            continue
        out["n_parse_ok"] += 1
        exec_ok = True
        lhs = preprocess(sides[0])
        for sub in SUBSTRATE_BATTERY:
            try:
                E.has_substructure(sub, lhs)
            except Exception as exc:  # noqa: BLE001
                exec_ok = False
                key = classify(lhs, f"{type(exc).__name__}: {exc}")
                out["execute_failures"][key] = (
                    out["execute_failures"].get(key, 0) + 1
                )
                out["examples"].setdefault("exec:" + key, rid)
                break
        if exec_ok:
            out["n_execute_ok"] += 1
    return out


# ---- synthetic RetroRules-shaped corpus ------------------------------------

ELEMENTS = [(6, 40), (8, 20), (7, 12), (16, 4), (15, 2), (9, 2), (17, 2), (35, 1)]
VALENCE = {6: 4, 8: 2, 7: 3, 16: 2, 15: 5, 9: 1, 17: 1, 35: 1}


def _atom(rng: random.Random, mapno: "int | None") -> str:
    n = rng.choices([e for e, _ in ELEMENTS], weights=[w for _, w in ELEMENTS])[0]
    parts = [f"#{n}", f"v{VALENCE[n]}"]
    if rng.random() < 0.35:
        parts.append(f"H{rng.randint(0, 2)}")
    r = rng.random()
    if r < 0.05:
        parts.append(rng.choice(["+", "-"]))
    elif r < 0.08:
        # r15 (r14 verdict item 7): the remaining published bracket
        # charge form — explicit multi-charge (phosphates, sulfates)
        parts.append(rng.choice(["+2", "-2"]))
    body = "&".join(parts)
    # r15: isotope prefixes as they appear in RetroRules exports of
    # labeled substrates ([13#6&v4:1]) — the subset grammar's bracket
    # regex carries an isotope group; emit them so the scan proves it
    iso = str(rng.choice([13, 15, 18])) if rng.random() < 0.03 else ""
    body = iso + body
    return f"[{body}:{mapno}]" if mapno else f"[{body}]"


def _side(rng: random.Random, n_atoms: int, mapped: bool, ring: bool) -> str:
    toks = []
    closure_open = False
    for i in range(n_atoms):
        last = i == n_atoms - 1
        if i > 0:
            toks.append(rng.choices(["-", "=", "#", ":"], weights=[70, 20, 2, 8])[0])
        toks.append(_atom(rng, (i + 1) if mapped else None))
        if ring and i == 0:
            toks.append("1")
            closure_open = True
        if closure_open and last:
            # closure digit binds to the atom token itself — it must
            # precede any trailing branch (strict SMILES placement)
            toks.append("-1")
        if rng.random() < 0.3 and not last:
            toks.append("(-" + _atom(rng, None) + ")")
        if rng.random() < 0.2:
            toks.append("(-[#1&v1])")  # explicit-H leaf, the mergeHs target
    return "(" + "".join(toks) + ")"


def synthetic_corpus(n: int = 600, seed: int = 1414) -> "list[tuple[str, str]]":
    rng = random.Random(seed)
    rules: list[tuple[str, str]] = []
    # a handful of hand-written rules in the canonical published shape
    rules.append(("hand_hydroxylation",
        "([#6&v4:1](-[#1&v1:2])(-[#6&v4:3])-[#6&v4:4])>>"
        "([#6&v4:1](-[#8&v2]-[#1&v1])(-[#6&v4:3])-[#6&v4:4])"))
    rules.append(("hand_ester_hydrolysis",
        "([#6&v4:1](=[#8&v2:2])-[#8&v2:3]-[#6&v4:4])>>"
        "([#6&v4:1](=[#8&v2:2])-[#8&v2:3]-[#1&v1])"))
    rules.append(("hand_methylation",
        "([#8&v2:1](-[#6&v4:2])-[#1&v1:3])>>"
        "([#8&v2:1](-[#6&v4:2])-[#6&v4](-[#1&v1])(-[#1&v1])-[#1&v1])"))
    rules.append(("hand_amination",
        "([#6&v4:1]=[#8&v2:2])>>([#6&v4:1]-[#7&v3:2](-[#1&v1])-[#1&v1])"))
    rules.append(("hand_aromatic_ring",
        "([#6&v4:1]:1:[#6&v4:2]:[#6&v4:3]:[#6&v4:4]:[#6&v4:5]:[#6&v4:6]:1-[#8&v2:7])>>"
        "([#6&v4:1]:1:[#6&v4:2]:[#6&v4:3]:[#6&v4:4]:[#6&v4:5]:[#6&v4:6]:1-[#8&v2:7]-[#6&v4])"))
    # r15 hand rules for the two bracket families added this round:
    # multi-charge (a phosphate transfer shape) and an isotope-labeled
    # carbon (tracer substrate shape)
    rules.append(("hand_phosphate_multicharge",
        "([#8&v2:1](-[#15&v5&+2:2])-[#6&v4:3])>>"
        "([#8&v2:1](-[#1&v1])-[#6&v4:3])"))
    rules.append(("hand_isotope_label",
        "([13#6&v4:1](-[#8&v2:2])-[#6&v4:3])>>"
        "([13#6&v4:1](=[#8&v2:2])-[#6&v4:3])"))
    for i in range(n - len(rules) - 30):
        mapped_n = rng.randint(2, 7)
        ring = rng.random() < 0.15
        lhs = _side(rng, mapped_n, True, ring)
        rhs = _side(rng, rng.randint(2, 7), True, ring)
        rules.append((f"syn_{i:04d}", f"{lhs}>>{rhs}"))
    # tails the reference's own pipeline excludes upstream, to prove the
    # classifier names them: stereo (isStereo=0 filter) + dot components
    for i in range(15):
        rules.append((
            f"syn_stereo_{i:02d}",
            "([#6&v4@:1](-[#8&v2:2])(-[#7&v3:3])-[#6&v4:4])>>"
            "([#6&v4@@:1](-[#8&v2:2])(-[#7&v3:3])-[#6&v4:4])",
        ))
    for i in range(15):
        rules.append((
            f"syn_dot_{i:02d}",
            "([#6&v4:1]-[#8&v2:2].[#7&v3:3])>>([#6&v4:1]-[#7&v3:3])",
        ))
    return rules


def load_tsv(path: str, column: str) -> "list[tuple[str, str]]":
    import csv

    rules = []
    with open(path) as f:
        for i, row in enumerate(csv.DictReader(f, delimiter="\t")):
            rules.append((row.get("smarts_id", str(i)), row[column]))
    return rules


def load_sqlite(path: str) -> "list[tuple[str, str]]":
    import sqlite3

    conn = sqlite3.connect(path)
    c = conn.cursor()
    # the exact query shape the reference uses (validateRulesWithOrigins
    # .py:47-50), minus the per-reaction filter: diameter-16 non-stereo
    q = (
        "SELECT rules.smarts_id, smarts.smarts_string FROM rules "
        "LEFT JOIN smarts ON rules.smarts_id = smarts.id "
        "WHERE isStereo=0 AND diameter=16"
    )
    return [(str(r[0]), r[1]) for r in c.execute(q)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv")
    ap.add_argument("--column", default="smarts_string")
    ap.add_argument("--sqlite")
    ap.add_argument("--n", type=int, default=600)
    args = ap.parse_args()
    if args.sqlite:
        rules, source = load_sqlite(args.sqlite), f"sqlite:{args.sqlite}"
    elif args.tsv:
        rules, source = load_tsv(args.tsv, args.column), f"tsv:{args.tsv}"
    else:
        rules, source = synthetic_corpus(args.n), "synthetic(seed=1414)"
    out = scan_rules(rules)
    out["source"] = source
    # second pass at the RAW form (outer parens stripped only): shows
    # what the preprocessing itself buys — raw RetroRules atoms carry
    # &v/&H conjuncts the grammar parses-and-ignores, stereo marks ride
    # strip_stereo only in the operating-point pass
    raw = scan_rules(rules, preprocess=strip_outer_parens)
    out["raw_form"] = {
        "n_parse_ok": raw["n_parse_ok"],
        "n_execute_ok": raw["n_execute_ok"],
        "excluded": raw["excluded"],
        "execute_failures": raw["execute_failures"],
        "examples": raw["examples"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
