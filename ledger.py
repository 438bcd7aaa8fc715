"""Driver-evidence ledger: per-query book built from CORRECTNESS_r*.json.

The driver checks a 50-query window per round (``__spark_entry__._PRIORITY``);
this tool aggregates every round's record into the per-query evidence book
the rotation decisions need — last-checked round, last-hash-green and
last-rows-only rounds, staleness, and the never-checked / never-green
residues.  Staleness counts rounds since the last driver EVIDENCE of
either kind (hash-green, or the sanctioned rows-only pass — the only
check that exists for queries registered without an oracle; a query
never flips between the two kinds, so the max is well-defined).  Run
before each round's rotation so the "stalest cohort" is computed, not
recalled:

    python ledger.py            # full table + residue summary
    python ledger.py --stale 5  # only queries with evidence > 5 rounds old

A query is GREEN in a round when every *_match flag recorded for it is
true and err is null (rows-only entries with err="no_oracle" count as
green-rows-only, tracked separately — the driver's weaker check).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# Formally-closed ledger rows (r10 verdict item 4): queries whose book
# state can never change by re-windowing, with the standing evidence
# that closes them.  They stay registered (API parity) but are excluded
# from the actionable residues — a ledger row that can never clear is
# book noise, not a to-do.
CLOSED = {
    "combat_adjust": (
        "superseded by combat_adjust_digest (hash-green r9, golden pin + "
        "numpy replica in tests/test_combat.py): the full 10k-row adjusted "
        "matrix has no ANSI-SQL oracle and is too large for a VALUES pin; "
        "the digest value-locks the identical kernel"
    ),
    "methylmix_states": (
        "rows-only by nature (seeded EM state labels have no SQL oracle; "
        "driver rows-only pass r9) — digest sibling methylmix_states_digest "
        "is golden-oracled and was hash-green in-window"
    ),
    # r12 supersession closures (r11 verdict item 5): API-parity singles
    # whose machinery a richer registered sibling exercises end-to-end;
    # each hash-green in 3+ driver windows, each keeping its standing
    # sf0.01 local oracle in tests/test_queries_oracle.py.  Closing them
    # shrinks the rotation pool so registration stops outpacing the
    # 50-slot window.
    "text_token_count": (
        "superseded by text_token_counts (hash-green r11): the single-"
        "flavor count is a strict projection of the two-flavor query's "
        "output, same tokenizer code path (operators/text.py token_counts); "
        "hash-green r2/r10/r11"
    ),
    "text_quality": (
        "superseded by pipeline_curate (r12, gates on the identical "
        "quality_expr — operators/text.py:40, single source of truth) and "
        "by text_gopher's richer battery; hash-green r3/r10/r11"
    ),
    "dedup_fingerprint": (
        "superseded by text_winnowing (hash-green r9): both run the same "
        "rolling-hash fingerprint machinery (operators/text.py), winnowing "
        "the strictly richer window-min form; hash-green r2/r10"
    ),
}


def load_rounds(here: str = HERE) -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def entry_status(rec: dict) -> str:
    """'green' | 'rows_only' | 'red' for one driver record.

    no_oracle is the driver's sanctioned weaker check: the query ran and
    produced rows, nothing was value-compared — rows_only, not red,
    when spark_rows landed (>= 0; None means the run itself failed)."""
    if rec.get("err") == "no_oracle":
        return "rows_only" if rec.get("spark_rows") is not None else "red"
    if rec.get("err"):
        return "red"
    flags = [v for k, v in rec.items() if k.endswith("_match")]
    return "green" if flags and all(flags) else "red"


def build_ledger(here: str = HERE) -> dict[str, dict]:
    """name -> {last_checked, last_green, last_rows_only, statuses}.

    last_green is HASH-green only; the sanctioned weaker rows-only pass
    is tracked separately (the verdict's book distinguishes them)."""
    rounds = load_rounds(here)
    ledger: dict[str, dict] = {}
    for rnd in sorted(rounds):
        for name, rec in rounds[rnd].items():
            st = entry_status(rec)
            row = ledger.setdefault(
                name,
                {
                    "last_checked": None,
                    "last_green": None,
                    "last_rows_only": None,
                    "statuses": {},
                },
            )
            row["last_checked"] = rnd
            row["statuses"][rnd] = st
            if st == "green":
                row["last_green"] = rnd
            elif st == "rows_only":
                row["last_rows_only"] = rnd
    return ledger


def registered_names() -> list[str]:
    sys.path.insert(0, HERE)
    import __spark_entry__ as e  # noqa: PLC0415

    return list(e.queries())


def main(argv: list[str]) -> int:
    stale_cut = None
    if "--stale" in argv:
        idx = argv.index("--stale") + 1
        try:
            stale_cut = int(argv[idx])
        except (IndexError, ValueError):
            stale_cut = -1
        if stale_cut < 0:
            print("usage: python ledger.py [--stale N]  (N a round count >= 0)")
            return 2
    ledger = build_ledger()
    names = registered_names()
    latest = max((r for row in ledger.values() for r in row["statuses"]), default=0)
    print(f"# rounds on file: through r{latest}; registered queries: {len(names)}")
    never_checked, never_green, stale_rows = [], [], []
    for name in names:
        if name in CLOSED:
            continue
        row = ledger.get(name)
        if row is None:
            never_checked.append(name)
            continue
        if row["last_green"] is None:
            never_green.append(name)
        best = max(row["last_green"] or 0, row["last_rows_only"] or 0)
        staleness = latest - best
        if stale_cut is None or staleness > stale_cut:
            stale_rows.append((staleness, name, row))
    for staleness, name, row in sorted(stale_rows, reverse=True):
        st = row["statuses"][row["last_checked"]]
        green = "r%d" % row["last_green"] if row["last_green"] else "-"
        ro = "r%d" % row["last_rows_only"] if row["last_rows_only"] else "-"
        print(
            f"{name:45s} last_checked=r{row['last_checked']:<3d} "
            f"hash_green={green:4s} rows_only={ro:4s} "
            f"stale={staleness:<3d} latest_status={st}"
        )
    print(f"# never driver-checked ({len(never_checked)}): {never_checked}")
    print(
        f"# checked but never hash-green ({len(never_green)}): {never_green}"
        " (rows-only evidence shown above)"
    )
    for name, why in CLOSED.items():
        print(f"# formally closed: {name} — {why}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
