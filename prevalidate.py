"""Driver-window prevalidation: run every query in the 50-slot driver
window (``__spark_entry__._PRIORITY``) through the SAME compare the
local oracle harness uses (sorted columns, dtype-class check, round-6
multiset — tests/conftest.py ``compare_query_to_oracle``) at the
driver's correctness scale, BEFORE the rotation ships.

    python prevalidate.py run          # the 50-query window at sf0.01
    python prevalidate.py run --all    # every registered query with an oracle
    python prevalidate.py run --only NAME [NAME ...]   # a named subset

One line per query, then a FAILED summary; exit 1 on any failure.  The
r13 rotation shipped only after this printed FAILED: [] — keep that
invariant for every future rotation.

Argparse CLI (r15 verdict item 3): ``--help`` answers instantly; a
Spark session only launches under the explicit ``run`` subcommand —
the same protection bench.py got in r15 (before this, ``--help`` and
any typo'd flag silently launched the full 50-query sf0.01 suite).
Bare ``python prevalidate.py`` (no argv) keeps the historical meaning
(run the window) so existing gate scripts and memory-file invocations
stay valid; anything ELSE on argv must parse.
"""

from __future__ import annotations

import argparse
import sys
import time

HERE = __file__.rsplit("/", 1)[0]
sys.path.insert(0, HERE)


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="prevalidate.py",
        description=(
            "Driver-grade oracle prevalidation at sf0.01 (the gate every "
            "window rotation must pass before it ships)."
        ),
    )
    sub = p.add_subparsers(dest="cmd")
    run = sub.add_parser(
        "run", help="launch Spark and validate queries against DuckDB oracles"
    )
    run.add_argument(
        "--all",
        action="store_true",
        help="every registered query with an oracle (not just the window)",
    )
    run.add_argument(
        "--only",
        nargs="+",
        metavar="NAME",
        help="validate only these registered query names",
    )
    run.add_argument(
        "--sf-dir",
        default=None,
        help="override the correctness-scale data dir (default: conftest's "
        "SF_CORRECTNESS, /root/testdata/sf0.01)",
    )
    return p


def main(argv: "list[str]") -> int:
    if not argv:
        argv = ["run"]  # historical bare invocation = run the window
    elif argv[0] == "--all":
        # historical gate form `prevalidate.py --all` — still deliberate,
        # keep it working; every OTHER flag-first argv must parse (and
        # --help / typos exit before any Spark launch)
        argv = ["run"] + argv
    args = _parser().parse_args(argv)
    if args.cmd != "run":
        _parser().print_help()
        return 2

    # Spark/duckdb imports only under the explicit run subcommand —
    # --help and parse errors above never launch a session
    import duckdb  # noqa: E402

    import __spark_entry__ as entrymod  # noqa: E402
    from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
    from tests.conftest import SF_CORRECTNESS, compare_query_to_oracle  # noqa: E402

    sf_dir = args.sf_dir or SF_CORRECTNESS
    spark = get_spark("prevalidate")
    duck = duckdb.connect()
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if args.only:
        unknown = [n for n in args.only if n not in qs]
        if unknown:
            print(f"unknown query names: {unknown}")
            return 2
        names = [n for n in args.only if n in oracles]
        skipped = [n for n in args.only if n not in oracles]
        if skipped:
            print(f"skipping (no oracle registered): {skipped}")
    elif args.all:
        names = [n for n in qs if n in oracles]
    else:
        names = list(entrymod._PRIORITY)
    bad = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            n = compare_query_to_oracle(
                spark, duck, name, qs[name], oracles[name], sf_dir
            )
            print(
                f"[{i + 1}/{len(names)}] {name}: OK rows={n} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001 — report every red, then exit 1
            bad.append(name)
            print(f"[{i + 1}/{len(names)}] {name}: FAIL {str(ex)[:300]}", flush=True)
    print("FAILED:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
