"""Driver-window prevalidation: run every query in the 50-slot driver
window (``__spark_entry__._PRIORITY``) through the SAME compare the
local oracle harness uses (sorted columns, dtype-class check, round-6
multiset — tests/conftest.py ``compare_query_to_oracle``) at the
driver's correctness scale, BEFORE the rotation ships.

    python prevalidate.py            # the 50-query window at sf0.01
    python prevalidate.py --all      # every registered query with an oracle

One line per query, then a FAILED summary; exit 1 on any failure.  The
r13 rotation shipped only after this printed FAILED: [] — keep that
invariant for every future rotation.
"""

from __future__ import annotations

import sys
import time

HERE = __file__.rsplit("/", 1)[0]
sys.path.insert(0, HERE)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from tests.conftest import SF_CORRECTNESS, compare_query_to_oracle  # noqa: E402


def main(argv: list[str]) -> int:
    spark = get_spark("prevalidate")
    duck = duckdb.connect()
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = (
        [n for n in qs if n in oracles]
        if "--all" in argv
        else list(entrymod._PRIORITY)
    )
    bad = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            n = compare_query_to_oracle(
                spark, duck, name, qs[name], oracles[name], SF_CORRECTNESS
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
