"""Capture .explain("formatted") for declared + bench queries.

Optimization-round instrumentation (guide §1/§7.2): writes
``plans/r17/<query>_<tag>.txt`` for every query named on the command
line (or the full declared window + bench tiers with ``--all``), at the
SF dir given (default sf0.1 — the bench scale, so plan shapes match the
benched plans).  Explain only BUILDS the DataFrame; queries whose build
performs side-effect commits (the snapshot family) still run those
commits once, so this is cheap but not free.

Usage:
  python probe_r17_plans.py --tag before --all
  python probe_r17_plans.py --tag after plan_mass_annotation j12_event_join
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="*", help="query names (default: --all)")
    p.add_argument("--all", action="store_true", dest="allq")
    p.add_argument("--tag", required=True, help="before|after (file suffix)")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = p.parse_args()

    from omics_data_integration_utilities_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench as benchmod

    spark = get_spark("omics-spark-plans")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    qs = dict(entrymod.queries())
    qs.update(benchmod._extra_bench())
    if args.allq:
        names = sorted(
            set(qs) & (set(qs) if args.allq else set())
            | set(benchmod.HEADLINE)
            | set(benchmod.SLOW_TIER)
            | set(entrymod.queries())
        )
    else:
        names = args.names
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r17")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"[skip] {name}: not registered")
            continue
        try:
            df = fn(spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — keep capturing the rest
            txt = f"ERROR building/explaining: {type(exc).__name__}: {exc}"
            print(f"[err] {name}: {txt[:200]}")
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"[ok] {name} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
