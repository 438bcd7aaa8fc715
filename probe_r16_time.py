"""Per-query timing probe for the r16 optimization round (guide §1).

Times registered/bench queries exactly the way bench.py does
(``fn(spark, sf_dir).count()`` — the driver-comparable action), one
untimed warm-up + N timed reps, and prints min/median per query plus
the same calibration job bench.py uses so runs on this host stay
comparable across the round.

Usage:
  python probe_r16_time.py plan_enzyme_annotation text_heavy_hitters --reps 4
  python probe_r16_time.py j12_event_join --noop   # noop sink instead of count
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="+")
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--noop", action="store_true", help="time a noop-sink write instead of count()")
    p.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = p.parse_args()

    from omics_data_integration_utilities_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench as benchmod

    spark = get_spark("omics-spark-probe-time")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = dict(entrymod.queries())
    qs.update(benchmod._extra_bench())

    # bench.py's calibration job: fixed-shape shuffle, host-speed yardstick
    t0 = time.perf_counter()
    spark.range(0, 20_000_000, 1, 32).selectExpr("id % 1000 AS k", "id AS v").groupBy(
        "k"
    ).count().count()
    print(f"calibration: {time.perf_counter() - t0:.3f}s  loadavg={os.getloadavg()[0]:.1f}")

    def act(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    for name in args.names:
        fn = qs.get(name)
        if fn is None:
            print(f"[skip] {name}: not registered")
            continue
        spark.sparkContext.setJobDescription(f"probe:{name}")
        act(fn(spark, args.sf_dir))  # warm-up
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            act(fn(spark, args.sf_dir))
            ts.append(time.perf_counter() - t0)
        print(
            f"{name}: min {min(ts):.3f}s med {statistics.median(ts):.3f}s "
            f"reps {[round(t, 3) for t in ts]} loadavg={os.getloadavg()[0]:.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
