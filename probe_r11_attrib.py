"""R11 attribution probe (VERDICT r10 item 1): the three >2x slow-tier
moves on untouched code (events_sessions 4.7x, k10_pca_batch 4.8x,
events_hopping 3.4x) plus plan_data_pipeline (1.8x) get the same
10-rep min-vs-min treatment that settled the r9 flagship delta.
Run: python probe_r11_attrib.py  (sf0.1, local[32]); one JSON line out.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

WATCH = ["events_sessions", "events_hopping", "k10_pca_batch", "plan_data_pipeline"]
R9_MINS = {  # BENCH_r09.json slow_mins
    "events_sessions": 0.371,
    "events_hopping": 0.296,
    "k10_pca_batch": 0.887,
    "plan_data_pipeline": 3.964,
}
R10_MINS = {  # BENCH_r10.json slow_mins
    "events_sessions": 1.759,
    "events_hopping": 1.003,
    "k10_pca_batch": 4.305,
    "plan_data_pipeline": 7.101,
}


def loadavg():
    with open("/proc/loadavg") as f:
        return [round(float(x), 2) for x in f.read().split()[:3]]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROBE_REPS", "10"))
    spark = get_spark("omics-spark-probe")
    spark.range(1000).count()
    qs = entrymod.queries()
    out = {"sf_dir": sf_dir, "reps": reps, "loadavg_start": loadavg(), "queries": {}}
    for name in WATCH:
        fn = qs[name]
        fn(spark, sf_dir).count()  # untimed warm-up
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        out["queries"][name] = {
            "times": times,
            "min": min(times),
            "r9_min": R9_MINS[name],
            "r10_min": R10_MINS[name],
            "probe_vs_r9": round(min(times) / R9_MINS[name], 2),
            "probe_vs_r10": round(min(times) / R10_MINS[name], 2),
            "loadavg1": loadavg()[0],
        }
        print(f"# {name}: {out['queries'][name]}", file=sys.stderr)
    out["loadavg_end"] = loadavg()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
