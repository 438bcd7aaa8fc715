"""R11 follow-up probe: asof_join + multires_rollup at 1x/4x/16x events.

Two amplification modes per scale:
- spread: user_id offset per copy — key cardinality grows, per-key
  window partitions stay flat (the healthy production shape);
- hot: user ids SHARED across copies — per-key rows multiply by k, the
  worst case for the as-of window (AQE cannot split windows; this is
  the documented salt-upstream regime), while the rollup's groupBy
  keys also stay fixed so its partial agg absorbs the growth.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators.joins import asof_join  # noqa: E402
from omics_data_integration_utilities_spark.streaming.events import (  # noqa: E402
    multires_rollup,
    ts_event_micros_sql,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("omics-spark-events16x")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(100).count()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base_rows = ev.count()
    out = {"base_rows": base_rows, "scales": {}}
    for k in (1, 4, 16):
        for mode in ("spread", "hot"):
            amp = ev
            for c in range(1, k):
                cp = ev.withColumn("event_id", F.col("event_id") + F.lit(c * 10_000_000))
                if mode == "spread":
                    cp = cp.withColumn("user_id", F.col("user_id") + F.lit(c * 10_000_000))
                # hot mode shifts ts per copy so right rows stay unique
                # per (user, ts) — the asof uniqueness contract
                cp = cp.withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {c} SECONDS")
                )
                amp = amp.unionByName(cp)
            amp = amp.localCheckpoint()
            us = F.expr(ts_event_micros_sql(amp))
            left = amp.where(F.col("event_type") == "click").select(
                "event_id", "user_id", us.alias("us"), "value"
            )
            right = (
                amp.where(F.col("event_type") == "purchase")
                .select("user_id", us.alias("us"), "event_id", "value")
                .groupBy("user_id", "us")
                .agg(F.max(F.struct("event_id", "value")).getField("value").alias("rv"))
            )
            t0 = time.perf_counter()
            n_asof = asof_join(left, right, ["user_id"], "us", ["rv"]).count()
            w_asof = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            n_roll = multires_rollup(amp, (60, 3600, 86400)).count()
            w_roll = round(time.perf_counter() - t0, 2)
            out["scales"][f"{k}x_{mode}"] = {
                "rows_in": base_rows * k,
                "asof_rows": n_asof,
                "asof_wall_s": w_asof,
                "rollup_rows": n_roll,
                "rollup_wall_s": w_roll,
            }
            print(f"# {k}x {mode}: {out['scales'][f'{k}x_{mode}']}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
