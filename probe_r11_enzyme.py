"""R11 enzyme 16x shuffle-spreading experiment (r10 verdict item 7).

The r10 scaling probe pinned plan_enzyme_annotation's 16x wall
(~523-675 s at 16 GiB heap) as memory-bound in the join/shuffle working
set, and the r10 DISK_ONLY branch-storage experiment eliminated block
storage as the cause.  Remaining hypothesis: more, smaller shuffle
partitions let the sort-merge working set fit, moving the wall.  This
probe runs the SAME 16x construction (sf0.1 documents + events
self-unioned with per-copy id offsets, text/values shared across copies
— the worst-case cross-copy fan-out) under a conf set chosen by env:

    PROBE_CONF=base     spark.sql.shuffle.partitions=32 (session default)
    PROBE_CONF=spread   shuffle.partitions=256, AQE advisory 8m

One conf per process (session confs are fixed per JVM).  Prints one
JSON line: {conf, wall_s, rows, loadavg}.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402

K = 16
DOC_OFF = 10_000_000
EVT_OFF = 10_000_000


def loadavg():
    with open("/proc/loadavg") as f:
        return [round(float(x), 2) for x in f.read().split()[:3]]


def main() -> None:
    conf_name = os.environ.get("PROBE_CONF", "base")
    extra = {}
    if conf_name == "spread":
        extra = {
            "spark.sql.shuffle.partitions": "256",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        }
    spark = get_spark(f"omics-spark-enzyme-{conf_name}", extra_conf=extra)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    tmp = tempfile.mkdtemp(prefix=f"enzyme16x_{conf_name}_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    amp_docs = docs
    amp_events = events
    for c in range(1, K):
        amp_docs = amp_docs.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * DOC_OFF))
        )
        amp_events = amp_events.unionByName(
            events.withColumn("user_id", F.col("user_id") + F.lit(c * EVT_OFF))
            .withColumn("event_id", F.col("event_id") + F.lit(c * EVT_OFF))
        )
    amp_docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    amp_events.write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    from omics_data_integration_utilities_spark.plans.registry_pathway import (
        q_plan_enzyme_annotation,
    )

    la0 = loadavg()
    t0 = time.perf_counter()
    rows = q_plan_enzyme_annotation(spark, tmp).count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "conf": conf_name,
                "extra_conf": extra,
                "wall_s": round(wall, 1),
                "rows": rows,
                "loadavg_start": la0,
                "loadavg_end": loadavg(),
                "heap": os.environ.get("OMICS_SPARK_DRIVER_MEM", "8g"),
            }
        )
    )
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
