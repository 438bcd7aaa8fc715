"""R17 probe (verdict item 6): A/B the connected-components round shape
— eager per-round localCheckpoint + separate changed-count job (r16)
vs lazy checkpoint whose count materializes it (r17, one job/round) —
interleaved in ONE session over the same checkpointed pair input
(dedup_keep_best's ngram pairs at sf0.1), so the comparison is
load-matched by construction.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators import dedup as dedup_ops  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cc(pairs: DataFrame, lazy: bool) -> DataFrame:
    """connected_components with the checkpoint shape as a knob —
    body mirrors operators.dedup.connected_components."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=not lazy)
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    labels = nodes.select("id", F.col("id").alias("component")).localCheckpoint()

    def _round(lbl):
        neigh = (
            edges.join(lbl.select(F.col("id").alias("src"), "component"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("__nmin"))
        )
        stepped = lbl.join(neigh, "id", "left").select(
            "id",
            F.col("component").alias("__prev"),
            F.least(F.col("component"), F.coalesce("__nmin", F.col("component"))).alias("component"),
        )
        jump = stepped.select(
            F.col("id").alias("component"), F.col("component").alias("__jmin")
        )
        return stepped.join(jump, "component", "left").select(
            "id",
            "__prev",
            F.least(F.col("component"), F.coalesce("__jmin", F.col("component"))).alias("component"),
        )

    for _ in range(30):
        out = _round(labels).localCheckpoint(eager=not lazy)
        changed = out.where(F.col("component") < F.col("__prev")).count()
        labels = out.select("id", "component")
        if changed == 0:
            break
    return labels


def main() -> None:
    spark = get_spark("probe-r17-cc")
    t0 = time.perf_counter()
    spark.range(0, 20_000_000, 1, 32).selectExpr(
        "pmod(xxhash64(id), 97) as b", "id"
    ).groupBy("b").agg({"id": "sum"}).count()
    print(f"calibration: {time.perf_counter() - t0:.3f}s loadavg={os.getloadavg()[0]:.1f}")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dedup_ops.ngram_jaccard_pairs(
        docs, "text", "doc_id", min_jaccard=0.5
    ).select("id_a", "id_b").localCheckpoint()
    print(f"pairs: {pairs.count()}")

    for lazy in (True, False):  # warm both arms
        cc(pairs, lazy).count()
    ts = {True: [], False: []}
    for lazy in [True, False, False, True, True, False, False, True]:
        t0 = time.perf_counter()
        cc(pairs, lazy).count()
        ts[lazy].append(time.perf_counter() - t0)
    o, n = ts[False], ts[True]
    print(
        f"cc rounds: eager(2 jobs/round) min {min(o):.3f} med {statistics.median(o):.3f} "
        f"{[round(t,2) for t in o]} | lazy(1 job/round) min {min(n):.3f} med "
        f"{statistics.median(n):.3f} {[round(t,2) for t in n]} | "
        f"speedup(min) {min(o)/min(n):.2f}x loadavg={os.getloadavg()[0]:.1f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
