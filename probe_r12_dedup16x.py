"""R12 probe (r11 verdict item 4): the two unprobed r11 composites at
their documented worst cases, plus minhash_estimate_accuracy at 16×.

1. keep_best_per_component under ONE GIANT duplicate cluster — every doc
   in a single component, scaled 1×/4×/16×.  This stresses exactly the
   operator's no-rank-window claim: a rank window over the component key
   would serialize the whole corpus into one partition; the
   min(struct(missing, -score, id)) partial aggregate must stay
   map-side-combinable and flat.

2. set_overlap_matrix under SHARED BOILERPLATE — every key present in
   ALL 20 sources (the worst case for the self-join: pair rows =
   |shared keys| · C(20,2) = 190·|keys| before the partial agg), keys
   scaled 1×/4×/16×.  The documented bound is linear in |shared keys|
   with groups fixed; the probe verifies the wall tracks that, not the
   corpus square.

3. minhash_estimate_accuracy at 1×/4×/16× duplication (id-shifted full
   copies, texts unchanged) — candidate pairs grow ~C(k,2) per original
   doc (identical copies share every band), so the signature-compare +
   exact-jaccard joins see the maximal pair load.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.operators.dedup import (  # noqa: E402
    keep_best_per_component,
    minhash_estimate_accuracy,
    set_overlap_matrix,
)

N_SOURCES = 20
BASE_KEYS = 50_000


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("omics-spark-dedup16x")
    spark.range(1000).count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()
    base_rows = docs.count()
    out = {"base_rows": base_rows, "scales": {}}

    for k in (1, 4, 16):
        rec: dict = {}

        # --- 1. keep_best, one giant component --------------------------
        ids = docs.select("doc_id")
        amp_ids = ids
        for c in range(1, k):
            amp_ids = amp_ids.unionByName(
                ids.select((F.col("doc_id") + F.lit(c * 10_000_000)).alias("doc_id"))
            )
        amp_ids = amp_ids.localCheckpoint()
        comps = amp_ids.select("doc_id").withColumnRenamed("doc_id", "id").withColumn(
            "component", F.lit(0).cast("long")
        )
        scores = amp_ids.select(
            F.col("doc_id"),
            (F.pmod(F.col("doc_id"), F.lit(997)) / F.lit(997.0)).alias("quality"),
        )
        t0 = time.perf_counter()
        res = keep_best_per_component(comps, scores)
        stats = res.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        ).collect()[0]
        rec["keepbest_rows"] = int(stats["rows"])
        rec["keepbest_kept"] = int(stats["n_keep"])  # must be exactly 1
        rec["keepbest_wall_s"] = round(time.perf_counter() - t0, 2)

        # --- 2. set_overlap_matrix, full boilerplate --------------------
        keys = spark.range(BASE_KEYS * k).select(
            F.md5(F.col("id").cast("string")).alias("key")
        )
        srcs = spark.range(N_SOURCES).select(
            F.concat(F.lit("src"), F.col("id")).alias("src")
        )
        shared = keys.crossJoin(F.broadcast(srcs)).localCheckpoint()
        t0 = time.perf_counter()
        ov = set_overlap_matrix(shared, "src", "key")
        ostats = ov.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.min("jaccard").alias("min_j"),
            F.max("jaccard").alias("max_j"),
        ).collect()[0]
        rec["overlap_keys"] = BASE_KEYS * k
        rec["overlap_pairs"] = int(ostats["pairs"])  # must be C(20,2)=190
        rec["overlap_jaccard"] = [float(ostats["min_j"]), float(ostats["max_j"])]
        rec["overlap_wall_s"] = round(time.perf_counter() - t0, 2)

        # --- 3. minhash accuracy under k× duplication -------------------
        amp = docs
        for c in range(1, k):
            amp = amp.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * 10_000_000))
            )
        amp = amp.localCheckpoint()
        t0 = time.perf_counter()
        acc = minhash_estimate_accuracy(amp, "text", "doc_id")
        astats = acc.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.round(F.avg("abs_err"), 4).alias("mean_abs_err"),
            F.round(F.max("abs_err"), 4).alias("max_abs_err"),
        ).collect()[0]
        rec["acc_pairs"] = int(astats["pairs"])
        rec["acc_mean_abs_err"] = float(astats["mean_abs_err"])
        rec["acc_max_abs_err"] = float(astats["max_abs_err"])
        rec["acc_wall_s"] = round(time.perf_counter() - t0, 2)

        out["scales"][f"{k}x"] = rec
        print(f"# {k}x: {rec}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
