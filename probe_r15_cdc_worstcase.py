"""R15 probe (r14 verdict item 6): the bucketed commit's WORST CASE —
a micro-batch touching ALL buckets degenerates the commit to a full
rewrite plus manifest overhead.  Measure the degradation curve and
derive the n_buckets sizing guidance from data.

Setup per snapshot scale S (1x/4x/16x of the sf documents corpus,
n_buckets=64): seed a bucketed snapshot and a full-rewrite snapshot
with the same S rows, then commit batches engineered to touch exactly
T of the 64 buckets (10 rows per touched bucket, keys drawn from the
seeded corpus so every commit is a pure replace — snapshot size stays
fixed) for T in 2, 8, 32, 64.  Report bytes written by each commit
(filesystem-visible, scheduler-noise-free) and the wall, plus the
bucketed/full bytes ratio per T.

Measured shape (committed run, probe_r15_cdc_worstcase.json): bucketed
commit bytes ~ (T/64) x snapshot + per-dir parquet overhead — linear
in the touched fraction; at T=64 the worst case costs 1.24-1.43x the
full rewrite's bytes (the per-dir overhead factor, shrinking with
bucket size: 1.43x at 11 KB buckets down to 1.24x at 163 KB), with
the bucketed==full crossover at f ~= 0.75 at these bucket sizes
(higher at real 100 MB-1 GB buckets).  Never anomalously worse than a
full rewrite + small-file overhead + one manifest put.  The sizing guidance
derived from this curve lives in SCALE.md's r15 section: keep the
expected touched fraction well under 1 by sizing n_buckets to the
batch's distinct-key count (f ~ k/n for k keys over n buckets), while
keeping per-bucket data in the O(100 MB-1 GB) rewrite-unit band.
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
from pyspark.sql.window import Window  # noqa: E402

from omics_data_integration_utilities_spark.session import get_spark  # noqa: E402
from omics_data_integration_utilities_spark.streaming.sinks import (  # noqa: E402
    upsert_batch_into_bucketed_snapshot,
    upsert_batch_into_snapshot,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS = 64
ROWS_PER_BUCKET = 10
TOUCH_LEVELS = (2, 8, 32, 64)
REPS = 2


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _commit_bytes(snap, commit, spark, batch, batch_id, **kw) -> "tuple[float, int]":
    before = {n for n in os.listdir(snap) if n.startswith("v")}
    t0 = time.monotonic()
    commit(spark, batch, snap, ["k"], batch_id=batch_id, keep_versions=2, **kw)
    wall = round(time.monotonic() - t0, 3)
    new_dirs = [
        n for n in os.listdir(snap) if n.startswith("v") and n not in before
    ]
    return wall, sum(_du(os.path.join(snap, n)) for n in new_dirs)


def main() -> None:
    spark = get_spark("probe-cdc-worstcase")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars", "text"
    )
    base_n = docs.count()
    out = {
        "sf_dir": SF_DIR,
        "n_buckets": N_BUCKETS,
        "rows_per_bucket": ROWS_PER_BUCKET,
        "scales": [],
    }
    for mult in (1, 4, 16):
        seed = (
            docs.withColumn(
                "__copy", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            )
            .select(
                (F.col("doc_id") + F.col("__copy") * F.lit(10_000_000)).alias("k"),
                F.col("n_chars").cast("double").alias("v"),
                "text",
            )
        )
        root = tempfile.mkdtemp(prefix="probe_cdc_worst_")
        rec = {"mult": mult, "seed_rows": base_n * mult, "levels": []}
        try:
            bsnap, fsnap = os.path.join(root, "bucketed"), os.path.join(root, "full")
            upsert_batch_into_bucketed_snapshot(
                spark, seed, bsnap, ["k"], batch_id=0, n_buckets=N_BUCKETS
            )
            upsert_batch_into_snapshot(spark, seed, fsnap, ["k"], batch_id=0)
            snap_bytes = sum(
                _du(os.path.join(bsnap, n))
                for n in os.listdir(bsnap)
                if n.startswith("v")
            )
            rec["snapshot_bytes"] = snap_bytes
            bid = 1
            for t_level in TOUCH_LEVELS:
                # exactly ROWS_PER_BUCKET keys from each of the first
                # t_level buckets — engineered touch set, pure replaces
                bucket = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_BUCKETS))
                batch = (
                    docs.withColumn("__b", bucket)
                    .where(F.col("__b") < t_level)
                    .withColumn(
                        "__rn",
                        F.row_number().over(
                            Window.partitionBy("__b").orderBy("doc_id")
                        ),
                    )
                    .where(F.col("__rn") <= ROWS_PER_BUCKET)
                    .select(
                        F.col("doc_id").alias("k"),
                        F.lit(-1.0).alias("v"),
                        "text",
                    )
                    .localCheckpoint()
                )
                touched = batch.select(
                    F.pmod(F.xxhash64(F.col("k")), F.lit(N_BUCKETS)).alias("b")
                ).distinct().count()
                lv = {
                    "touch_target": t_level,
                    "touched_buckets": touched,
                    "batch_rows": batch.count(),
                }
                for kind, snap, commit, kw in (
                    (
                        "bucketed", bsnap, upsert_batch_into_bucketed_snapshot,
                        {"n_buckets": N_BUCKETS},
                    ),
                    ("full", fsnap, upsert_batch_into_snapshot, {}),
                ):
                    walls, bites = [], []
                    for _ in range(REPS):
                        w, b = _commit_bytes(snap, commit, spark, batch, bid, **kw)
                        walls.append(w)
                        bites.append(b)
                        bid += 1
                    lv[kind] = {
                        "commit_s": min(walls),
                        "commit_s_all": walls,
                        "bytes_written": bites[-1],
                    }
                lv["bytes_ratio_bucketed_over_full"] = round(
                    lv["bucketed"]["bytes_written"]
                    / max(1, lv["full"]["bytes_written"]),
                    3,
                )
                lv["touched_fraction"] = round(touched / N_BUCKETS, 3)
                rec["levels"].append(lv)
                print(json.dumps({"mult": mult, **lv}), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        out["scales"].append(rec)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
